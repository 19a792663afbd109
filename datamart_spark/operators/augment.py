"""Augmentation execution: the reference's join/union engine, Spark-first.

Reference executes augmentation in pandas with hand-rolled chunking
(lib_augmentation/datamart_augmentation/augmentation.py): companion CSV
streamed in 10k-row chunks, joined per chunk, concatenated, then
group-by de-duplicated.  In Spark the whole apparatus collapses to one
declarative program — Catalyst picks broadcast vs sort-merge, spills
handle memory, AQE splits skewed keys:

    input.join(companion, keys, 'left').groupBy(row_id).agg(...)

Semantics preserved:
- key normalization (augmentation.py:93-131): strings lowercased,
  numerics cast, datetimes parsed;
- UNIQUE_INDEX_KEY per input row (augmentation.py:50-55,462) so a 1:N
  join aggregates back to exactly one output row per input row;
- default agg set for numeric companion columns mean/sum/max/min
  (augmentation.py:300-307), non-numeric → first, output columns named
  "<agg> <col>" (augmentation.py:329-333);
- agg function semantics (augmentation.py:239-257): count = non-null
  count, sum = null-if-all-null;
- temporal alignment (augmentation.py:134-231): both sides truncated
  to the COARSER of the two detected resolutions before the equi-join;
- union (augmentation.py:626-761): columns aligned by name, missing
  filled null, column order = left's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..profiler.temporal import coarser, detect_resolution

UNIQUE_INDEX_KEY = "__augment_row_id__"

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

DEFAULT_NUMERIC_AGGS = ("mean", "sum", "max", "min")


def _norm_key_col(df: DataFrame, col: str):
    """Normalized join-key EXPRESSION per augmentation.py:93-131: string
    keys compare lowercased.  Returned as a derived column so the
    original column values pass through to the output untouched — the
    reference lowercases only the join index (set_data_index with
    drop=False, augmentation.py:122-126) and keeps row values intact."""
    dt = dict(df.dtypes)[col]
    if dt == "string":
        return F.lower(F.col(col))
    return F.col(col)


def _agg_expr(fn: str, col: str):
    out = f"{fn} {col}"  # reference naming: "<agg> <col>" (augmentation.py:329-333)
    if fn == "mean":
        return F.avg(col).alias(out)
    if fn == "sum":  # null if all null (augmentation.py:239-247)
        return F.when(F.count(col) > 0, F.sum(col)).alias(out)
    if fn == "max":
        return F.max(col).alias(out)
    if fn == "min":
        return F.min(col).alias(out)
    if fn == "count":  # non-null count (augmentation.py:250-257)
        return F.count(col).alias(out)
    if fn == "first":
        return F.first(col, ignorenulls=True).alias(out)
    raise ValueError(f"unknown agg function: {fn}")


def join_augment(
    input_df: DataFrame,
    companion: DataFrame,
    left_keys: list[str],
    right_keys: list[str],
    how: str = "left",
    agg_functions: dict[str, list[str]] | None = None,
    broadcast_companion: bool | None = None,
) -> DataFrame:
    """J1/J4: multi-key equi-join + A1-A3 per-input-row aggregation.

    Scale: companion dimension tables broadcast (set
    ``broadcast_companion=True`` or leave None for Catalyst/AQE to
    decide); the groupBy key is the synthetic row id, which is unique
    ⇒ perfectly distributed, no skew.
    """
    left = input_df.withColumn(UNIQUE_INDEX_KEY, F.monotonically_increasing_id())
    # join on derived normalized key columns (like temporal_aligned_join's
    # __ts_l__) so original key values survive into the output
    lnorm = [f"__jk_l_{i}__" for i in range(len(left_keys))]
    rnorm = [f"__jk_r_{i}__" for i in range(len(right_keys))]
    for nk, k in zip(lnorm, left_keys):
        left = left.withColumn(nk, _norm_key_col(left, k))
    right = companion
    for nk, k in zip(rnorm, right_keys):
        right = right.withColumn(nk, _norm_key_col(right, k))
    right = right.drop(*right_keys)
    # avoid collisions: prefix companion non-key columns (rsuffix analog)
    value_cols = [c for c in right.columns if c not in rnorm]
    renames = {c: f"r_{c}" if c in left.columns else c for c in value_cols}
    for old, new in renames.items():
        if old != new:
            right = right.withColumnRenamed(old, new)
    value_cols = [renames[c] for c in value_cols]

    cond = [left[a] == right[b] for a, b in zip(lnorm, rnorm)]
    if broadcast_companion:
        right = F.broadcast(right)
    joined = left.join(right, cond, how)

    rtypes = dict(zip([f.name for f in companion.schema.fields],
                      [f.dataType for f in companion.schema.fields]))
    aggs = []
    for c in value_cols:
        orig = c[2:] if c.startswith("r_") and c[2:] in rtypes else c
        fns = (agg_functions or {}).get(orig)
        if fns is None:
            fns = (
                DEFAULT_NUMERIC_AGGS
                if isinstance(rtypes.get(orig), _NUMERIC_TYPES)
                else ("first",)
            )
        aggs += [_agg_expr(fn, c) for fn in fns]
    input_cols = list(input_df.columns)  # original values, un-normalized
    out = joined.groupBy(UNIQUE_INDEX_KEY, *[left[c] for c in input_cols]).agg(*aggs)
    return out.drop(UNIQUE_INDEX_KEY)


def temporal_aligned_join(
    input_df: DataFrame,
    companion: DataFrame,
    left_ts: str,
    right_ts: str,
    how: str = "left",
    resolution: str | None = None,
    agg_functions: dict[str, list[str]] | None = None,
) -> DataFrame:
    """J2: truncate both datetime keys to the coarser detected
    resolution (or a user-supplied one) and equi-join.

    Two-pass by design (SURVEY §4 "decide-once"): resolution detection
    is a separate small aggregation job, then the join plan is built
    with the frozen truncation — same as the reference freezing the
    alignment on the first chunk (augmentation.py:492-528)."""
    if resolution is None:
        r_left = detect_resolution(input_df, left_ts)
        r_right = detect_resolution(companion, right_ts)
        resolution = coarser(r_left, r_right)
    lkey, rkey = "__ts_l__", "__ts_r__"
    left = input_df.withColumn(lkey, F.date_trunc(resolution, F.col(left_ts)))
    right = companion.withColumn(rkey, F.date_trunc(resolution, F.col(right_ts))).drop(
        right_ts
    )
    out = join_augment(
        left, right, [lkey], [rkey], how=how, agg_functions=agg_functions
    )
    return out.drop(lkey)


def union_augment(left: DataFrame, right: DataFrame) -> DataFrame:
    """J5: schema-aligned union — right columns matched to left by name,
    missing columns null-filled, column order forced to left's
    (augmentation.py:626-761)."""
    for c in left.columns:
        if c not in right.columns:
            right = right.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    right = right.select(*left.columns)
    return left.unionByName(right)

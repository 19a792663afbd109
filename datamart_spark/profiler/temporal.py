"""Temporal-resolution detection — Spark port of the reference cascade.

Reference (lib_profiler/datamart_profiler/temporal.py:36-57): for each
resolution fine→coarse, bucket the values by a truncation key; the
first resolution where the average number of distinct values per
bucket is < 1.05 wins.  Keys incl. ISO-week and quarter
(temporal.py:15-33).

Spark form: one groupBy per candidate resolution over the SAME column
— each is a partial-aggregated shuffle of distinct (bucket, value)
pairs; at 100 TB run them in one pass via cube-style unioned keys or
accept ~8 cheap scans of one column (column-pruned parquet reads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# fine → coarse, matching the reference's priority order
# (augmentation.py:58-61): second minute hour day week month quarter year
_TRUNCS: list[tuple[str, str]] = [
    ("second", "second"),
    ("minute", "minute"),
    ("hour", "hour"),
    ("day", "day"),
    ("week", "week"),
    ("month", "month"),
    ("quarter", "quarter"),
    ("year", "year"),
]

RESOLUTION_PRIORITY = {name: i for i, (name, _) in enumerate(_TRUNCS)}

THRESHOLD = 1.05


def detect_resolution(df: DataFrame, ts_col: str) -> str:
    """Coarse→fine cascade (reference temporal.py:36-57 iterates the
    keys year→second): first resolution where avg distinct timestamps
    per bucket < 1.05 wins; fallback 'second'."""
    col = F.col(ts_col)
    for name, unit in reversed(_TRUNCS):
        ratio = (
            df.where(col.isNotNull())
            .groupBy(F.date_trunc(unit, col).alias("b"))
            .agg(F.count_distinct(col).alias("c"))
            .agg(F.avg("c").alias("r"))
            .collect()[0]["r"]
        )
        if ratio is not None and ratio < THRESHOLD:
            return name
    return "second"


def coarser(res_a: str, res_b: str) -> str:
    """The coarser of two resolutions (search/join.py:573-582 picks the
    coarser side for join alignment)."""
    return res_a if RESOLUTION_PRIORITY[res_a] >= RESOLUTION_PRIORITY[res_b] else res_b


def truncate_to(df: DataFrame, ts_col: str, resolution: str, out_col: str) -> DataFrame:
    """date_trunc with the reference's week/quarter semantics."""
    return df.withColumn(out_col, F.date_trunc(resolution, F.col(ts_col)))

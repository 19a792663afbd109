"""Persistent dataset registry: per-(dataset, column) profiles + Lazo
sketches, so augmentation search is one sketch-table join.

The reference profiles every dataset ONCE at ingest time and stores the
per-column metadata + Lazo sketches server-side (lib_profiler
core.py:502-557 builds sketches; the profiler pushes them to the Lazo
server); a search then queries that persistent store — it never
re-reads candidate data (apiserver/apiserver/search/join.py:334-425).
``operators.discovery.augmentation_search`` is the inline form (it
sketches candidates on the fly — fine for a handful of DataFrames, but
one Spark job per candidate text column: 10^5 sequential jobs on a
10^5-dataset registry).  This module is the registry-scale form:

- ``DatasetRegistry.register(name, df)`` — profile + sketch ONE dataset
  in O(1) Spark jobs (all text columns sketched in a single
  stack→distinct→groupBy aggregation) and commit the rows to a
  dataset-partitioned parquet table (re-registering a dataset replaces
  its partition — the reference's delete-then-reinsert on re-profile,
  profiler/profiler.py:286-297);
- ``DatasetRegistry.search(input_df, ...)`` — the same ranked results
  as ``augmentation_search`` over everything registered, with job count
  AND driver memory INDEPENDENT of registry size: text containment is a
  broadcast sketch-table join (Lazo arithmetic as column expressions),
  range overlap an exploded-ranges join, union name-matching
  levenshtein expressions + per-dataset greedy matching inside
  ``applyInPandas`` — the driver sees only two top-k result lists.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .discovery import (
    N_PERMUTATIONS,
    _perm_hash,
    column_minhash_sketch,
    greedy_pair_matching,
    interleave_results,
)

_SKETCH_SCHEMA = (
    "dataset string, column string, structural_type string, "
    "card long, mhs array<long>, ranges array<struct<gte: double, lte: double>>"
)

#: sentinel structural_type for spatial-coverage rows: the registry's
#: analog of the reference's datamart_spatial_coverage ES index —
#: column = "<lat>|<lon>", ranges = [(min_lat, max_lat), (min_lon, max_lon)]
SPATIAL_TYPE = "__spatial_coverage__"


def _latlon_pairs(profs) -> list[tuple]:
    """Deterministic lat/lon pairing: sorted latitude columns zipped
    with sorted longitude columns (the reference pairs detected
    lat/long columns per dataset, lib_profiler spatial handling)."""
    from ..profiler.types_infer import SEM_LATITUDE, SEM_LONGITUDE

    lats = sorted(
        (p for p in profs if SEM_LATITUDE in p.semantic_types), key=lambda p: p.name
    )
    lons = sorted(
        (p for p in profs if SEM_LONGITUDE in p.semantic_types), key=lambda p: p.name
    )
    return list(zip(lats, lons))


def _envelope(p) -> tuple[float, float] | None:
    """Overall (min, max) of a profiled column's coverage ranges."""
    if not p.ranges:
        return None
    return (min(g for g, _ in p.ranges), max(l for _, l in p.ranges))


class DatasetRegistry:
    """Parquet-backed registry at ``root`` (one row per column)."""

    def __init__(self, root: str, n_hashes: int = N_PERMUTATIONS):
        self.root = root
        self.n_hashes = n_hashes
        os.makedirs(root, exist_ok=True)

    def _table(self) -> str:
        return os.path.join(self.root, "columns")

    # --- write side -----------------------------------------------------

    def register(self, name: str, df: DataFrame) -> int:
        """Profile + sketch one dataset; replaces any prior registration
        of ``name``.  Returns the number of column rows written."""
        from ..profiler.types_infer import (
            TYPE_FLOAT, TYPE_INTEGER, TYPE_TEXT, profile_dataframe,
        )

        spark = df.sparkSession
        # P10: the synthetic d3mIndex column is excluded everywhere the
        # reference searches (search/join.py:54-56, union.py:35-37)
        df = df.drop("d3mIndex")
        if not df.columns:  # nothing searchable
            return 0
        profs = profile_dataframe(df, compute_ranges=True)

        text_cols = [p.name for p in profs if p.structural_type == TYPE_TEXT]
        sketches: dict[str, tuple[list[int], int]] = {}
        if text_cols:
            # ALL text columns in one job: stack (column, value) pairs,
            # distinct per column, then one grouped aggregation for the
            # K permutation minima + the exact cardinality
            stacked = (
                df.select(
                    F.explode(
                        F.array(*[
                            F.struct(
                                F.lit(c).alias("column"),
                                F.col(c).cast("string").alias("v"),
                            )
                            for c in text_cols
                        ])
                    ).alias("cv")
                )
                .select("cv.column", "cv.v")
                .where(F.col("v").isNotNull())
                .distinct()
            )
            aggs = [
                F.min(_perm_hash(F.col("v"), j)).alias(f"mh{j}")
                for j in range(self.n_hashes)
            ]
            aggs.append(F.count(F.lit(1)).alias("card"))
            for r in stacked.groupBy("column").agg(*aggs).collect():
                sketches[r["column"]] = (
                    [r[f"mh{j}"] for j in range(self.n_hashes)], int(r["card"])
                )

        rows = []
        for p in profs:
            sk, card = sketches.get(p.name, (None, None))
            ranges = None
            if p.structural_type in (TYPE_INTEGER, TYPE_FLOAT) and p.ranges:
                ranges = [(float(g), float(l)) for g, l in p.ranges]
            rows.append((name, p.name, p.structural_type, card, sk, ranges))
        # spatial coverage rows (J7): one box per detected lat/lon pair
        for plat, plon in _latlon_pairs(profs):
            box_lat, box_lon = _envelope(plat), _envelope(plon)
            if box_lat and box_lon:
                rows.append((
                    name, f"{plat.name}|{plon.name}", SPATIAL_TYPE, None, None,
                    [box_lat, box_lon],
                ))
        if not rows:  # nothing searchable (e.g. only d3mIndex)
            return 0
        out = spark.createDataFrame(rows, _SKETCH_SCHEMA)
        (
            out.coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("dataset")
            .parquet(self._table())
        )
        return len(rows)

    def is_empty(self) -> bool:
        return not os.path.isdir(self._table())

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self._table())

    # --- search side ------------------------------------------------------

    def search(
        self,
        input_df: DataFrame,
        keywords: str | None = None,
        k: int = 50,
    ) -> list[dict]:
        """Same result contract as ``discovery.augmentation_search`` but
        against the persistent registry, FULLY distributed: containment
        (sketch join), range overlap (exploded-ranges join) and union
        name-matching (levenshtein expressions + per-dataset greedy
        matching in applyInPandas) all execute as Spark plans; the
        driver collects only the two top-k result lists.  Job count AND
        driver memory are independent of registry size (the reference's
        ES queries return pages; the old implementation collected every
        registered column's metadata — fine at 10^3 datasets, a driver
        bottleneck at 10^5)."""
        import json

        import pandas as pd

        from ..profiler.types_infer import (
            TYPE_FLOAT, TYPE_INTEGER, TYPE_TEXT, profile_dataframe,
        )

        if self.is_empty():
            return []
        spark = input_df.sparkSession
        input_df = input_df.drop("d3mIndex")
        in_profs = profile_dataframe(input_df, compute_ranges=True)
        in_numeric = [
            p for p in in_profs
            if p.structural_type in (TYPE_INTEGER, TYPE_FLOAT) and p.ranges
        ]
        in_text = [p for p in in_profs if p.structural_type == TYPE_TEXT]

        kw_terms = [t for t in (keywords or "").lower().split() if t]
        reg = self.read(spark)
        # R4 keyword ×10: every query term contained in the dataset name
        if kw_terms:
            kw_expr = F.lit(True)
            for t in kw_terms:
                kw_expr = kw_expr & F.contains(F.lower("dataset"), F.lit(t))
            boost = F.when(kw_expr, F.lit(10.0)).otherwise(F.lit(1.0))
        else:
            boost = F.lit(1.0)

        join_parts: list[DataFrame] = []

        # text containment: broadcast the input sketches against the
        # registry sketch rows; Lazo arithmetic (JS = matches/K;
        # ∩ = JS/(1+JS)·(|L|+|R|); JC = ∩/|L| clamped) as column
        # expressions, matching lazo_containment_estimate
        if in_text:
            in_rows = [
                (p.name, *column_minhash_sketch(input_df, p.name, self.n_hashes))
                for p in in_text
            ]
            in_sk = spark.createDataFrame(
                in_rows, "input_column string, in_mhs array<long>, in_card long"
            )
            kk = float(self.n_hashes)
            matches = F.aggregate(
                F.zip_with(
                    "in_mhs", "mhs",
                    lambda a, b: F.when(
                        a.isNotNull() & a.eqNullSafe(b), F.lit(1)
                    ).otherwise(F.lit(0)),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            js = matches.cast("double") / F.lit(kk)
            inter = js / (F.lit(1.0) + js) * (
                F.col("in_card") + F.col("card")
            ).cast("double")
            jc = F.least(F.lit(1.0), inter / F.col("in_card").cast("double"))
            join_parts.append(
                reg.where(F.col("structural_type") == TYPE_TEXT)
                .where(F.col("mhs").isNotNull())
                .crossJoin(F.broadcast(in_sk))
                .where(F.col("in_card") > 0)
                .withColumn("score", jc * boost)
                .where(F.col("score") > 0)
                .select("dataset", "input_column", "column", "score")
            )

        # R2 range overlap: broadcast the input ranges (with each input
        # column's total coverage), explode the registry's range arrays,
        # positive-intersection arithmetic, sum per column pair
        if in_numeric:
            qr = []
            for p in in_numeric:
                total = sum(lte - gte + 1 for gte, lte in p.ranges)
                if total <= 0:
                    continue
                for gte, lte in p.ranges:
                    qr.append((p.name, float(gte), float(lte), float(total)))
            if qr:
                qdf = F.broadcast(spark.createDataFrame(
                    qr, "input_column string, q_gte double, q_lte double, total double"
                ))
                inter_len = (
                    F.least("q_lte", F.col("r.lte")) -
                    F.greatest("q_gte", F.col("r.gte")) + F.lit(1.0)
                )
                join_parts.append(
                    reg.where(
                        F.col("structural_type").isin([TYPE_INTEGER, TYPE_FLOAT])
                    )
                    .where(F.col("ranges").isNotNull())
                    .select("dataset", "column", F.explode("ranges").alias("r"))
                    .crossJoin(qdf)
                    .withColumn("inter", inter_len)
                    .where(F.col("inter") > 0)
                    .groupBy("dataset", "input_column", "column")
                    .agg(F.sum(F.col("inter") / F.col("total")).alias("raw"))
                    .withColumn("score", F.col("raw") * boost)
                    .select("dataset", "input_column", "column", "score")
                )

        # J7/R3 spatial: input lat/lon coverage boxes vs the registry's
        # spatial rows — intersection_area / query_coverage (the painless
        # script arithmetic), distributed like the range join above
        in_boxes = []
        for plat, plon in _latlon_pairs(in_profs):
            blat, blon = _envelope(plat), _envelope(plon)
            if blat and blon:
                in_boxes.append((f"{plat.name}|{plon.name}",
                                 float(blat[0]), float(blat[1]),
                                 float(blon[0]), float(blon[1])))
        if in_boxes:
            coverage = sum(
                (mx_lat - mn_lat) * (mx_lon - mn_lon)
                for _, mn_lat, mx_lat, mn_lon, mx_lon in in_boxes
            )
            if coverage > 0:
                qb = F.broadcast(spark.createDataFrame(
                    in_boxes,
                    "input_column string, q_min_lat double, q_max_lat double, "
                    "q_min_lon double, q_max_lon double",
                ))
                sp = (
                    reg.where(F.col("structural_type") == SPATIAL_TYPE)
                    .select(
                        "dataset", "column",
                        F.col("ranges")[0]["gte"].alias("min_lat"),
                        F.col("ranges")[0]["lte"].alias("max_lat"),
                        F.col("ranges")[1]["gte"].alias("min_lon"),
                        F.col("ranges")[1]["lte"].alias("max_lon"),
                    )
                    .crossJoin(qb)
                    .withColumn(
                        "i_lat",
                        F.least("q_max_lat", "max_lat")
                        - F.greatest("q_min_lat", "min_lat"),
                    )
                    .withColumn(
                        "i_lon",
                        F.least("q_max_lon", "max_lon")
                        - F.greatest("q_min_lon", "min_lon"),
                    )
                    .where((F.col("i_lat") > 0) & (F.col("i_lon") > 0))
                    .groupBy("dataset", "input_column", "column")
                    .agg(F.sum(
                        F.col("i_lat") * F.col("i_lon") / F.lit(coverage)
                    ).alias("raw"))
                    .withColumn("score", F.col("raw") * boost)
                    .select("dataset", "input_column", "column", "score")
                )
                join_parts.append(sp)

        join_results: list[dict] = []
        if join_parts:
            allj = join_parts[0]
            for part in join_parts[1:]:
                allj = allj.unionByName(part)
            top = (
                allj.orderBy(F.desc("score"), F.asc("dataset"), F.asc("column"))
                .limit(k)  # interleave consumes at most k join results
                .collect()
            )
            join_results = [
                {
                    "type": "join", "dataset": r["dataset"],
                    "input_column": r["input_column"], "column": r["column"],
                    "score": float(r["score"]),
                }
                for r in top
            ]

        # R6/W3 union: name similarities as levenshtein expressions
        # (identical arithmetic to discovery.name_similarity), greedy
        # matching per dataset inside applyInPandas — the only python in
        # the loop is O(columns-of-one-dataset) per task
        in_names = [p.name for p in in_profs]
        n_input = len(in_names)
        names_df = F.broadcast(spark.createDataFrame(
            [(n,) for n in in_names], "input_column string"
        ))
        la = F.lower("input_column")
        lb = F.lower("column")
        sim = F.when(
            F.contains(lb, la) | F.contains(la, lb), F.lit(1.0)
        ).otherwise(
            F.lit(1.0)
            - F.levenshtein(la, lb).cast("double")
            / F.greatest(F.length(la), F.length(lb)).cast("double")
        )
        pair_sims = (
            reg.where(F.col("structural_type") != SPATIAL_TYPE)  # pseudo-columns
            .select("dataset", "column").crossJoin(names_df)
            .withColumn("sim", sim)
        )

        def score_dataset(pdf):
            pairs = list(zip(pdf["input_column"], pdf["column"], pdf["sim"]))
            matched = [(a, b, float(x)) for a, b, x in greedy_pair_matching(pairs)]
            if len(matched) <= 1:
                return pd.DataFrame(
                    {"dataset": pd.Series([], dtype="str"),
                     "score": pd.Series([], dtype="float64"),
                     "pairs": pd.Series([], dtype="str")}
                )
            score = sum(s for _, _, s in matched) / n_input
            return pd.DataFrame(
                {
                    "dataset": [pdf["dataset"].iloc[0]],
                    "score": [score],
                    "pairs": [json.dumps(matched)],
                }
            )

        union_top = (
            pair_sims.groupby("dataset")
            .applyInPandas(score_dataset, schema="dataset string, score double, pairs string")
            .where(F.col("score") > 0)
            .orderBy(F.desc("score"), F.asc("dataset"))
            .limit(k)
            .collect()
        )
        union_results = [
            {
                "type": "union", "dataset": r["dataset"], "score": float(r["score"]),
                "matched_pairs": [tuple(x) for x in json.loads(r["pairs"])],
            }
            for r in union_top
        ]

        return interleave_results(join_results, union_results, k=k)

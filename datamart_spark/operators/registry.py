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
  as ``augmentation_search`` over everything registered, with a job
  count INDEPENDENT of registry size: input-side profiling + one
  sketch-table join for text containment (Lazo arithmetic as Spark
  column expressions over the broadcast input sketches) + one
  metadata-scale collect for range/union scoring.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .discovery import (
    N_PERMUTATIONS,
    _perm_hash,
    column_minhash_sketch,
    interleave_results,
    range_overlap_score,
    union_candidate_score,
)

_SKETCH_SCHEMA = (
    "dataset string, column string, structural_type string, "
    "card long, mhs array<long>, ranges array<struct<gte: double, lte: double>>"
)


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
        out = spark.createDataFrame(rows, _SKETCH_SCHEMA)
        (
            out.coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("dataset")
            .parquet(self._table())
        )
        return len(rows)

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
        against the persistent registry.  Job count is independent of
        the number of registered datasets."""
        from ..profiler.types_infer import (
            TYPE_FLOAT, TYPE_INTEGER, TYPE_TEXT, profile_dataframe,
        )

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

        join_results: list[dict] = []

        # text containment: ONE distributed join — broadcast the input
        # sketches against the registry sketch rows; Lazo arithmetic
        # (JS = matches/K; ∩ = JS/(1+JS)·(|L|+|R|); JC = ∩/|L| clamped)
        # as column expressions, matching lazo_containment_estimate
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
            scored = (
                reg.where(F.col("structural_type") == TYPE_TEXT)
                .where(F.col("mhs").isNotNull())
                .crossJoin(F.broadcast(in_sk))
                .where(F.col("in_card") > 0)
                .withColumn("jc", jc)
                .where(F.col("jc") > 0)
                .select("dataset", "input_column", "column", "jc")
            )
            for r in scored.collect():
                name = r["dataset"]
                kw_match = bool(kw_terms) and all(t in name.lower() for t in kw_terms)
                join_results.append(
                    {
                        "type": "join", "dataset": name,
                        "input_column": r["input_column"], "column": r["column"],
                        "score": float(r["jc"]) * (10.0 if kw_match else 1.0),  # R4
                    }
                )

        # range overlap + union matching: metadata-scale collect (one row
        # per registered column — the analog of the reference's ES hits)
        meta = reg.select("dataset", "column", "structural_type", "ranges").collect()
        by_dataset: dict[str, list] = {}
        for r in meta:
            by_dataset.setdefault(r["dataset"], []).append(r)

        union_results: list[dict] = []
        for name, cols in by_dataset.items():
            kw_match = bool(kw_terms) and all(t in name.lower() for t in kw_terms)
            for ip in in_numeric:
                for cr in cols:
                    if cr["structural_type"] not in (TYPE_INTEGER, TYPE_FLOAT):
                        continue
                    if not cr["ranges"]:
                        continue
                    score = range_overlap_score(
                        ip.ranges, [(x["gte"], x["lte"]) for x in cr["ranges"]]
                    )
                    if score > 0:
                        join_results.append(
                            {
                                "type": "join", "dataset": name,
                                "input_column": ip.name, "column": cr["column"],
                                "score": score * (10.0 if kw_match else 1.0),
                            }
                        )
            u_score, matched = union_candidate_score(
                [p.name for p in in_profs], [c["column"] for c in cols]
            )
            if u_score > 0:
                union_results.append(
                    {
                        "type": "union", "dataset": name, "score": u_score,
                        "matched_pairs": matched,
                    }
                )

        join_results.sort(key=lambda r: (-r["score"], r["dataset"], r["column"]))
        union_results.sort(key=lambda r: (-r["score"], r["dataset"]))
        return interleave_results(join_results, union_results, k=k)

"""Similarity search over the ``embeddings`` table (vec_id, embedding
float[64], label): brute-force cosine top-k (exact baseline) and a
random-hyperplane LSH bucketing (the scale path — at 100 TB the
bucket-join replaces the all-pairs product; here the bucket histogram
itself is oracle-checked so both engines agree on every assignment).

Float discipline: embeddings are float32; all arithmetic is done after
an explicit cast to double, sequentially over the array in index order
(Spark ``aggregate``, DuckDB ``list_aggregate``) so both engines
produce bit-identical doubles; results round(…,4) before ordering.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from . import register, table

# deterministic hyperplanes for sign-LSH, embedded as literals in BOTH
# engines so bucket assignments agree exactly
_DIM = 64
_N_PLANES = 4
_rng = np.random.Generator(np.random.PCG64(7))
_PLANES = np.round(_rng.standard_normal((_N_PLANES, _DIM)), 4)


def _plane_sql(p: np.ndarray) -> str:
    return "[" + ", ".join(f"{x:.4f}" for x in p) + "]::double[]"


def _plane_spark(p: np.ndarray) -> str:
    return "array(" + ", ".join(f"{x:.4f}d" for x in p) + ")"


_DOT_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " 0d, (s, v) -> s + v)"
)
_DOT_SQL = (
    "list_aggregate(list_transform(list_zip({a}, {b}),"
    " x -> x[1]::double * x[2]::double), 'sum')"
)
_NORM_SPARK = "sqrt(aggregate({a}, 0d, (s, v) -> s + cast(v as double) * cast(v as double)))"
_NORM_SQL = "sqrt(list_aggregate(list_transform({a}, v -> v::double * v::double), 'sum'))"


@register(
    "cosine_topk",
    f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
s AS (SELECT e.vec_id,
             {_DOT_SQL.format(a='e.embedding', b='q.qe')}
             / ({_NORM_SQL.format(a='e.embedding')} * {_NORM_SQL.format(a='q.qe')}) AS cos
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0)
SELECT vec_id, round(cos, 4) AS cosine FROM s
ORDER BY cosine DESC, vec_id ASC LIMIT 10
""",
)
def cosine_topk(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    s = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .withColumn(
            "cos",
            F.expr(
                _DOT_SPARK.format(a="embedding", b="qe")
                + " / ("
                + _NORM_SPARK.format(a="embedding")
                + " * "
                + _NORM_SPARK.format(a="qe")
                + ")"
            ),
        )
    )
    return (
        s.select("vec_id", F.round("cos", 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


def _bucket_exprs() -> tuple[str, str]:
    spark_bits = " + ".join(
        f"(CASE WHEN {_DOT_SPARK.format(a='embedding', b=_plane_spark(p))} >= 0d"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(_PLANES)
    )
    sql_bits = " + ".join(
        f"(CASE WHEN {_DOT_SQL.format(a='embedding', b=_plane_sql(p))} >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(_PLANES)
    )
    return spark_bits, sql_bits


_SPARK_BUCKET, _SQL_BUCKET = _bucket_exprs()


@register(
    "lsh_bucket_histogram",
    f"""
SELECT ({_SQL_BUCKET}) AS bucket, count(*) AS n
FROM embeddings GROUP BY 1 ORDER BY bucket
""",
)
def lsh_bucket_histogram(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.withColumn("bucket", F.expr(_SPARK_BUCKET))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


@register(
    "ann_lsh_candidates",
    f"""
WITH b AS (SELECT vec_id, embedding, ({_SQL_BUCKET}) AS bucket FROM embeddings),
q AS (SELECT bucket AS qb, embedding AS qe FROM b WHERE vec_id = 7),
s AS (SELECT b.vec_id,
             {_DOT_SQL.format(a='b.embedding', b='q.qe')}
             / ({_NORM_SQL.format(a='b.embedding')} * {_NORM_SQL.format(a='q.qe')}) AS cos
      FROM b JOIN q ON b.bucket = q.qb WHERE b.vec_id <> 7)
SELECT vec_id, round(cos, 4) AS cosine FROM s ORDER BY cosine DESC, vec_id ASC LIMIT 5
""",
)
def ann_lsh_candidates(spark, sf_dir):
    """ANN: restrict cosine search to the query's LSH bucket — the
    bucketed-join plan that replaces all-pairs at scale."""
    emb = table(spark, sf_dir, "embeddings").withColumn("bucket", F.expr(_SPARK_BUCKET))
    q = emb.where(F.col("vec_id") == 7).select(
        F.col("bucket").alias("qb"), F.col("embedding").alias("qe")
    )
    s = (
        emb.where(F.col("vec_id") != 7)
        .join(F.broadcast(q), F.col("bucket") == F.col("qb"))
        .withColumn(
            "cos",
            F.expr(
                _DOT_SPARK.format(a="embedding", b="qe")
                + " / ("
                + _NORM_SPARK.format(a="embedding")
                + " * "
                + _NORM_SPARK.format(a="qe")
                + ")"
            ),
        )
    )
    return (
        s.select("vec_id", F.round("cos", 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(5)
    )


@register(
    "label_centroid_norm",
    f"""
SELECT label, count(*) AS n,
       round(avg({_NORM_SQL.format(a='embedding')}), 4) AS avg_norm
FROM embeddings GROUP BY label ORDER BY label
""",
)
def label_centroid_norm(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.withColumn("nrm", F.expr(_NORM_SPARK.format(a="embedding")))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("nrm"), 4).alias("avg_norm"))
        .orderBy("label")
    )

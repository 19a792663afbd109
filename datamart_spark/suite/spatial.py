"""Spatial suite (P5/J3/J7/R3) over deterministic synthetic coordinates.

The driver's tables carry no lat/lon, so both engines derive identical
points from integer keys (pure modular arithmetic — bit-identical in
Spark and DuckDB):

    lat(k) = ((k*9301 + 49297) % 18000)/100 − 90     ∈ [−90, 90)
    lon(k) = ((k*7919 + 104729) % 36000)/100 − 180   ∈ [−180, 180)

Semantics per the reference: P5 envelope-intersects filter, J3 nearest
join within a fixed radius (Euclidean on raw coordinates, exactly the
sklearn-KDTree arithmetic — lib_augmentation/augmentation.py:420-443),
J7/R3 envelope intersection scored by intersection_area/query_coverage
(the painless script, apiserver search/join.py:252-292).  The Spark
side runs the GRID-CELL join (operators/spatial.py — never an
all-pairs); the DuckDB oracle brute-forces the same answer, so the
gate proves the grid plan exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register, table

_NN_DIST = 10.0

_LAT = "(({k} * 9301 + 49297) % 18000) / 100.0 - 90.0"
_LON = "(({k} * 7919 + 104729) % 36000) / 100.0 - 180.0"


def _points(df, key_col: str):
    # cast: Spark parses the `/ 100.0` literal as DECIMAL (DuckDB as
    # DOUBLE) — all coordinate arithmetic must run in doubles on both
    # sides or rounding/formatting diverges
    return df.select(
        F.col(key_col),
        F.expr(_LAT.format(k=key_col)).cast("double").alias("lat"),
        F.expr(_LON.format(k=key_col)).cast("double").alias("lon"),
    )


@register(
    "spatial_bbox_filter",
    f"""
WITH c AS (SELECT c_custkey, {_LAT.format(k='c_custkey')} AS lat,
                  {_LON.format(k='c_custkey')} AS lon
           FROM customer)
SELECT c_custkey, round(lat, 4)::double AS lat, round(lon, 4)::double AS lon
FROM c
WHERE lat BETWEEN 10.0 AND 45.0 AND lon BETWEEN -20.0 AND 40.0
ORDER BY c_custkey LIMIT 50
""",
)
def spatial_bbox_filter(spark, sf_dir):
    """P5: non-scoring envelope filter context."""
    from ..operators.spatial import bbox_filter

    pts = _points(table(spark, sf_dir, "customer"), "c_custkey")
    return (
        bbox_filter(pts, "lat", "lon", 10.0, 45.0, -20.0, 40.0)
        .select("c_custkey", F.round("lat", 4).alias("lat"),
                F.round("lon", 4).alias("lon"))
        .orderBy("c_custkey")
        .limit(50)
    )


@register(
    "spatial_nn_join_grid",
    f"""
WITH c AS (SELECT c_custkey, {_LAT.format(k='c_custkey')} AS lat,
                  {_LON.format(k='c_custkey')} AS lon FROM customer),
s AS (SELECT s_suppkey, {_LAT.format(k='s_suppkey')} AS slat,
             {_LON.format(k='s_suppkey')} AS slon FROM supplier),
pairs AS (SELECT c.c_custkey, s.s_suppkey,
                 sqrt((c.lat - s.slat)*(c.lat - s.slat)
                      + (c.lon - s.slon)*(c.lon - s.slon)) AS dist,
                 s.slat, s.slon
          FROM c CROSS JOIN s),
near AS (SELECT c_custkey, s_suppkey, dist,
                row_number() OVER (PARTITION BY c_custkey
                                   ORDER BY dist, slat, slon) AS rk
         FROM pairs WHERE dist <= {_NN_DIST!r})
SELECT c_custkey, s_suppkey, round(dist, 4) AS nn_dist
FROM near WHERE rk = 1 ORDER BY c_custkey LIMIT 100
""",
)
def spatial_nn_join_grid(spark, sf_dir):
    """J3: nearest supplier point within a fixed radius for every
    customer point — Spark runs the exact grid-cell plan; the oracle
    brute-forces all pairs.  Hash-match proves the grid join exact."""
    from ..operators.spatial import spatial_nn_join

    c = _points(table(spark, sf_dir, "customer"), "c_custkey")
    s = _points(table(spark, sf_dir, "supplier"), "s_suppkey").withColumnRenamed(
        "lat", "slat"
    ).withColumnRenamed("lon", "slon")
    out = spatial_nn_join(
        c, s, ("lat", "lon"), ("slat", "slon"), max_dist=_NN_DIST
    )
    return (
        out.select("c_custkey", "s_suppkey", F.round("nn_dist", 4).alias("nn_dist"))
        .orderBy("c_custkey")
        .limit(100)
    )


# two query envelopes (min_lat, max_lat, min_lon, max_lon)
_QUERY_BOXES = [(-30.0, 20.0, -60.0, 10.0), (30.0, 70.0, 60.0, 150.0)]
_COVERAGE = sum((b[1] - b[0]) * (b[3] - b[2]) for b in _QUERY_BOXES)


@register(
    "spatial_overlap_boxes",
    f"""
WITH c AS (SELECT c_nationkey, {_LAT.format(k='c_custkey')} AS lat,
                  {_LON.format(k='c_custkey')} AS lon FROM customer),
boxes AS (SELECT n.n_name AS dataset,
                 min(lat) AS min_lat, max(lat) AS max_lat,
                 min(lon) AS min_lon, max(lon) AS max_lon
          FROM c JOIN nation n ON n.n_nationkey = c.c_nationkey
          GROUP BY 1),
q AS (SELECT * FROM (VALUES
        (-30.0, 20.0, -60.0, 10.0),
        (30.0, 70.0, 60.0, 150.0))
      AS t(q_min_lat, q_max_lat, q_min_lon, q_max_lon)),
scored AS (SELECT dataset,
                  least(q_max_lat, max_lat) - greatest(q_min_lat, min_lat) AS i_lat,
                  least(q_max_lon, max_lon) - greatest(q_min_lon, min_lon) AS i_lon
           FROM boxes CROSS JOIN q)
SELECT dataset,
       round(sum(i_lat * i_lon / {_COVERAGE!r}), 4) AS score
FROM scored WHERE i_lat > 0 AND i_lon > 0
GROUP BY dataset ORDER BY score DESC, dataset ASC LIMIT 50
""",
)
def spatial_overlap_boxes(spark, sf_dir):
    """J7 + R3: per-nation coverage boxes of the customer points,
    filtered to query-envelope intersections (P5) and scored by the
    reference's intersection_area / query_coverage (painless parity)."""
    from ..operators.spatial import spatial_join_candidates

    c = _points(table(spark, sf_dir, "customer"), "c_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    boxes = (
        c.join(cust, "c_custkey")
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(F.col("n_name").alias("dataset"))
        .agg(
            F.min("lat").alias("min_lat"), F.max("lat").alias("max_lat"),
            F.min("lon").alias("min_lon"), F.max("lon").alias("max_lon"),
        )
    )
    scored = spatial_join_candidates(boxes, _QUERY_BOXES, k=50)
    return scored.select("dataset", F.round("score", 4).alias("score")).orderBy(
        F.desc("score"), F.asc("dataset")
    )

"""Augmentation operator tests — mirrors the reference's
tests/test_augmentation.py golden style (order-insensitive rows)."""

import pytest

from datamart_spark.operators import join_augment, temporal_aligned_join, union_augment


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [("Alice", "NYC"), ("Bob", "SF"), ("Cara", "LA")],
        "name string, city string",
    )


@pytest.fixture(scope="module")
def salaries(spark):
    # 1:N companion — Alice has two rows; city key needs lowercasing
    return spark.createDataFrame(
        [("alice", 100.0, "x"), ("alice", 200.0, "y"), ("bob", 50.0, "z")],
        "who string, salary double, tag string",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_join_augment_default_aggs(spark, people, salaries):
    left = people.withColumnRenamed("name", "who_name")
    out = join_augment(
        left.withColumn("who", left["who_name"]),
        salaries,
        ["who"],
        ["who"],
    )
    cols = set(out.columns)
    # default numeric agg set mean/sum/max/min named "<agg> <col>"
    assert {"mean salary", "sum salary", "max salary", "min salary", "first tag"} <= cols
    got = {r["who"]: r for r in out.collect()}
    # original key values pass through un-mutated (the reference lowercases
    # only the join index, set_data_index drop=False — augmentation.py:122-126);
    # matching is still case-insensitive ("Alice" joins "alice")
    assert set(got) == {"Alice", "Bob", "Cara"}
    assert got["Alice"]["mean salary"] == pytest.approx(150.0)
    assert got["Alice"]["sum salary"] == pytest.approx(300.0)
    assert got["Alice"]["max salary"] == 200.0
    assert got["Alice"]["min salary"] == 100.0
    assert got["Alice"]["first tag"] in ("x", "y")
    # left join keeps unmatched input rows, aggs null (sum null-if-all-null)
    assert got["Cara"]["sum salary"] is None
    assert got["Cara"]["mean salary"] is None
    # exactly one output row per input row (A1 de-duplication)
    assert out.count() == people.count()


def test_join_augment_custom_aggs(spark, people, salaries):
    out = join_augment(
        people.withColumn("who", people["name"]),
        salaries,
        ["who"],
        ["who"],
        agg_functions={"salary": ["count", "sum"]},
    )
    got = {r["who"]: r for r in out.collect()}
    assert got["Alice"]["count salary"] == 2
    assert got["Cara"]["count salary"] == 0  # count = non-null count


def test_join_augment_inner(spark, people, salaries):
    out = join_augment(
        people.withColumn("who", people["name"]), salaries, ["who"], ["who"], how="inner"
    )
    assert out.count() == 2  # cara dropped


def test_temporal_aligned_join(spark):
    import pandas as pd

    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "ts": pd.to_datetime(["2023-01-01", "2023-01-02", "2023-01-03"]),
                "v": [1, 2, 3],
            }
        )
    )
    # hourly companion: 2023-01-01 has 24 readings 0..23, etc.
    comp = spark.createDataFrame(
        pd.DataFrame(
            {
                "when": pd.date_range("2023-01-01", periods=72, freq="h"),
                "reading": [float(i % 24) for i in range(72)],
            }
        )
    )
    out = temporal_aligned_join(left, comp, "ts", "when")
    got = {r["v"]: r for r in out.collect()}
    # coarser(day, hour) = day → each left day aggregates 24 readings
    assert got[1]["mean reading"] == pytest.approx(sum(range(24)) / 24)
    assert got[1]["sum reading"] == pytest.approx(sum(range(24)))
    assert out.count() == 3


def test_temporal_aligned_join_explicit_resolution(spark):
    import pandas as pd

    left = spark.createDataFrame(
        pd.DataFrame({"ts": pd.to_datetime(["2023-01-01 05:00", "2023-02-01 09:30"]), "v": [1, 2]})
    )
    comp = spark.createDataFrame(
        pd.DataFrame(
            {"when": pd.to_datetime(["2023-01-20", "2023-02-11"]), "reading": [10.0, 20.0]}
        )
    )
    out = temporal_aligned_join(left, comp, "ts", "when", resolution="month")
    got = {r["v"]: r for r in out.collect()}
    assert got[1]["sum reading"] == 10.0
    assert got[2]["sum reading"] == 20.0


def test_union_augment(spark):
    a = spark.createDataFrame([(1, "x", 1.0)], "id long, name string, score double")
    b = spark.createDataFrame([("y", 2)], "name string, id long")  # missing score, reordered
    out = union_augment(a, b)
    assert out.columns == ["id", "name", "score"]
    assert _rows(out) == [(1, "x", 1.0), (2, "y", None)]

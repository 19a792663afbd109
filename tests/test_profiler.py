"""Datamart-parity profiling tests — mirrors the reference's
tests/test_profile.py expectations on basic/temporal/messy fixtures
(FIXTURES.md §3)."""

import pytest

from datamart_spark.profiler import detect_resolution, profile_dataframe
from datamart_spark.profiler.temporal import coarser
from datamart_spark.profiler.types_infer import (
    SEM_BOOLEAN,
    SEM_DATETIME,
    SEM_ENUMERATION,
    SEM_IDENTIFIER,
    TYPE_FLOAT,
    TYPE_INTEGER,
    TYPE_MISSING,
    TYPE_TEXT,
)


@pytest.fixture(scope="module")
def basic(spark):
    # mirrors tests/data/basic.csv shape: name, country(categorical),
    # number(int-as-str), what(bool-as-str)
    rows = [
        ("james", "canada", "3", "false"),
        ("john", "usa", "5", "true"),
        ("robert", "usa", "21", "false"),
        ("michael", "canada", "12", "true"),
        ("william", "usa", "9", "false"),
        ("david", "canada", "7", "true"),
        ("richard", "usa", "14", "false"),
        ("joseph", "canada", "2", "true"),
        ("thomas", "usa", "11", "false"),
        ("charles", "canada", "6", "true"),
        ("chris", "usa", "8", "false"),
        ("daniel", "canada", "19", "true"),
        ("matthew", "usa", "16", "false"),
        ("anthony", "canada", "4", "true"),
        ("mark", "usa", "17", "false"),
        ("donald", "canada", "1", "true"),
        ("steven", "usa", "13", "false"),
        ("paul", "canada", "10", "true"),
        ("andrew", "usa", "15", "false"),
        ("joshua", "canada", "18", "true"),
    ]
    return spark.createDataFrame(rows, "name string, country string, number string, what string")


def _by_name(profiles):
    return {p.name: p for p in profiles}


def test_basic_types(basic):
    p = _by_name(profile_dataframe(basic))
    assert p["number"].structural_type == TYPE_INTEGER
    assert p["name"].structural_type == TYPE_TEXT
    assert p["country"].structural_type == TYPE_TEXT
    assert SEM_ENUMERATION in p["country"].semantic_types  # 2 distinct / 20
    assert SEM_BOOLEAN in p["what"].semantic_types
    assert p["number"].mean == pytest.approx(10.55)
    # population stddev (÷n, not n-1) — numerical.py:17-33
    import math

    vals = [3, 5, 21, 12, 9, 7, 14, 2, 11, 6, 8, 19, 16, 4, 17, 1, 13, 10, 15, 18]
    mean = sum(vals) / len(vals)
    std = math.sqrt(sum((v - mean) ** 2 for v in vals) / len(vals))
    assert p["number"].stddev == pytest.approx(std)


def test_unclean_threshold(spark):
    # 2% non-numeric tolerated (MAX_UNCLEAN=0.02): 1 bad out of 100 → Integer
    rows = [(str(i),) for i in range(99)] + [("oops",)]
    df = spark.createDataFrame(rows, "mixed string")
    p = _by_name(profile_dataframe(df, compute_ranges=False))
    assert p["mixed"].structural_type == TYPE_INTEGER
    # 3 bad out of 100 → Text
    rows = [(str(i),) for i in range(97)] + [("a",), ("b",), ("c",)]
    df = spark.createDataFrame(rows, "mixed string")
    p = _by_name(profile_dataframe(df, compute_ranges=False))
    assert p["mixed"].structural_type == TYPE_TEXT


def test_missing_and_float_and_year(spark):
    rows = [("", "1.5", "1995"), ("", "2.25", "2001"), (None, "-3e2", "1987")]
    df = spark.createDataFrame(rows, "empty string, f string, year string")
    p = _by_name(profile_dataframe(df, compute_ranges=False))
    assert p["empty"].structural_type == TYPE_MISSING
    assert p["f"].structural_type == TYPE_FLOAT
    assert p["year"].structural_type == TYPE_INTEGER
    assert SEM_DATETIME in p["year"].semantic_types  # year rule


def test_identifier_rule(spark):
    df = spark.createDataFrame([(str(i), str(i)) for i in range(30)], "user_id string, v string")
    p = _by_name(profile_dataframe(df, compute_ranges=False))
    assert SEM_IDENTIFIER in p["user_id"].semantic_types


def test_datetime_detection(spark):
    rows = [(f"2023-05-{d:02d} 10:00:00",) for d in range(1, 29)]
    df = spark.createDataFrame(rows, "when string")
    p = _by_name(profile_dataframe(df, compute_ranges=False))
    assert p["when"].structural_type == TYPE_TEXT
    assert SEM_DATETIME in p["when"].semantic_types


def test_detect_resolution(spark):
    import pandas as pd

    hourly = spark.createDataFrame(
        pd.DataFrame({"ts": pd.date_range("2023-01-01", periods=96, freq="h")})
    )
    assert detect_resolution(hourly, "ts") == "hour"
    daily = spark.createDataFrame(
        pd.DataFrame({"ts": pd.date_range("2023-01-01", periods=60, freq="D")})
    )
    assert detect_resolution(daily, "ts") == "day"


def test_coarser():
    assert coarser("hour", "day") == "day"
    assert coarser("year", "second") == "year"
    assert coarser("month", "month") == "month"

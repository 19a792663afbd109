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


# --- Nominatim address resolution (injectable transport) ---------------------


def _fake_nominatim(known: dict, fail_statuses=None, max_batch=None):
    """Canned Nominatim transport: parses the batch/single query out of
    the URL and answers from ``known`` (address → (lat, lon)).
    ``fail_statuses`` is a mutable list of statuses to emit first (one
    per call); ``max_batch`` returns HTTP 414 for larger batches."""
    import json
    import urllib.parse

    calls = []

    def fetch(url):
        calls.append(url)
        if fail_statuses:
            return fail_statuses.pop(0), "text/html", b"err"
        qs = urllib.parse.parse_qs(urllib.parse.urlparse(url).query)
        if "batch" in qs:
            queries = [d["q"] for d in json.loads(qs["batch"][0])]
            if max_batch is not None and len(queries) > max_batch:
                return 414, "text/html", b"too long"
            out = []
            for q in queries:
                if q in known:
                    lat, lon = known[q]
                    out.append([{"lat": str(lat), "lon": str(lon)}])
                else:
                    out.append([])
            return 200, "application/json", json.dumps({"batch": out}).encode()
        q = qs["q"][0]
        body = (
            [{"lat": str(known[q][0]), "lon": str(known[q][1])}]
            if q in known
            else []
        )
        return 200, "application/json", json.dumps(body).encode()

    fetch.calls = calls
    return fetch


def test_nominatim_resolve_all_semantics():
    from datamart_spark.profiler.nominatim import nominatim_resolve_all

    known = {"paris": (48.85, 2.35), "berlin": (52.52, 13.40)}
    fetch = _fake_nominatim(known)
    # duplicates are count-weighted; unknowns counted non-empty; blanks
    # skipped; >90-char values skipped without a lookup
    vals = ["paris", "paris", "berlin", "nowhere-x", "", "  ", "x" * 91]
    locations, non_empty = nominatim_resolve_all(
        "http://nominatim.example/", vals, fetch=fetch, sleep=lambda s: None
    )
    assert non_empty == 5  # 2×paris + berlin + nowhere-x + the long value
    assert locations == [(48.85, 2.35), (48.85, 2.35), (52.52, 13.40)]
    assert len(fetch.calls) == 1  # one batch for 3 distinct lookups


def test_nominatim_retries_gateway_errors():
    from datamart_spark.profiler.nominatim import NominatimError, nominatim_query

    fetch = _fake_nominatim({"paris": (48.85, 2.35)}, fail_statuses=[503, 502])
    res = nominatim_query(
        "http://n.example", "paris", fetch=fetch, sleep=lambda s: None
    )
    assert res[0]["lat"] == "48.85"
    assert len(fetch.calls) == 3  # two gateway failures then success

    fetch2 = _fake_nominatim({}, fail_statuses=[503] * 5)
    with pytest.raises(NominatimError):
        nominatim_query("http://n.example", "x", fetch=fetch2, sleep=lambda s: None)
    assert len(fetch2.calls) == 5  # gives up after 5 attempts


def test_nominatim_batch_split_on_414():
    from datamart_spark.profiler.nominatim import nominatim_resolve_all

    known = {f"town{i}": (10.0 + i, 20.0 + i) for i in range(12)}
    fetch = _fake_nominatim(known, max_batch=6)
    vals = list(known)
    locations, non_empty = nominatim_resolve_all(
        "http://n.example", vals, fetch=fetch, sleep=lambda s: None
    )
    assert non_empty == 12 and len(locations) == 12
    # 12-value batch 414s, splits into two 6-value halves that succeed
    assert len(fetch.calls) == 3


def test_profile_dataframe_marks_address_column(spark):
    from datamart_spark.profiler.nominatim import SEM_ADDRESS

    known = {
        "20 W 34th St, New York": (40.748, -73.985),
        "1600 Pennsylvania Ave, Washington": (38.897, -77.036),
        "221B Baker Street, London": (51.523, -0.158),
        "4 Rue du Pont Neuf, Paris": (48.86, 2.34),
    }
    fetch = _fake_nominatim(known)
    addrs = list(known) * 3  # 12 rows, all resolvable free text
    df = spark.createDataFrame(
        [(a, "constant") for a in addrs], "addr string, tag string"
    )
    profs = {
        p.name: p
        for p in profile_dataframe(
            df, compute_ranges=False,
            nominatim="http://n.example", nominatim_fetch=fetch,
        )
    }
    assert SEM_ADDRESS in profs["addr"].semantic_types
    lo_lat, hi_lat, lo_lon, hi_lon = profs["addr"].address_bounds
    assert lo_lat == 38.897 and hi_lat == 51.523
    assert lo_lon == -77.036 and hi_lon == 2.34
    # the categorical non-free-text column is never sent to Nominatim
    assert SEM_ADDRESS not in profs["tag"].semantic_types


def test_profile_dataframe_address_unclean_gate(spark):
    from datamart_spark.profiler.nominatim import SEM_ADDRESS

    known = {"5 Main Street Springfield": (39.8, -89.6)}
    fetch = _fake_nominatim(known)
    rows = ["5 Main Street Springfield"] * 7 + [
        "utterly unresolvable gibberish one",
        "utterly unresolvable gibberish two",
        "utterly unresolvable gibberish three",
    ]
    df = spark.createDataFrame([(a,) for a in rows], "addr string")
    profs = profile_dataframe(
        df, compute_ranges=False,
        nominatim="http://n.example", nominatim_fetch=fetch,
    )
    # 3/10 unresolved > 20% unclean cap -> not an address column
    assert SEM_ADDRESS not in profs[0].semantic_types

"""Format detection/conversion (S5-S9, S11) and writers (S15)."""

import csv
import json
import os

import pandas as pd
import pytest

from datamart_spark.sources import (
    CONVERTERS,
    CsvWriter,
    D3mWriter,
    PandasWriter,
    detect_format,
    read_auto,
    sniff_delimiter,
    tsv_to_csv,
)
from datamart_spark.sources.formats import ConverterUnavailable, looks_pivoted


@pytest.fixture()
def files(tmp_path):
    csv_p = tmp_path / "a.csv"
    csv_p.write_text("name,age\nalice,3\nbob,4\n")
    tsv_p = tmp_path / "b.tsv"
    tsv_p.write_text("name\tage\nalice\t3\nbob\t4\n")
    semi_p = tmp_path / "c.txt"
    semi_p.write_text("name;age\nalice;3\nbob;4\n")
    dta_p = tmp_path / "d.dta"
    pd.DataFrame({"name": ["alice", "bob"], "age": [3, 4]}).to_stata(
        dta_p, write_index=False
    )
    xlsx_p = tmp_path / "e.xlsx"
    xlsx_p.write_bytes(b"PK\x03\x04" + b"\x00" * 64)
    sav_p = tmp_path / "f.sav"
    sav_p.write_bytes(b"$FL2" + b"\x00" * 64)
    return {"csv": csv_p, "tsv": tsv_p, "semi": semi_p, "stata": dta_p,
            "excel": xlsx_p, "spss": sav_p}


def test_detect_format_chain(files):
    assert detect_format(str(files["csv"])) == "csv"
    assert detect_format(str(files["tsv"])) == "tsv"
    assert detect_format(str(files["semi"])) == "tsv"  # non-comma delimited
    assert detect_format(str(files["stata"])) == "stata"
    assert detect_format(str(files["excel"])) == "excel"
    assert detect_format(str(files["spss"])) == "spss"


def test_sniff_and_tsv_to_csv(files, tmp_path):
    assert sniff_delimiter(str(files["tsv"])) == "\t"
    assert sniff_delimiter(str(files["semi"])) == ";"
    out = tmp_path / "out.csv"
    tsv_to_csv(str(files["tsv"]), str(out))
    rows = list(csv.reader(open(out)))
    assert rows == [["name", "age"], ["alice", "3"], ["bob", "4"]]


def test_stata_roundtrip_via_read_auto(spark, files):
    df = read_auto(spark, str(files["stata"]))
    got = {r["name"]: r["age"] for r in df.collect()}
    assert got == {"alice": "3", "bob": "4"}  # all-string ingest


def test_read_auto_delimited(spark, files):
    for key in ("csv", "tsv", "semi"):
        df = read_auto(spark, str(files[key]))
        assert df.columns == ["name", "age"]
        assert df.count() == 2


def test_unavailable_converters_raise_cleanly(files, tmp_path):
    with pytest.raises(ConverterUnavailable, match="openpyxl"):
        CONVERTERS["excel"](str(files["excel"]), str(tmp_path / "x.csv"))
    with pytest.raises(ConverterUnavailable, match="pyreadstat"):
        CONVERTERS["spss"](str(files["spss"]), str(tmp_path / "y.csv"))


def test_looks_pivoted():
    # reference rule (materialize.py:244-248): ≥3 columns, non-date
    # column count ≤ max(2, 20%·n)
    assert looks_pivoted(["country", "2001", "2002", "2003"])
    assert looks_pivoted(["country", "gdp", "2001"])  # 2 non-dates allowed
    assert not looks_pivoted(["country", "gdp", "pop", "2001", "2002"])  # 3 > 2
    assert not looks_pivoted(["country", "2001"])  # <3 columns


def test_csv_and_pandas_writers(spark, tmp_path):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    dest = str(tmp_path / "out_csv")
    CsvWriter(dest).write(df)
    part = [f for f in os.listdir(dest) if f.startswith("part-")]
    assert len(part) == 1  # coalesced single file
    pdf = PandasWriter().write(df)
    assert sorted(pdf["k"]) == ["a", "b"]


def test_d3m_writer_layout(spark, tmp_path):
    df = spark.createDataFrame(
        [("alice", "3"), ("bob", "4")], "name string, age string"
    )
    dest = str(tmp_path / "d3m")
    D3mWriter("ds1", dest).write(df)
    doc = json.load(open(os.path.join(dest, "datasetDoc.json")))
    assert doc["about"]["datasetID"] == "ds1"
    res = doc["dataResources"][0]
    assert res["resPath"] == "tables/learningData.csv"
    cols = {c["colName"]: c for c in res["columns"]}
    assert cols["d3mIndex"]["role"] == ["index"]
    assert cols["age"]["colType"] == "integer"  # profiled from strings
    data = pd.read_csv(os.path.join(dest, "tables", "learningData.csv"))
    assert list(data.columns)[0] == "d3mIndex"
    assert list(data["d3mIndex"]) == [0, 1]

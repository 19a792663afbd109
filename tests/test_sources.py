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
    xls_p = tmp_path / "legacy.xls"
    xls_p.write_bytes(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 64)
    with pytest.raises(ConverterUnavailable, match="xlrd"):
        CONVERTERS["excel97"](str(xls_p), str(tmp_path / "x.csv"))
    with pytest.raises(ConverterUnavailable, match="pyreadstat"):
        CONVERTERS["spss"](str(files["spss"]), str(tmp_path / "y.csv"))


def _write_min_xlsx(path, date1904=False):
    """Hand-built minimal xlsx (no Excel writer lib in the sandbox):
    header via sharedStrings, one data row exercising shared string,
    builtin-date style, custom-date style, float, int, bool, inline
    string and a column gap."""
    import zipfile

    wb = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <workbookPr{d1904}/><sheets><sheet name="s1" sheetId="1" r:id="rId1"/></sheets>
</workbook>""".format(d1904=' date1904="1"' if date1904 else "")
    rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1"
  Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet"
  Target="worksheets/sheet1.xml"/>
</Relationships>"""
    styles = """<?xml version="1.0"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy\\-mm\\-dd"/></numFmts>
 <cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="164"/></cellXfs>
</styleSheet>"""
    sst = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
 <si><t>name</t></si><si><t>when</t></si><si><t>score</t></si><si><t>al</t><t>ice</t></si>
</sst>"""
    sheet = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
  <row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2" s="1"><v>44197</v></c><c r="C2"><v>2.5</v></c><c r="D2"><v>42</v></c></row>
  <row r="3"><c r="A3" t="inlineStr"><is><t>bob</t></is></c><c r="B3" s="2"><v>44198.5</v></c><c r="D3" t="b"><v>1</v></c></row>
 </sheetData>
</worksheet>"""
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/styles.xml", styles)
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def test_xlsx_to_csv_stdlib(tmp_path):
    """S6 real converter: reference parity (lib_materialize/excel.py:
    8-31) — single sheet, ISO-8601 dates, '%g' numbers."""
    src = tmp_path / "m.xlsx"
    _write_min_xlsx(str(src))
    assert detect_format(str(src)) == "excel"
    dst = tmp_path / "m.csv"
    CONVERTERS["excel"](str(src), str(dst))
    rows = list(csv.reader(open(dst)))
    assert rows == [
        ["name", "when", "score", ""],
        ["alice", "2021-01-01T00:00:00", "2.5", "42"],
        ["bob", "2021-01-02T12:00:00", "", "1"],
    ]


def test_xlsx_sparse_rows_padded(tmp_path):
    """ADVICE r3: wholly-absent <row> elements (sparse sheets) must
    emit empty CSV rows — xlrd pads to nrows, so row indices in the
    output must not shift relative to the reference converter."""
    import zipfile

    src = tmp_path / "sp.xlsx"
    _write_min_xlsx(str(src))
    with zipfile.ZipFile(src) as z:
        parts = {n: z.read(n) for n in z.namelist()}
    parts["xl/worksheets/sheet1.xml"] = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>2</v></c></row>
  <row r="4"><c r="A4" t="inlineStr"><is><t>bob</t></is></c><c r="B4"><v>7</v></c></row>
 </sheetData>
</worksheet>"""
    with zipfile.ZipFile(src, "w") as z:
        for n, data in parts.items():
            z.writestr(n, data)
    dst = tmp_path / "sp.csv"
    CONVERTERS["excel"](str(src), str(dst))
    rows = list(csv.reader(open(dst)))
    assert rows == [
        ["name", "score"],
        ["", ""],
        ["", ""],
        ["bob", "7"],
    ]


def test_xlsx_multi_sheet_rejected(tmp_path):
    import zipfile

    src = tmp_path / "two.xlsx"
    _write_min_xlsx(str(src))
    # append a second sheet entry to the workbook
    import re as _re
    with zipfile.ZipFile(src) as z:
        parts = {n: z.read(n) for n in z.namelist()}
    parts["xl/workbook.xml"] = _re.sub(
        rb"</sheets>",
        b'<sheet name="s2" sheetId="2" r:id="rId2"/></sheets>',
        parts["xl/workbook.xml"],
    )
    with zipfile.ZipFile(src, "w") as z:
        for n, data in parts.items():
            z.writestr(n, data)
    with pytest.raises(ValueError, match="2 sheets"):
        CONVERTERS["excel"](str(src), str(tmp_path / "t.csv"))


def test_xlsx_read_auto_roundtrip(spark, tmp_path):
    src = tmp_path / "r.xlsx"
    _write_min_xlsx(str(src))
    df = read_auto(spark, str(src))
    got = {r["name"]: r["score"] for r in df.collect()}
    assert got == {"alice": "2.5", "bob": None}


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


def test_materialize_direct_and_proxy_file_urls(spark, tmp_path, files):
    """S3/S4: file:// (and bare-path) materialization is real; size caps
    raise DatasetTooBig; http(s) failures surface as MaterializeError."""
    from datamart_spark.sources.materialize import (
        DatasetTooBig,
        MaterializeError,
        direct_download,
        materialize_to_dataframe,
        proxy_download,
    )

    dest = tmp_path / "out.bin"
    n = direct_download(str(files["csv"]), str(dest))
    assert n == os.path.getsize(files["csv"]) and dest.read_bytes().startswith(b"name,age")
    n2 = direct_download("file://" + str(files["csv"]), str(tmp_path / "o2.bin"))
    assert n2 == n

    with pytest.raises(DatasetTooBig):
        direct_download(str(files["csv"]), str(tmp_path / "o3.bin"), size_limit=5)

    # proxy layout: <proxy>/download/<dataset_id>
    pdir = tmp_path / "proxyroot" / "download"
    pdir.mkdir(parents=True)
    (pdir / "ds1").write_bytes(files["csv"].read_bytes())
    n3 = proxy_download("ds1", str(tmp_path / "o4.bin"), "file://" + str(tmp_path / "proxyroot"))
    assert n3 == n

    with pytest.raises(MaterializeError, match="unsupported URL scheme"):
        direct_download("ftp://x/y", str(tmp_path / "o5.bin"))
    # http in a no-network sandbox: the path is real, the failure clean
    with pytest.raises(MaterializeError, match="download failed"):
        direct_download("http://127.0.0.1:1/none.csv", str(tmp_path / "o6.bin"))

    # composed S3 + S5..S11: download -> detect -> DataFrame
    df = materialize_to_dataframe(spark, str(files["tsv"]), str(tmp_path / "wk"))
    assert df.columns == ["name", "age"] and df.count() == 2


def test_keyset_pagination_walks_all_pages(spark, tmp_path):
    from datamart_spark.query.search import paginate

    df = spark.createDataFrame(
        [(i % 7, i) for i in range(100)], "grp int, seq int"
    )
    seen = []
    after = None
    while True:
        page = paginate(df, ["grp", "seq"], page_size=30, after=after).collect()
        if not page:
            break
        seen.extend((r["grp"], r["seq"]) for r in page)
        after = (page[-1]["grp"], page[-1]["seq"])
    assert seen == sorted(((i % 7, i) for i in range(100)))
    assert len(seen) == 100

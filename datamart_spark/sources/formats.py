"""Format auto-detection + converters-to-CSV (reference S5–S9, S11).

The reference normalizes EVERY dataset to CSV before profiling
(lib_core/datamart_core/materialize.py:87-116 "we always materialize
the CSV file"), with a magic-byte detection chain
(materialize.py:167-263: Excel, Excel97, Stata, SPSS, TSV sniff,
pivot check) and per-format converters registered as entry-point
plugins (lib_materialize/__init__.py:96-127, 232-326).

Spark-first mapping: detection stays a driver-side peek at the file
head (magic bytes are not distributable work); conversion lands in a
DataFrame — delimited files go straight to ``spark.read.csv`` with the
sniffed separator (no CSV round-trip needed), binary stat formats are
decoded via pandas on the driver (these formats are single-small-file
by construction in the reference; a >memory Stata file was never
supported there either).

Formats needing libraries absent from this sandbox (Excel → openpyxl/
xlrd, SPSS → pyreadstat) raise ``ConverterUnavailable`` with the exact
dependency, mirroring the multimodal codec-stub discipline — the
detection chain, registry and plumbing are real and tested.
"""

from __future__ import annotations

import csv
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# magic bytes per lib_core/datamart_core/materialize.py:167-216
_XLSX_MAGIC = b"PK\x03\x04"
_XLS_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_SPSS_MAGIC = (b"\xc1\xe2\xc3\xc9", b"$FL2", b"$FL3")
# Stata: XML header (≥117) or the binary version words the reference
# pins (materialize.py:195-199)
_STATA_XML = b"<stata_dta>"
_STATA_BIN = (
    b"\x73\x01\x01\x00", b"\x73\x02\x01\x00",
    b"\x72\x01\x01\x00", b"\x72\x02\x01\x00",
    b"\x71\x01\x01\x01", b"\x71\x02\x01\x01",
)
_PARQUET_MAGIC = b"PAR1"


class ConverterUnavailable(NotImplementedError):
    """Raised when a format's decoder library is not installed."""


def detect_format(path: str, peek_bytes: int = 4096) -> str:
    """S11 detection chain: magic bytes, then delimiter sniff.
    Returns one of excel/excel97/spss/stata/parquet/tsv/csv."""
    with open(path, "rb") as f:
        head = f.read(peek_bytes)
    if head.startswith(_XLSX_MAGIC):
        return "excel"
    if head.startswith(_XLS_MAGIC):
        return "excel97"
    if head.startswith(_SPSS_MAGIC):
        return "spss"
    if head[:11] == _STATA_XML or head[:4] in _STATA_BIN:
        return "stata"
    if head.startswith(_PARQUET_MAGIC):
        return "parquet"
    try:
        text = head.decode("utf-8", errors="replace")
        dialect = csv.Sniffer().sniff(text, delimiters=",\t;|")
        if dialect.delimiter != ",":
            return "tsv"
    except csv.Error:
        pass
    return "csv"


def sniff_delimiter(path: str, peek_bytes: int = 4096) -> str:
    """S7: csv.Sniffer over the file head (materialize.py:217-235)."""
    with open(path, "rb") as f:
        text = f.read(peek_bytes).decode("utf-8", errors="replace")
    try:
        return csv.Sniffer().sniff(text, delimiters=",\t;|").delimiter
    except csv.Error:
        return ","


def tsv_to_csv(src: str, dst: str) -> None:
    """S7 converter (lib_materialize/tsv.py:6-11) — rewrite with the
    sniffed delimiter normalized to comma."""
    sep = sniff_delimiter(src)
    with open(src, newline="") as fin, open(dst, "w", newline="") as fout:
        reader = csv.reader(fin, delimiter=sep)
        writer = csv.writer(fout)
        for row in reader:
            writer.writerow(row)


def stata_to_csv(src: str, dst: str) -> None:
    """S9 converter (lib_materialize/stata.py:6-17): chunked
    pandas.read_stata → CSV (pure pandas, no extra dependency)."""
    first = True
    with pd.read_stata(src, chunksize=10_000) as reader:
        for chunk in reader:
            chunk.to_csv(dst, mode="w" if first else "a", header=first, index=False)
            first = False


def excel_to_csv(src: str, dst: str) -> None:
    """S6 converter (lib_materialize/excel.py:8-31).  Requires openpyxl
    (xlsx) / xlrd (xls) — not present in this sandbox."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:
        raise ConverterUnavailable(
            "excel→csv needs openpyxl/xlrd (not installed); install one or "
            "convert upstream"
        ) from e
    pd.read_excel(src).to_csv(dst, index=False)


def spss_to_csv(src: str, dst: str) -> None:
    """S8 converter (lib_materialize/spss.py:6-13).  Requires pyreadstat."""
    try:
        import pyreadstat  # noqa: F401
    except ImportError as e:
        raise ConverterUnavailable(
            "spss→csv needs pyreadstat (not installed)"
        ) from e
    df, _ = pyreadstat.read_sav(src)
    df.to_csv(dst, index=False)


#: S5 plugin-registry analog (lib_materialize/__init__.py:96-127):
#: format name → CSV converter; extend by assignment, exactly like the
#: reference's entry-point groups.
CONVERTERS: dict[str, Callable[[str, str], None]] = {
    "tsv": tsv_to_csv,
    "stata": stata_to_csv,
    "excel": excel_to_csv,
    "excel97": excel_to_csv,
    "spss": spss_to_csv,
}


def read_auto(spark: SparkSession, path: str, all_string: bool = True) -> DataFrame:
    """S1/S11 entry: detect the format and land a DataFrame.  Delimited
    files skip the CSV round-trip (spark.read.csv with the sniffed
    separator — distributed scan); binary stat formats convert via the
    registry to a temp CSV first.  ``all_string=True`` mirrors the
    reference's everything-is-a-string ingest (lib_profiler
    core.py:210-217) so type inference stays in the profiler."""
    import tempfile

    fmt = detect_format(path)
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt in ("csv", "tsv"):
        sep = "," if fmt == "csv" else sniff_delimiter(path)
        return spark.read.csv(
            path, header=True, sep=sep,
            inferSchema=not all_string, enforceSchema=False,
        )
    conv = CONVERTERS[fmt]
    tmp = tempfile.mktemp(suffix=".csv", prefix=f"datamart_{fmt}_")
    conv(path, tmp)
    df = spark.read.csv(tmp, header=True, inferSchema=not all_string)
    # temp CSV is left for the executor scan; caller owns cleanup of
    # tempdir lifecycles (the reference caches converted CSVs the same
    # way, fscache.py:202-280)
    return df


def looks_pivoted(columns: list[str]) -> bool:
    """S10 trigger (lib_core/materialize.py:244-248, exact rule): a
    header of ≥3 columns where at most max(2, 20%·n) column names fail
    to parse as dates is a wide-pivoted table and should be melted
    (operators.discovery.unpivot_wide_years)."""
    import re

    datish = re.compile(r"^\s*\d{4}([-/ .]\d{1,2}([-/ .]\d{1,2})?)?\s*$")
    if len(columns) < 3:
        return False
    non_matches = sum(1 for c in columns if not datish.match(c))
    return non_matches <= max(2.0, 0.20 * len(columns))

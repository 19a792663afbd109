"""Output writers (reference S15): csv / pandas / d3m.

The reference's writers are entry-point plugins with an
open_file/set_metadata/finish protocol over streamed CSV bytes
(lib_materialize/datamart_materialize/__init__.py:140-224, d3m writer
d3m.py:25-101).  Spark-first, the protocol collapses to
``write(df) -> result``: the CSV writer is a distributed
``df.write.csv`` (coalesced on request), the pandas writer is
``toPandas()`` (driver materialization — the reference's pandas
format is driver-side by definition), and the D3M writer emits the
reference's dataset-directory layout:

    <dest>/datasetDoc.json
    <dest>/tables/learningData.csv

with the column metadata mapped through the same structural/semantic →
colType rules (d3m.py:44-66) and a synthesized d3mIndex when the table
lacks one (d3m.py:36-43, _D3mAddIndex).
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..profiler.types_infer import (
    SEM_BOOLEAN,
    SEM_DATETIME,
    SEM_ENUMERATION,
    TYPE_FLOAT,
    TYPE_INTEGER,
    TYPE_TEXT,
    ColumnProfile,
)

# structural type → D3M colType (reference d3m.py STRUCTURAL_TYPE_MAP)
_STRUCTURAL_TYPE_MAP = {
    TYPE_INTEGER: "integer",
    TYPE_FLOAT: "real",
    TYPE_TEXT: "string",
}


class CsvWriter:
    """Distributed single-table CSV output (reference CsvWriter)."""

    def __init__(self, destination: str, coalesce: int | None = 1):
        self.destination = destination
        self.coalesce = coalesce

    def write(self, df: DataFrame) -> None:
        out = df.coalesce(self.coalesce) if self.coalesce else df
        out.write.mode("overwrite").option("header", True).csv(self.destination)


class PandasWriter:
    """Driver-side pandas materialization (reference PandasWriter)."""

    def __init__(self, destination=None):
        if destination is not None:
            raise ValueError("Pandas format expects destination=None")

    def write(self, df: DataFrame) -> pd.DataFrame:
        return df.toPandas()


def _col_type(p: ColumnProfile) -> str:
    # d3m.py:44-60 mapping order: boolean, categorical, dateTime, structural
    if SEM_BOOLEAN in p.semantic_types:
        return "boolean"
    if SEM_ENUMERATION in p.semantic_types:
        return "categorical"
    if p.structural_type == TYPE_TEXT and SEM_DATETIME in p.semantic_types:
        return "dateTime"
    return _STRUCTURAL_TYPE_MAP.get(p.structural_type, "string")


def d3m_metadata(
    dataset_id: str,
    profiles: list[ColumnProfile],
    version: str = "4.0.0",
    name: str | None = None,
    need_d3mindex: bool = False,
) -> dict:
    """datasetDoc.json content (reference d3m.py:25-101)."""
    if version not in ("3.2.0", "4.0.0"):
        raise ValueError(f"Unknown D3M schema version {version!r}")
    cols = list(profiles)
    if need_d3mindex and not any(p.name == "d3mIndex" for p in cols):
        idx = ColumnProfile(name="d3mIndex", structural_type=TYPE_INTEGER)
        cols = [idx] + cols
    d3m_columns = [
        {
            "colIndex": i,
            "colName": p.name,
            "colType": _col_type(p),
            "role": ["index"] if p.name == "d3mIndex" else ["attribute"],
        }
        for i, p in enumerate(cols)
    ]
    return {
        "about": {
            "datasetID": dataset_id,
            "datasetName": name or dataset_id,
            "license": "unknown",
            "datasetSchemaVersion": version,
            "redacted": False,
            "datasetVersion": "1.0",
        },
        "dataResources": [
            {
                "resID": "learningData",
                "resPath": "tables/learningData.csv",
                "resType": "table",
                "resFormat": {"text/csv": ["csv"]} if version == "4.0.0"
                else ["text/csv"],
                "isCollection": False,
                "columns": d3m_columns,
            }
        ],
    }


class D3mWriter:
    """D3M dataset-directory writer (reference d3m.py)."""

    def __init__(self, dataset_id: str, destination: str, version: str = "4.0.0"):
        self.dataset_id = dataset_id
        self.destination = destination
        self.version = version

    def write(self, df: DataFrame, profiles: list[ColumnProfile] | None = None) -> str:
        from ..profiler.types_infer import profile_dataframe

        need_index = "d3mIndex" not in df.columns
        if need_index:
            # _D3mAddIndex analog: sequential row ids prepended
            from pyspark.sql.window import Window

            df = df.withColumn(
                "d3mIndex",
                F.row_number().over(
                    Window.orderBy(F.monotonically_increasing_id())
                ) - 1,
            ).select("d3mIndex", *[c for c in df.columns])
        if profiles is None:
            profiles = profile_dataframe(
                df.drop("d3mIndex"), compute_ranges=False
            )
        meta = d3m_metadata(
            self.dataset_id, profiles, version=self.version,
            need_d3mindex=True,
        )
        os.makedirs(self.destination, exist_ok=True)
        with open(os.path.join(self.destination, "datasetDoc.json"), "w") as f:
            json.dump(meta, f, indent=2)
        tables = os.path.join(self.destination, "tables")
        # learningData.csv as ONE file (D3M layout requires the exact path)
        pdf = df.toPandas()
        os.makedirs(tables, exist_ok=True)
        pdf.to_csv(os.path.join(tables, "learningData.csv"), index=False)
        return self.destination


def get_writer(fmt: str):
    """Writer registry (reference entry-point group analog)."""
    return {"csv": CsvWriter, "pandas": PandasWriter, "d3m": D3mWriter}[fmt]

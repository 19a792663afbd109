"""Attribute-keyword expansion — port of the reference's column-name
word splitting (lib_profiler/datamart_profiler/core.py:76-97,
expand_attribute_name), used to enrich the searchable keyword set for
every dataset (core.py:684-691).

Splits on case boundaries, digit runs, and punctuation:
  "baseDate7days" → ["baseDate7days", "base", "Date", "7", "days"]
The original name is kept first; parts are deduplicated preserving
order (search indexes both the raw name and its parts).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

_SPLIT_RE = re.compile(
    r"[0-9]+|[A-Z]+(?![a-z])|[A-Z][a-z]*|[a-z]+"
)


def expand_attribute_name(name: str) -> list[str]:
    if not name:
        return []
    parts = _SPLIT_RE.findall(name)
    out: dict[str, None] = {name: None}
    for p in parts:
        out.setdefault(p, None)
    return list(out)


def attribute_keywords(df: DataFrame) -> list[str]:
    """Keyword set for a DataFrame's schema (order-stable, deduped)."""
    out: dict[str, None] = {}
    for c in df.columns:
        for w in expand_attribute_name(c):
            out.setdefault(w, None)
    return list(out)


# Spark-side variant for bulk metadata tables (one row per column name)
_SQL_SPLIT = r"(?<=[a-z])(?=[A-Z])|(?<=[A-Za-z])(?=[0-9])|(?<=[0-9])(?=[A-Za-z])|[^0-9A-Za-z]+"


def expand_names_df(names: DataFrame, name_col: str = "name") -> DataFrame:
    """names(name) → (name, keyword) exploded, JVM-side regex split."""
    return names.select(
        name_col,
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col(name_col)),
                    F.filter(
                        F.split(F.col(name_col), _SQL_SPLIT), lambda x: x != F.lit("")
                    ),
                )
            )
        ).alias("keyword"),
    )

"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` come from ``datamart_spark.suite`` —
every entry pairs a Spark DataFrame program with a DuckDB-runnable
ANSI-SQL oracle sharing exact semantics (simple analyzer, identical
float expression shapes, round(…,4) before ordering).

The full engine (stemming analyzer, varbyte posting index, block-max
kernel) is exercised by ``python -m pytest tests/ -x -q``; the entries
here are the oracle-checkable surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 two-term AND
    keyword search over `documents` (the reference's core query,
    apiserver/apiserver/search/__init__.py:55-77)."""
    from datamart_spark.suite.fulltext import bm25_direct

    return bm25_direct(spark, "/root/testdata/sf0.001", ["spark", "join"], k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from datamart_spark.suite import REGISTRY

    return dict(REGISTRY)


def oracle_sql() -> dict[str, str]:
    from datamart_spark.suite import ORACLE

    return dict(ORACLE)

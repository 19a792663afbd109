"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` come from ``datamart_spark.suite`` —
every entry pairs a Spark DataFrame program with a DuckDB-runnable
ANSI-SQL oracle sharing exact semantics (simple analyzer, identical
float expression shapes, round(…,4) before ordering).

The real engine (varbyte posting index + block-max DAAT
kernel) is on the oracle surface too: the ``bm25_indexed_*`` entries
build a catalog over the sf dir and answer through
``query.wand.bm25_topk_blockmax``.  The stemming analyzer variant is
gated by ``python -m pytest tests/ -x -q`` rank-identity tests (DuckDB
cannot stem).
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
    apiserver/apiserver/search/__init__.py:55-77), answered by the REAL
    engine — varbyte/block-max index + cogrouped DAAT kernel."""
    from datamart_spark.suite.fulltext import _indexed_topk

    return _indexed_topk(spark, "/root/testdata/sf0.001", ["spark", "join"], k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from datamart_spark.suite import REGISTRY

    return dict(REGISTRY)


def oracle_sql() -> dict[str, str]:
    from datamart_spark.suite import ORACLE

    return dict(ORACLE)

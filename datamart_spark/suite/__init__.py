"""Driver-facing query suite: every entry pairs a Spark DataFrame
program with an ANSI-SQL oracle that DuckDB runs on the same parquet
tables (see __spark_entry__.py contract).

Both sides share exact semantics: the SIMPLE analyzer (lowercase +
``\\W+`` split, no stemming — DuckDB cannot stem; the full stemming
analyzer is gated by pytest rank-identity tests instead), identical
float expression shapes, and round(…, 4) on computed doubles before
ordering so rank and hash agree bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


from . import fulltext  # noqa: E402,F401
from . import textfns  # noqa: E402,F401
from . import vectors  # noqa: E402,F401
from . import star  # noqa: E402,F401
from . import spatial  # noqa: E402,F401

"""Custom stateful streaming operator: per-url recrawl tracking.

The reference's profiler re-processes a dataset every time its id
arrives on the AMQP queue and keeps per-dataset bookkeeping in
Elasticsearch (delete-then-reinsert + version counters,
profiler/profiler.py:229-303).  The Spark-native analog of that
"how many times have I seen this key, and when" bookkeeping is an
``applyInPandasWithState`` operator (north-rule streaming surface):
arbitrary per-key state, Arrow-batched, checkpointed exactly-once —
state survives across ``availableNow`` drains, so a re-crawled url's
counter keeps increasing run over run without ever re-reading the
corpus (the ingest-side ``left_anti`` dedup needs a corpus scan per
batch; this is O(state) instead).

Scale: state is (url → 3 small scalars), hash-partitioned across
executors by the groupBy — 10^12 urls spread over the cluster's state
store exactly like any streaming aggregation; nothing collects.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, types as T

from ..corpus import DOCUMENTS_SCHEMA

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("n_crawls", T.LongType(), False),
        T.StructField("first_seen", T.TimestampType(), True),
        T.StructField("last_seen", T.TimestampType(), True),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("first_seen", T.TimestampType(), True),
        T.StructField("last_seen", T.TimestampType(), True),
    ]
)


def _update_url_state(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    (url,) = key
    n, first, last = (state.get if state.exists else (0, None, None))
    for pdf in pdfs:
        n += len(pdf)
        ts = pdf["warc_ts"].dropna()
        if len(ts):
            lo, hi = ts.min(), ts.max()
            first = lo if first is None or lo < first else first
            last = hi if last is None or hi > last else last
    state.update((n, first, last))
    yield pd.DataFrame(
        {"url": [url], "n_crawls": [n], "first_seen": [first], "last_seen": [last]}
    )


def track_recrawls(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain new pages from ``landing_dir`` (availableNow), maintain a
    per-url (count, first_seen, last_seen) state across drains, and
    append the updated rows to ``out_dir``.  Latest row per url =
    current crawl bookkeeping (see ``latest_crawl_state``)."""
    stream = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(landing_dir)
    updated = stream.groupBy("url").applyInPandasWithState(
        _update_url_state,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    q = (
        updated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def latest_crawl_state(spark: SparkSession, out_dir: str) -> DataFrame:
    """One row per url: the most recent state emission (highest
    n_crawls — the counter is monotone per url)."""
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("url").orderBy(F.desc("n_crawls"))
    return (
        spark.read.parquet(out_dir)
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .drop("__rk")
    )

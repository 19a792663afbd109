"""Incremental corpus ingest — Structured Streaming, availableNow.

The reference's "streaming" is a RabbitMQ work queue: discovery plugins
publish dataset ids to the `profile` exchange, profiler containers
consume, profile, and (re)index (lib_core/datamart_core/discovery.py:
47-76, profiler/profiler.py:194-253; incremental indexing =
delete-then-reinsert per dataset, profiler.py:286-297).  There are no
event-time windows or watermarks to port — the Spark-native analog is:

- a file-source stream over the landing directory of crawled pages,
- Trigger.AvailableNow: drain everything new, then stop (resumable
  batch — the same snapshot-checkpoint model as the index build),
- exactly-once via the streaming checkpoint + append sink,
- "late data" analog: a re-crawled url replaces its prior row at query
  time via last-snapshot-wins (url, max ingest_batch) — MERGE INTO on
  Iceberg in production.

After ingest, the inverted index catches up with ``build_index(…,
resume=True)`` over the new doc-range shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..corpus import DOCUMENTS_SCHEMA


def incremental_ingest(
    spark: SparkSession,
    landing_dir: str,
    dest_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain new parquet files from ``landing_dir`` into the corpus
    table at ``dest_dir`` (append, exactly-once) and stop."""
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .parquet(landing_dir)
        .withColumn("ingest_time", F.current_timestamp())
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", dest_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def latest_per_url(corpus: DataFrame) -> DataFrame:
    """Deduplicate re-crawled pages: keep the row with the newest
    ingest_time per url (ties broken by doc_id desc) — the reference's
    delete-then-reinsert semantics expressed as a window."""
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy(
        F.desc("ingest_time"), F.desc("doc_id")
    )
    return (
        corpus.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .drop("__rk")
    )

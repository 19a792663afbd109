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


def assign_doc_ids(new_docs: DataFrame, start: int) -> DataFrame:
    """Assign contiguous doc_ids ``start, start+1, ...`` to newly
    ingested pages (deterministic: ordered by url).  Contiguity matters
    because the index shards by doc-range (``doc_id // width``) — sparse
    ids would leave shards underfilled.  The global sort is over the
    DELTA only (one ingest batch), never the whole corpus; at 10^12-doc
    scale an ingest batch is bounded by the trigger interval."""
    from pyspark.sql import Window

    w = Window.orderBy("url")
    return new_docs.withColumn(
        "doc_id", F.row_number().over(w).cast("long") + F.lit(start - 1)
    )


def ingest_and_index(
    spark: SparkSession,
    landing_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    catalog,
) -> dict:
    """The full incremental flow the reference runs per dataset message
    (profiler/profiler.py:229-303: consume → profile → reindex), as one
    resumable batch: drain new pages (exactly-once), assign doc_ids
    beyond the committed range, append to the corpus table, and let the
    grown-corpus resume path rebuild exactly the delta + boundary
    shard.  Returns the new snapshot."""
    from ..index import build_index

    incremental_ingest(spark, landing_dir, corpus_dir + "_raw", checkpoint_dir)
    raw = spark.read.parquet(corpus_dir + "_raw")

    import os

    # New ids start at the doc-id HIGH-WATER MARK, never at n_docs:
    # delete_docs shrinks n_docs while surviving ids stay sparse, and a
    # crash between the corpus append and the first snapshot commit
    # leaves docs in the corpus with no snapshot — either way, allocating
    # from n_docs would collide with existing documents and silently
    # merge two documents under one id (ADVICE r2).  The snapshot's
    # next_doc_id is authoritative; with no snapshot, the corpus itself
    # is (one max() agg over the delta-free corpus table).
    snap = catalog.current_snapshot()
    start = snap.get("next_doc_id", snap["n_docs"]) if snap else 0
    if os.path.isdir(corpus_dir):
        # the corpus can be AHEAD of the snapshot (crash after a prior
        # append, before its index build committed) — those rows hold
        # ids too, so take the max of both sources
        hwm = spark.read.parquet(corpus_dir).agg(F.max("doc_id")).collect()[0][0]
        if hwm is not None:
            start = max(start, int(hwm) + 1)

    if os.path.isdir(corpus_dir):
        corpus = spark.read.parquet(corpus_dir)
        known = corpus.select("url")
        fresh = raw.join(known, "url", "left_anti")
    else:
        corpus = None
        fresh = raw
    fresh = latest_per_url(
        fresh.withColumn("doc_id", F.lit(0).cast("long"))
        if "doc_id" not in fresh.columns else fresh
    ).drop("ingest_time")
    delta = assign_doc_ids(fresh.drop("doc_id"), start)
    delta.select(*(corpus.columns if corpus is not None else delta.columns)) \
        .write.mode("append").parquet(corpus_dir)

    docs = spark.read.parquet(corpus_dir)
    return build_index(docs, catalog, resume=True)

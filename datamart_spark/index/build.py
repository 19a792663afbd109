"""Inverted-index build: documents → doc_stats / term_stats / postings.

Reference semantics: the reference ships every dataset's text fields to
Elasticsearch which builds the inverted index internally (reference:
lib_core/datamart_core/common.py:209-225 → ES; analyzer
coordinator/coordinator/elasticsearch.yml:2-20).  Here the build is an
explicit Spark job designed for 10^12 docs:

Shuffle plan (exactly two wide exchanges over token-scale data):
  1. mapInPandas analysis emits per-doc *aggregated* (term, tf) pairs —
     map-side combine inside the Arrow batch, so the shuffle carries
     distinct-terms-per-doc rows, not raw tokens.
  2. repartition by (term, shard) → applyInPandas encodes posting
     blocks.  ``shard = doc_id * S / n_docs`` is simultaneously
     (a) the *salt* that splits stopword-scale terms across S reducers
     (north rule skew handling: "the" never lands on one task), and
     (b) contiguous doc ranges, so at query time every term's postings
     for a doc range are co-located → document-at-a-time block-max
     WAND per shard with local top-k + tiny global merge (the same
     document-partitioned query layout Elasticsearch itself scales
     with).

doc_stats / term_stats are groupBy aggregations (partial aggregation is
automatic).  Posting blocks: 128 entries, docID delta + varbyte, block
max of the BM25 tf-normalization term (block-max WAND metadata).

At 100 TB: the only driver-side values are N, avgdl and the high-df
term list — O(1) and O(#stopwords).  Nothing collects posting data.
"""

from __future__ import annotations

import time
from collections import Counter
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..analyzer import analyze_series, extract_text_series
from .catalog import IndexCatalog
from .varbyte import vb_encode, delta_encode

K1 = 1.2
B = 0.75
BLOCK_SIZE = 128

_TD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("doclen", T.IntegerType(), False),
    ]
)

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("first_doc_id", T.LongType(), False),
        T.StructField("last_doc_id", T.LongType(), False),
        T.StructField("max_tfn", T.FloatType(), False),
        T.StructField("doc_ids_vb", T.BinaryType(), False),
        T.StructField("tfs_vb", T.BinaryType(), False),
    ]
)


def extract_text(docs: DataFrame, html_col: str = "html", out_col: str = "text") -> DataFrame:
    """html(binary) → text via the vendored html_strip analog (Arrow batch)."""
    @F.pandas_udf(T.StringType())
    def _extract(h: pd.Series) -> pd.Series:
        return extract_text_series(h)

    return docs.withColumn(out_col, _extract(F.col(html_col)))


def term_doc_tf(docs: DataFrame, text_col: str = "text", stemming: bool = True) -> DataFrame:
    """documents → (doc_id, term, tf, doclen); tf aggregated inside the
    Arrow batch (map-side combine before any shuffle)."""

    def analyze_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            toks = analyze_series(b[text_col], stemming=stemming)
            doc_ids: list[int] = []
            terms: list[str] = []
            tfs: list[int] = []
            doclens: list[int] = []
            for doc_id, ts in zip(b["doc_id"], toks):
                ts = ts or []
                c = Counter(ts)
                dl = len(ts)
                for t, n in c.items():
                    doc_ids.append(doc_id)
                    terms.append(t)
                    tfs.append(n)
                    doclens.append(dl)
            yield pd.DataFrame(
                {"doc_id": doc_ids, "term": terms, "tf": tfs, "doclen": doclens}
            )

    return docs.select("doc_id", text_col).mapInPandas(analyze_batches, schema=_TD_SCHEMA)


def _shard_expr(n_docs: int, n_shards: int):
    """Contiguous doc-range shard: monotone in doc_id (block-max WAND
    scans shards independently)."""
    width = max(1, (n_docs + n_shards - 1) // n_shards)
    return F.least(F.lit(n_shards - 1), (F.col("doc_id") / width).cast("int"))


def default_n_shards(n_docs: int, docs_per_shard: int = 250_000) -> int:
    """Doc-range shard sizing: bounded per-shard state for the query
    kernel (doclen arrays, candidate sets) and the salt granularity for
    stopword terms.  ~250k docs/shard ⇒ 4M shards at 10^12 docs — each
    an independent task; at test scale a handful of shards, so posting
    blocks stay full (fragmenting every term across O(cores) shards was
    measured 5× slower at 20k docs)."""
    return max(8, (n_docs + docs_per_shard - 1) // docs_per_shard)


def build_index(
    docs: DataFrame,
    catalog: IndexCatalog,
    n_shards: int | None = None,
    stemming: bool = True,
    resume: bool = True,
) -> dict:
    """Full build.  Returns the committed snapshot manifest.

    Resumable: shards already present in the current snapshot are
    skipped; only missing shards are (re)built and appended.

    One analysis pass: the tokenized (doc_id, term, tf, doclen) set is
    persisted (memory-and-disk) and feeds doc_stats, term_stats and the
    posting encode — without this the corpus is re-analyzed per output
    table (measured 3× build cost).
    """
    from pyspark import StorageLevel

    spark = docs.sparkSession
    t0 = time.time()

    cols = docs.columns
    if "doc_id" not in cols:
        raise ValueError("documents must carry doc_id (assign before build)")

    n_docs = docs.count()
    snap = catalog.current_snapshot() if resume else None
    if snap:  # shard mapping must stay fixed across resumed builds
        n_shards = snap["n_shards"]
    elif n_shards is None:
        n_shards = default_n_shards(n_docs)
    shard = _shard_expr(n_docs, n_shards)

    tdf = term_doc_tf(docs, stemming=stemming).persist(StorageLevel.MEMORY_AND_DISK)

    done = catalog.committed_shards() if resume else set()
    todo = sorted(set(range(n_shards)) - done)

    if not resume or not done:
        # doc_stats: one shuffle on doc_id over distinct-term rows
        meta_cols = [c for c in ("url", "lang", "warc_ts") if c in cols]
        doc_stats = tdf.groupBy("doc_id").agg(F.first("doclen").alias("doclen"))
        if meta_cols:
            doc_stats = doc_stats.join(
                docs.select("doc_id", *meta_cols), "doc_id", "right"
            ).na.fill({"doclen": 0})
        catalog.write(doc_stats.withColumn("shard", shard), "doc_stats",
                      partition_by=["shard"])
        term_stats = tdf.groupBy("term").agg(
            F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
        )
        catalog.write(term_stats, "term_stats")

    stats = catalog.read(spark, "doc_stats").agg(
        F.avg("doclen").alias("avgdl")
    ).collect()[0]
    avgdl = float(stats["avgdl"] or 0.0)

    if todo:
        tdf_sharded = tdf.withColumn("shard", shard)
        if len(todo) < n_shards:
            tdf_sharded = tdf_sharded.where(F.col("shard").isin(todo))

        def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
            return _encode_blocks(pdf, avgdl)

        postings = (
            tdf_sharded.repartition(
                max(n_shards, spark.sparkContext.defaultParallelism), "term", "shard"
            )
            .groupBy("term", "shard")
            .applyInPandas(encode_group, schema=POSTINGS_SCHEMA)
        )
        mode = "append" if (resume and done and catalog.exists("postings")) else "overwrite"
        catalog.write(postings, "postings", partition_by=["shard"], mode=mode)
    tdf.unpersist()

    # lineage + metrics per shard (north rule)
    pst = catalog.read(spark, "postings")
    per_shard = {
        str(r["shard"]): {"blocks": r["blocks"], "postings": r["postings"]}
        for r in pst.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("blocks"), F.sum("n").alias("postings"))
        .collect()
    }
    elapsed = time.time() - t0
    manifest = {
        "n_docs": n_docs,
        "n_shards": n_shards,
        "avgdl": avgdl,
        "stemming": stemming,
        "shards": per_shard,
        "built_shards_this_run": todo,
        "build_seconds": elapsed,
        "docs_per_sec": (n_docs / elapsed) if elapsed > 0 else None,
        "source": "documents",
    }
    catalog.commit_snapshot(manifest)
    return catalog.current_snapshot()


def _encode_blocks(pdf: pd.DataFrame, avgdl: float) -> pd.DataFrame:
    """One (term, shard) group → fixed-size varbyte blocks + block-max."""
    order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
    doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.uint64)
    tfs = pdf["tf"].to_numpy()[order].astype(np.uint64)
    dls = pdf["doclen"].to_numpy()[order].astype(np.float64)
    term = pdf["term"].iat[0]
    shard = int(pdf["shard"].iat[0])

    tfn = tfs / (tfs + K1 * (1.0 - B + B * dls / avgdl))

    rows = []
    nb = (len(doc_ids) + BLOCK_SIZE - 1) // BLOCK_SIZE
    for bi in range(nb):
        lo, hi = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, len(doc_ids))
        d, t = doc_ids[lo:hi], tfs[lo:hi]
        rows.append(
            {
                "term": term,
                "shard": shard,
                "block_id": bi,
                "n": hi - lo,
                "first_doc_id": int(d[0]),
                "last_doc_id": int(d[-1]),
                "max_tfn": float(tfn[lo:hi].max()),
                "doc_ids_vb": vb_encode(delta_encode(d)),
                "tfs_vb": vb_encode(t),
            }
        )
    return pd.DataFrame(rows, columns=[f.name for f in POSTINGS_SCHEMA.fields])

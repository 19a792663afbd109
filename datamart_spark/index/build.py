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
        from ..porter2 import stem

        stem_cache: dict[str, str] = {}
        for b in batches:
            toks = analyze_series(b[text_col], stemming=False)  # stem below, per unique
            toks = toks.map(lambda ts: ts if ts is not None else [])
            lens = toks.map(len).to_numpy(dtype=np.int64)
            if lens.sum() == 0:
                yield pd.DataFrame({"doc_id": [], "term": [], "tf": [], "doclen": []})
                continue
            flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
            # stem once per UNIQUE surface token (vocab ≪ token count),
            # then refactorize on the STEM so forms that collapse to one
            # stem ("runs","running"→"run") merge into a single tf
            uniq, inv = np.unique(flat, return_inverse=True)
            if stemming:
                for u in uniq:
                    if u not in stem_cache:
                        stem_cache[u] = stem(u)
                surf_stems = np.array([stem_cache[u] for u in uniq], dtype=object)
            else:
                surf_stems = uniq
            stems, stem_of_surf = np.unique(surf_stems, return_inverse=True)
            token_stem = stem_of_surf[inv]
            # integer-factorized (doc, stem) pair counting — all C-level
            doc_idx = np.repeat(np.arange(len(b), dtype=np.int64), lens)
            n_terms = len(stems)
            pair_codes = doc_idx * n_terms + token_stem
            pair_uniq, pair_counts = np.unique(pair_codes, return_counts=True)
            out_doc_idx = pair_uniq // n_terms
            out_term_idx = pair_uniq % n_terms
            stemmed = stems
            doc_ids = b["doc_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids[out_doc_idx],
                    "term": stemmed[out_term_idx],
                    "tf": pair_counts.astype(np.int32),
                    "doclen": lens[out_doc_idx].astype(np.int32),
                }
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

    phases: dict[str, float] = {}
    t_phase = time.time()

    def mark(name: str) -> None:
        nonlocal t_phase
        phases[name] = round(time.time() - t_phase, 3)
        t_phase = time.time()

    n_docs = docs.count()
    mark("count")
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
        mark("analyze_and_doc_stats")
        term_stats = tdf.groupBy("term").agg(
            F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
        )
        catalog.write(term_stats, "term_stats")
        mark("term_stats")

    stats = catalog.read(spark, "doc_stats").agg(
        F.avg("doclen").alias("avgdl")
    ).collect()[0]
    avgdl = float(stats["avgdl"] or 0.0)
    mark("avgdl")

    if todo:
        tdf_sharded = tdf.withColumn("shard", shard)
        if len(todo) < n_shards:
            tdf_sharded = tdf_sharded.where(F.col("shard").isin(todo))

        def encode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            parts = list(batches)
            if not parts:
                return
            pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
            yield _encode_partition_blocks(pdf, avgdl)

        # hash-repartition on (term, shard): every group lands whole in
        # one partition; the encoder processes the partition vectorized
        # (one mapInPandas call), avoiding per-group applyInPandas
        # overhead — measured 40k pandas slices ≈ the whole encode cost
        postings = (
            tdf_sharded.repartition(
                max(n_shards, 2 * spark.sparkContext.defaultParallelism), "term", "shard"
            )
            .mapInPandas(encode_partition, schema=POSTINGS_SCHEMA)
        )
        mode = "append" if (resume and done and catalog.exists("postings")) else "overwrite"
        catalog.write(postings, "postings", partition_by=["shard"], mode=mode)
        mark("postings")
    tdf.unpersist()

    # lineage + metrics per shard (north rule)
    pst = catalog.read(spark, "postings")
    per_shard = {
        str(r["shard"]): {"blocks": r["blocks"], "postings": r["postings"]}
        for r in pst.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("blocks"), F.sum("n").alias("postings"))
        .collect()
    }
    mark("metrics")
    elapsed = time.time() - t0
    manifest = {
        "phase_seconds": phases,
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


def _encode_partition_blocks(pdf: pd.DataFrame, avgdl: float) -> pd.DataFrame:
    """Encode ALL (term, shard) groups in one partition, vectorized:
    one lexsort, group boundaries via np.unique, then per-block varbyte
    encode (each encode call itself vectorized over the block)."""
    terms = pdf["term"].to_numpy()
    shards = pdf["shard"].to_numpy().astype(np.int64)
    doc_ids = pdf["doc_id"].to_numpy().astype(np.uint64)
    tfs = pdf["tf"].to_numpy().astype(np.uint64)
    dls = pdf["doclen"].to_numpy().astype(np.float64)

    order = np.lexsort((doc_ids, shards, terms))
    terms, shards, doc_ids, tfs, dls = (
        terms[order], shards[order], doc_ids[order], tfs[order], dls[order]
    )
    tfn = tfs / (tfs + K1 * (1.0 - B + B * dls / avgdl))

    # group boundaries over the (term, shard) key
    key_change = np.empty(len(terms), dtype=bool)
    key_change[0] = True
    key_change[1:] = (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])
    starts = np.flatnonzero(key_change)
    ends = np.append(starts[1:], len(terms))

    out = {name: [] for name in
           ("term", "shard", "block_id", "n", "first_doc_id",
            "last_doc_id", "max_tfn", "doc_ids_vb", "tfs_vb")}
    for g0, g1 in zip(starts, ends):
        term = terms[g0]
        shard_v = int(shards[g0])
        for bi, lo in enumerate(range(g0, g1, BLOCK_SIZE)):
            hi = min(lo + BLOCK_SIZE, g1)
            d = doc_ids[lo:hi]
            out["term"].append(term)
            out["shard"].append(shard_v)
            out["block_id"].append(bi)
            out["n"].append(hi - lo)
            out["first_doc_id"].append(int(d[0]))
            out["last_doc_id"].append(int(d[-1]))
            out["max_tfn"].append(float(tfn[lo:hi].max()))
            out["doc_ids_vb"].append(vb_encode(delta_encode(d)))
            out["tfs_vb"].append(vb_encode(tfs[lo:hi]))
    return pd.DataFrame(out)


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

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
from .varbyte import vb_encode_with_sizes

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


def term_doc_tf(
    docs: DataFrame,
    text_col: str = "text",
    stemming: bool = True,
    title_boost: int | None = None,
) -> DataFrame:
    """documents → (doc_id, term, tf, doclen); tf aggregated inside the
    Arrow batch (map-side combine before any shuffle).

    ``title_boost``: BM25F-style field boost — the reference queries
    `multi_match` with `id^10` (apiserver/apiserver/search/__init__.py:
    65-77); the analog here treats the document's first line (the page
    title in the corpus layout) as a boosted field via weighted field
    concatenation: tf' = tf_body + boost·tf_title, doclen' likewise.
    Integer boost keeps tf varbyte-encodable; rank identity is defined
    against the same formula in the oracle."""

    def analyze_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..porter2 import stem

        stem_cache: dict[str, str] = {}
        for b in batches:
            if title_boost is None:
                toks = analyze_series(b[text_col], stemming=False)
                toks = toks.map(lambda ts: ts if ts is not None else [])
                weights_per_doc = None
            else:
                split = b[text_col].fillna("").str.split("\n", n=1)
                titles = split.map(lambda p: p[0] if p else "")
                bodies = split.map(lambda p: p[1] if p and len(p) > 1 else "")
                t_toks = analyze_series(titles, stemming=False).map(
                    lambda ts: ts if ts is not None else []
                )
                b_toks = analyze_series(bodies, stemming=False).map(
                    lambda ts: ts if ts is not None else []
                )
                toks = t_toks.combine(b_toks, lambda a, c: a + c)
                weights_per_doc = [
                    np.concatenate(
                        [
                            np.full(len(a), title_boost, dtype=np.int64),
                            np.ones(len(c), dtype=np.int64),
                        ]
                    )
                    for a, c in zip(t_toks, b_toks)
                ]
            lens = toks.map(len).to_numpy(dtype=np.int64)
            if lens.sum() == 0:
                yield pd.DataFrame({"doc_id": [], "term": [], "tf": [], "doclen": []})
                continue
            flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
            # hash-factorize (pd.factorize is O(n); sort-based np.unique
            # over object strings was the profile's hot spot), stem once
            # per UNIQUE surface token, then refactorize on the STEM so
            # forms that collapse to one stem ("runs","running"→"run")
            # merge into a single tf
            inv, uniq = pd.factorize(flat, sort=False)
            if stemming:
                for u in uniq:
                    if u not in stem_cache:
                        stem_cache[u] = stem(u)
                surf_stems = np.array([stem_cache[u] for u in uniq], dtype=object)
            else:
                surf_stems = np.asarray(uniq, dtype=object)
            stem_of_surf, stems = pd.factorize(surf_stems, sort=False)
            stems = np.asarray(stems, dtype=object)
            token_stem = stem_of_surf[inv]
            # integer-factorized (doc, stem) pair counting — all C-level
            doc_idx = np.repeat(np.arange(len(b), dtype=np.int64), lens)
            n_terms = len(stems)
            pair_codes = doc_idx * n_terms + token_stem
            if weights_per_doc is None:
                pair_uniq, pair_counts = np.unique(pair_codes, return_counts=True)
                doclens = lens
            else:
                w = np.concatenate(weights_per_doc)
                pair_uniq, pair_inv = np.unique(pair_codes, return_inverse=True)
                pair_counts = np.zeros(pair_uniq.size, dtype=np.int64)
                np.add.at(pair_counts, pair_inv, w)
                doclens = np.array(
                    [int(ws.sum()) for ws in weights_per_doc], dtype=np.int64
                )
            out_doc_idx = pair_uniq // n_terms
            out_term_idx = pair_uniq % n_terms
            doc_ids = b["doc_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids[out_doc_idx],
                    "term": stems[out_term_idx],
                    "tf": pair_counts.astype(np.int32),
                    "doclen": doclens[out_doc_idx].astype(np.int32),
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
    n_docs: int | None = None,
    only_shards: list[int] | None = None,
    title_boost: int | None = None,
) -> dict:
    """Full build.  Returns the committed snapshot manifest.

    Resumable: shards already present in the current snapshot are
    skipped; only missing shards are (re)built and appended.

    One analysis pass: the tokenized (doc_id, term, tf, doclen) set is
    materialized as the catalog's ``tokens`` table and feeds doc_stats,
    term_stats and the posting encode.  A table (not ``persist()``)
    because (a) at 10^12 docs the intermediate exceeds any storage
    memory — columnar-compressed parquet is the only stable home, and
    (b) it doubles as the analysis checkpoint: a resumed build whose
    snapshot already committed tokens skips re-analysis entirely.
    (An 8g-heap persist() of this set caused GC/eviction chaos: phase
    times swung 2-3× run to run.  NOTES_SCALING.md.)
    """
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

    if n_docs is None:
        n_docs = docs.count()
    mark("count")
    snap = catalog.current_snapshot() if resume else None
    if snap:  # shard mapping must stay fixed across resumed builds
        n_shards = snap["n_shards"]
    elif n_shards is None:
        n_shards = default_n_shards(n_docs)
    shard = _shard_expr(n_docs, n_shards)

    done = catalog.committed_shards() if resume else set()
    todo = set(range(n_shards)) - done
    if only_shards is not None:  # bounded incremental run (checkpointed)
        todo &= set(only_shards)
    todo = sorted(todo)
    fresh = not resume or not done

    if fresh or not catalog.exists("tokens"):
        # narrow map job: analyze + write the tokenized table (no shuffle)
        catalog.write(
            term_doc_tf(docs, stemming=stemming, title_boost=title_boost), "tokens"
        )
        mark("analyze_tokens")
    tdf = catalog.read(spark, "tokens")

    # avgdl = total tokens / total docs — one cheap agg over the tokens
    # table (bit-identical to averaging per-doc doclen incl. empty docs)
    tok_sum = tdf.agg(F.sum("tf").alias("s")).collect()[0]["s"]
    avgdl = float(tok_sum or 0) / n_docs if n_docs else 0.0
    mark("avgdl")

    # doc_stats / term_stats / postings all read the tokens table and
    # are independent — submit them as concurrent Spark jobs (threads):
    # the scheduler interleaves their tasks, filling cores a single
    # stage's tail would leave idle
    stat_jobs = []
    if fresh:
        def _write_doc_stats() -> None:
            meta_cols = [c for c in ("url", "lang", "warc_ts") if c in cols]
            doc_stats = tdf.groupBy("doc_id").agg(F.first("doclen").alias("doclen"))
            if meta_cols:
                doc_stats = doc_stats.join(
                    docs.select("doc_id", *meta_cols), "doc_id", "right"
                ).na.fill({"doclen": 0})
            catalog.write(doc_stats.withColumn("shard", shard), "doc_stats")

        def _write_term_stats() -> None:
            term_stats = tdf.groupBy("term").agg(
                F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
            )
            catalog.write(term_stats, "term_stats")

        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(2)
        stat_jobs = [pool.submit(_write_doc_stats), pool.submit(_write_term_stats)]

    if todo:
        tdf_sharded = tdf.withColumn("shard", shard)
        if len(todo) < n_shards:
            tdf_sharded = tdf_sharded.where(F.col("shard").isin(todo))

        def encode_partition(batches):
            import pyarrow as pa

            tbl = pa.Table.from_batches(list(batches))
            if tbl.num_rows:
                yield from _encode_partition_arrow(tbl, avgdl)

        # hash-repartition on (term, shard): every group lands whole in
        # one partition; the encoder processes the partition vectorized.
        # mapInArrow (not mapInPandas): the term strings stay in Arrow
        # buffers and are dictionary-encoded in C++ — materializing 36M
        # python string objects was the dominant encode cost
        postings = (
            tdf_sharded.repartition(
                max(n_shards, 2 * spark.sparkContext.defaultParallelism), "term", "shard"
            )
            .mapInArrow(encode_partition, schema=POSTINGS_SCHEMA)
        )
        # shard stays a COLUMN (not a directory partition): queries
        # filter postings by term — parquet row-group stats on shard
        # suffice for the cogroup, and dir-partitioning multiplied file
        # count by n_shards for no pruning benefit
        mode = "append" if (resume and done and catalog.exists("postings")) else "overwrite"
        catalog.write(postings, "postings", mode=mode)
        mark("postings")
    for j in stat_jobs:
        j.result()
    if stat_jobs:
        mark("doc_term_stats_join")

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
        "title_boost": title_boost,
        "shards": per_shard,
        "built_shards_this_run": todo,
        "build_seconds": elapsed,
        "docs_per_sec": (n_docs / elapsed) if elapsed > 0 else None,
        "source": "documents",
    }
    catalog.commit_snapshot(manifest)
    return catalog.current_snapshot()


def _encode_partition_arrow(tbl, avgdl: float):
    """Encode ALL (term, shard) groups in one partition, Arrow-native:
    dictionary-encode the term column (C++), lexsort int codes, group
    boundaries via code changes, one whole-partition varbyte pass,
    per-block slices by byte offset.  Yields pyarrow RecordBatches."""
    import pyarrow as pa
    import pyarrow.compute as pc

    dict_arr = pc.dictionary_encode(tbl.column("term")).combine_chunks()
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.chunk(0)
    term_codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    term_dict = dict_arr.dictionary  # pa.StringArray of unique terms
    shards = tbl.column("shard").to_numpy(zero_copy_only=False).astype(np.int64)
    doc_ids = tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
    tfs = tbl.column("tf").to_numpy(zero_copy_only=False).astype(np.uint64)
    dls = tbl.column("doclen").to_numpy(zero_copy_only=False).astype(np.float64)

    order = np.lexsort((doc_ids, shards, term_codes))
    term_codes, shards, doc_ids, tfs, dls = (
        term_codes[order], shards[order], doc_ids[order], tfs[order], dls[order]
    )
    tfn = tfs / (tfs + K1 * (1.0 - B + B * dls / avgdl))

    # group boundaries over the (term, shard) key — int comparisons
    key_change = np.empty(len(term_codes), dtype=bool)
    key_change[0] = True
    key_change[1:] = (term_codes[1:] != term_codes[:-1]) | (shards[1:] != shards[:-1])
    starts = np.flatnonzero(key_change)
    ends = np.append(starts[1:], len(term_codes))

    # block boundaries: every BLOCK_SIZE entries within each group
    block_starts_list = [
        np.arange(g0, g1, BLOCK_SIZE, dtype=np.int64) for g0, g1 in zip(starts, ends)
    ]
    bstarts = np.concatenate(block_starts_list)
    group_of_block = np.repeat(np.arange(len(starts)), [len(x) for x in block_starts_list])
    bends = np.minimum(bstarts + BLOCK_SIZE, ends[group_of_block])
    block_ids = (bstarts - starts[group_of_block]) // BLOCK_SIZE

    # delta-encode doc_ids with a reset at every block start, then
    # varbyte-encode the WHOLE partition in one call and slice blocks
    # out by byte offset — one numpy pass instead of 2 calls per block
    deltas = np.empty_like(doc_ids)
    deltas[1:] = doc_ids[1:] - doc_ids[:-1]
    deltas[bstarts] = doc_ids[bstarts]  # absolute at block starts
    d_buf, d_sizes = vb_encode_with_sizes(deltas)
    t_buf, t_sizes = vb_encode_with_sizes(tfs)
    d_off = np.zeros(len(deltas) + 1, dtype=np.int64)
    np.cumsum(d_sizes, out=d_off[1:])
    t_off = np.zeros(len(tfs) + 1, dtype=np.int64)
    np.cumsum(t_sizes, out=t_off[1:])

    max_tfn_blocks = np.maximum.reduceat(tfn, bstarts)
    last_idx = bends - 1

    # binary columns built zero-copy-ish: offsets into the shared buffer
    d_offsets = np.empty(len(bstarts) + 1, dtype=np.int32)
    d_offsets[:-1] = d_off[bstarts]
    d_offsets[-1] = d_off[bends[-1]]
    t_offsets = np.empty(len(bstarts) + 1, dtype=np.int32)
    t_offsets[:-1] = t_off[bstarts]
    t_offsets[-1] = t_off[bends[-1]]
    d_col = pa.BinaryArray.from_buffers(
        pa.binary(), len(bstarts), [None, pa.py_buffer(d_offsets), pa.py_buffer(d_buf)]
    )
    t_col = pa.BinaryArray.from_buffers(
        pa.binary(), len(bstarts), [None, pa.py_buffer(t_offsets), pa.py_buffer(t_buf)]
    )
    batch = pa.RecordBatch.from_arrays(
        [
            pc.take(term_dict, pa.array(term_codes[bstarts], type=pa.int64())),
            pa.array(shards[bstarts].astype(np.int32)),
            pa.array(block_ids.astype(np.int32)),
            pa.array((bends - bstarts).astype(np.int32)),
            pa.array(doc_ids[bstarts].astype(np.int64)),
            pa.array(doc_ids[last_idx].astype(np.int64)),
            pa.array(max_tfn_blocks.astype(np.float32)),
            d_col,
            t_col,
        ],
        names=[
            "term", "shard", "block_id", "n", "first_doc_id",
            "last_doc_id", "max_tfn", "doc_ids_vb", "tfs_vb",
        ],
    )
    yield batch

"""Block-max document-at-a-time top-k kernel (the optimized query path).

Layout recap (index/build.py): postings are doc-range sharded; within a
(term, shard) group, fixed 128-entry varbyte blocks carry
(first_doc_id, last_doc_id, max_tf, min_dl) skip metadata.  The BM25
block upper bound is the corner bound
ub = idf · max_tf/(max_tf + k1·(1−b + b·min_dl/avgdl)) — tf-normalized
score is monotone increasing in tf and decreasing in doclen, so the
(max_tf, min_dl) corner dominates every doc in the block; computing it
at query time keeps committed blocks valid when avgdl drifts under
corpus growth.  Query executes as:

  postings scan, `term IN (query terms)` pushed to parquet
  → cogroup by shard with (filter-pruned) doc_stats
  → per-shard DAAT kernel (this module) → local top-k (k ≤ 50)
  → global merge: orderBy/limit over ≤ k·S tiny rows.

The reference's query semantics are AND (`operator:'and'`,
apiserver/apiserver/search/__init__.py:67), which admits a *stronger*
pruning than classic WAND: documents must appear in EVERY term's
posting list, so the kernel drives from the rarest term's doc list and
uses per-block [first,last] doc-id fences to skip — never decode —
blocks of frequent terms that cannot intersect the candidate set
(block-max skipping; this is where a stopword-tier term in the query
costs almost nothing).  Scoring of survivors is fully vectorized
(numpy), upper-bounded by the corner bound per block exactly as block-max
WAND would be for OR mode (``or_mode=True`` falls back to score-all
with threshold pruning between terms).

Everything here runs inside ``applyInPandas`` cogroups — Arrow in,
Arrow out, no per-row Python at the Spark boundary (north rule §2.10).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..analyzer import analyze_query
from ..index.varbyte import vb_decode, delta_decode
from .bm25 import K1, B, idf_map, _filtered_doc_stats

_RESULT_SCHEMA = "doc_id long, score double"


def _decode_term_blocks(
    rows: pd.DataFrame, candidates: np.ndarray | None
) -> tuple[np.ndarray, np.ndarray]:
    """Decode one term's blocks within a shard, skipping blocks whose
    [first_doc_id, last_doc_id] fence misses the candidate set."""
    order = np.argsort(rows["block_id"].to_numpy())
    firsts = rows["first_doc_id"].to_numpy()[order]
    lasts = rows["last_doc_id"].to_numpy()[order]
    keep = np.ones(len(order), dtype=bool)
    if candidates is not None:
        if candidates.size == 0:
            return np.zeros(0, np.uint64), np.zeros(0, np.uint64)
        # block survives iff any candidate falls inside its fence
        left = np.searchsorted(candidates, firsts, side="left")
        keep = (left < candidates.size) & (candidates[np.minimum(left, candidates.size - 1)] <= lasts)
    d_parts, t_parts = [], []
    dvb = rows["doc_ids_vb"].to_numpy()[order]
    tvb = rows["tfs_vb"].to_numpy()[order]
    for i in np.flatnonzero(keep):
        d_parts.append(delta_decode(vb_decode(bytes(dvb[i]))))
        t_parts.append(vb_decode(bytes(tvb[i])))
    if not d_parts:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint64)
    return np.concatenate(d_parts), np.concatenate(t_parts)


def _shard_topk(
    post: pd.DataFrame,
    docs: pd.DataFrame,
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    n_terms: int,
    filtered: bool,
    or_mode: bool,
) -> pd.DataFrame:
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "score": pd.Series([], dtype="float64")})
    if post.empty or docs.empty:
        return empty

    by_term = dict(tuple(post.groupby("term", sort=False)))
    if not or_mode and len(by_term) < n_terms:
        return empty  # a query term absent from this shard ⇒ no AND match here

    ds_ids = docs["doc_id"].to_numpy().astype(np.uint64)
    ds_order = np.argsort(ds_ids)
    ds_ids = ds_ids[ds_order]
    ds_len = docs["doclen"].to_numpy().astype(np.float64)[ds_order]

    if or_mode:
        return _shard_topk_or(by_term, ds_ids, ds_len, idfs, avgdl, k, filtered, empty)

    # AND mode: drive from rarest term (fewest posting entries in shard)
    term_order = sorted(by_term, key=lambda t: int(by_term[t]["n"].sum()))
    cand, _ = _decode_term_blocks(by_term[term_order[0]], None)
    if filtered:
        cand = cand[np.isin(cand, ds_ids)]
    tf_by_term: dict[str, np.ndarray] = {}
    for t in term_order[1:]:
        if cand.size == 0:
            return empty
        d, tf = _decode_term_blocks(by_term[t], cand)
        mask = np.isin(cand, d)
        cand = cand[mask]
        if cand.size == 0:
            return empty
        sel = np.searchsorted(d, cand)
        tf_by_term[t] = tf[sel]
        # shrink previously-gathered tf arrays to the surviving candidates
        for t2 in tf_by_term:
            if t2 != t:
                tf_by_term[t2] = tf_by_term[t2][mask]
    # tf of driver term for surviving candidates
    d0, tf0 = _decode_term_blocks(by_term[term_order[0]], cand)
    sel0 = np.searchsorted(d0, cand)
    tf_by_term[term_order[0]] = tf0[sel0]

    dl = ds_len[np.searchsorted(ds_ids, cand)]
    norm = K1 * (1.0 - B + B * dl / avgdl)
    score = np.zeros(cand.size, dtype=np.float64)
    for t, tf in tf_by_term.items():
        tff = tf.astype(np.float64)
        score += idfs[t] * tff / (tff + norm)

    return _local_topk(cand, score, k)


def _score_docs(cand, by_term, ds_ids, ds_len, idfs, avgdl):
    """Exact OR score of given docs: fence-decode each term's blocks
    around the candidate set and accumulate present contributions."""
    norm = K1 * (1.0 - B + B * ds_len[np.searchsorted(ds_ids, cand)] / avgdl)
    score = np.zeros(cand.size, dtype=np.float64)
    for t, rows in by_term.items():
        d, tf = _decode_term_blocks(rows, cand)
        if d.size == 0:
            continue
        pos = np.searchsorted(d, cand)
        pos_c = np.minimum(pos, d.size - 1)
        present = d[pos_c] == cand
        tff = tf[pos_c].astype(np.float64)
        score += np.where(present, idfs[t] * tff / (tff + norm), 0.0)
    return score


def _shard_topk_or(by_term, ds_ids, ds_len, idfs, avgdl, k, filtered, empty) -> pd.DataFrame:
    """OR mode: block-max WAND-style pruning, exact results.

    1. Seed a threshold θ: fully score the docs of the strongest term's
       best blocks (highest corner-bound ub).
    2. Block pruning: block b of term t cannot contribute to a top-k doc
       if ub(b) + Σ_{t'≠t} max_ub(t') < θ — skip (never decode) it.
    3. Exact rescore of every candidate doc surviving pruning.
    Classic DAAT WAND pivots per document; this is its vectorized
    batch analog — same skip criterion, same exactness argument.
    """
    ubs: dict[str, np.ndarray] = {}
    max_ub: dict[str, float] = {}
    for t, rows in by_term.items():
        mtf = rows["max_tf"].to_numpy().astype(np.float64)
        mdl = rows["min_dl"].to_numpy().astype(np.float64)
        ub = idfs[t] * mtf / (mtf + K1 * (1.0 - B + B * mdl / avgdl))
        ubs[t] = ub
        max_ub[t] = float(ub.max())
    total_ub = sum(max_ub.values())

    # 1. seed θ from the strongest term's best blocks
    t_seed = max(max_ub, key=lambda t: max_ub[t])
    rows = by_term[t_seed]
    order = np.argsort(-ubs[t_seed])
    n_seed = max(1, (2 * k + 127) // 128)
    seed_rows = rows.iloc[order[:n_seed]]
    seed_docs, _ = _decode_term_blocks(seed_rows, None)
    if filtered:
        seed_docs = seed_docs[np.isin(seed_docs, ds_ids)]
    theta = 0.0
    if seed_docs.size:
        seed_scores = _score_docs(seed_docs, by_term, ds_ids, ds_len, idfs, avgdl)
        if seed_scores.size >= k:
            theta = float(np.partition(-seed_scores, k - 1)[k - 1] * -1)

    # 2. prune blocks that provably cannot reach θ; gather candidates
    cand_parts = [seed_docs]
    for t, rows in by_term.items():
        rest = total_ub - max_ub[t]
        keep = ubs[t] + rest >= theta
        if not keep.any():
            continue
        kept = rows[pd.Series(keep, index=rows.index)]
        d, _ = _decode_term_blocks(kept, None)
        cand_parts.append(d)
    cand = np.unique(np.concatenate(cand_parts)) if cand_parts else np.zeros(0, np.uint64)
    if filtered:
        cand = cand[np.isin(cand, ds_ids)]
    if cand.size == 0:
        return empty

    # 3. exact rescore of all surviving candidates
    score = _score_docs(cand, by_term, ds_ids, ds_len, idfs, avgdl)
    return _local_topk(cand, score, k)


def _local_topk(doc_ids: np.ndarray, scores: np.ndarray, k: int) -> pd.DataFrame:
    if doc_ids.size > k:
        # keep every doc whose score ties the k-th — an arbitrary k*2
        # truncation could drop boundary-tied docs with small doc_ids,
        # violating the pinned (score desc, doc_id asc) tie-break
        kth = -np.partition(-scores, k - 1)[k - 1]
        keep = scores >= kth
        doc_ids, scores = doc_ids[keep], scores[keep]
    order = np.lexsort((doc_ids, -scores))[:k]
    return pd.DataFrame(
        {"doc_id": doc_ids[order].astype(np.int64), "score": scores[order]}
    )


def bm25_topk_blockmax(
    spark: SparkSession,
    catalog,
    query: str,
    k: int = 10,
    lang: str | None = None,
    ts_lo=None,
    ts_hi=None,
    or_mode: bool = False,
) -> DataFrame:
    snap = catalog.current_snapshot()
    avgdl = snap["avgdl"]
    stemming = snap.get("stemming", True)
    terms = analyze_query(query, stemming=stemming,
                          tokenizer=snap.get("tokenizer", "simple"))
    empty = spark.createDataFrame([], _RESULT_SCHEMA)
    if not terms:
        return empty
    idfs = idf_map(spark, catalog, terms)
    if not or_mode and len(idfs) < len(terms):
        return empty
    if or_mode:
        terms = [t for t in terms if t in idfs]
        if not terms:
            return empty

    filtered = lang is not None or ts_lo is not None or ts_hi is not None
    postings = (
        catalog.read(spark, "postings")
        .where(F.col("term").isin(terms))
        .select("shard", "term", "block_id", "n", "first_doc_id",
                "last_doc_id", "max_tf", "min_dl", "doc_ids_vb", "tfs_vb")
    )
    ds = _filtered_doc_stats(spark, catalog, lang, ts_lo, ts_hi).select(
        "shard", "doc_id", "doclen"
    )
    n_terms = len(terms)

    def kernel(key, post_pdf: pd.DataFrame, docs_pdf: pd.DataFrame) -> pd.DataFrame:
        return _shard_topk(post_pdf, docs_pdf, idfs, avgdl, k, n_terms, filtered, or_mode)

    local = (
        postings.groupby("shard")
        .cogroup(ds.groupby("shard"))
        .applyInPandas(kernel, schema=_RESULT_SCHEMA)
    )
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

"""Block-max document-at-a-time top-k kernel (the optimized query path).

Layout recap (index/build.py): postings are doc-range sharded; within a
(term, shard) group, fixed 128-entry varbyte blocks carry
(first_doc_id, last_doc_id, max_tf, min_dl, qmax_tfn) skip metadata and
three varbyte payloads: delta doc_ids, tfs, and per-posting doclens.
Carrying doclen IN the posting block (the classic impact-ordered /
Lucene-norms layout) means scoring never needs the doc_stats table:
an unfiltered query is ONE grouped scan of the query terms' blocks —
no doc_stats shuffle, no cogroup.  Only filtered queries (lang /
warc_ts predicates) cogroup with the (cached, narrow) doc-id filter
set.

Two block upper bounds, combined with min():
- corner bound idf · max_tf/(max_tf + k1·(1−b + b·min_dl/avgdl)) —
  avgdl-independent at build time, stays valid as the corpus grows;
- baked bound: qmax_tfn = ceil(255 · max_doc tf/(tf + k1·(1−b +
  b·dl/A))) at fixed reference A = TFN_REF_AVGDL, quantized up to
  uint8.  tfn is increasing in avgdl and tfn(avgdl) ≤ tfn(A) ·
  max(1, avgdl/A) (the denominators' ratio is bounded by avgdl/A), so
  (qmax_tfn/255) · max(1, avgdl/A) is a valid upper bound at ANY
  avgdl — per-document, hence tighter than the corner whenever the
  max-tf document is long.

Query executes as:

  postings scan, `term IN (query terms)` pushed to parquet (the build
  writes each shard partition as ONE term-sorted file, so row-group
  min/max stats prune everything but the query terms' blocks)
  → groupBy shard [cogroup with filtered doc-id set when filtered]
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
(numpy).  ``or_mode=True`` runs block-max WAND-style pruning: a θ
threshold seeded from the best blocks of every query term, block
pruning by ub(b) + Σ max_ub(other terms) < θ, exact rescore of
survivors.

Everything here runs inside ``applyInPandas`` groups — Arrow in,
Arrow out, no per-row Python at the Spark boundary (north rule §2.10).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..analyzer import analyze_query
from ..index.varbyte import vb_decode, delta_decode
from .bm25 import K1, B, idf_map, _filtered_doc_ids

#: fixed reference avgdl the baked per-block max_tfn is quantized at —
#: single definition in index.build (ADVICE r3: a drifted duplicate
#: would silently mis-scale the baked bound and block pruning could
#: drop true top-k docs).  Queries read the value the INDEX was built
#: with from the snapshot manifest; this import is only the fallback
#: for format-2 snapshots that predate the manifest field.
from ..index.build import TFN_REF_AVGDL  # noqa: E402

_RESULT_SCHEMA = "doc_id long, score double"

_POSTING_COLS = [
    "shard", "term", "block_id", "n", "first_doc_id", "last_doc_id",
    "max_tf", "min_dl", "qmax_tfn", "doc_ids_vb", "tfs_vb", "dls_vb",
]


_Z = np.zeros(0, np.uint64)


def _decode_term_blocks(
    rows: pd.DataFrame,
    candidates: np.ndarray | None,
    want: int = 3,
    cache: dict | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one term's blocks within a shard, skipping blocks whose
    [first_doc_id, last_doc_id] fence misses the candidate set.
    Returns (doc_ids, tfs, doclens); ``want`` trims decode work:
    1 = ids only, 2 = ids+tfs, 3 = all three payloads.

    ``cache`` (block_id → decoded triple) shares decode work across
    the queries of a batch (query/batch.py): the single-query path
    passes None and is byte-identical to the uncached code.  Cached
    entries always hold all three payloads — a block decoded once
    serves every later ``want`` level — so ``want`` only trims the
    cache-miss cost."""
    order = np.argsort(rows["block_id"].to_numpy())
    firsts = rows["first_doc_id"].to_numpy()[order]
    lasts = rows["last_doc_id"].to_numpy()[order]
    keep = np.ones(len(order), dtype=bool)
    if candidates is not None:
        if candidates.size == 0:
            return _Z, _Z, _Z
        # block survives iff any candidate falls inside its fence
        left = np.searchsorted(candidates, firsts, side="left")
        keep = (left < candidates.size) & (candidates[np.minimum(left, candidates.size - 1)] <= lasts)
    d_parts, t_parts, l_parts = [], [], []
    bids = rows["block_id"].to_numpy()[order]
    dvb = rows["doc_ids_vb"].to_numpy()[order]
    tvb = rows["tfs_vb"].to_numpy()[order]
    lvb = rows["dls_vb"].to_numpy()[order]
    for i in np.flatnonzero(keep):
        if cache is not None:
            trip = cache.get(bids[i])
            if trip is None:
                trip = (
                    delta_decode(vb_decode(bytes(dvb[i]))),
                    vb_decode(bytes(tvb[i])),
                    vb_decode(bytes(lvb[i])),
                )
                cache[bids[i]] = trip
            d_parts.append(trip[0])
            t_parts.append(trip[1])
            l_parts.append(trip[2])
            continue
        d_parts.append(delta_decode(vb_decode(bytes(dvb[i]))))
        if want >= 2:
            t_parts.append(vb_decode(bytes(tvb[i])))
        if want >= 3:
            l_parts.append(vb_decode(bytes(lvb[i])))
    if not d_parts:
        return _Z, _Z, _Z
    return (
        np.concatenate(d_parts),
        np.concatenate(t_parts) if t_parts else _Z,
        np.concatenate(l_parts) if l_parts else _Z,
    )


def _shard_topk(
    post: pd.DataFrame,
    filter_ids: np.ndarray | None,
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    n_terms: int,
    or_mode: bool,
    tfn_ref: float = TFN_REF_AVGDL,
) -> pd.DataFrame:
    """Top-k of one doc-range shard.  ``filter_ids``: sorted doc_ids
    surviving the non-scoring filter context, or None = unfiltered."""
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "score": pd.Series([], dtype="float64")})
    if post.empty or (filter_ids is not None and filter_ids.size == 0):
        return empty

    by_term = dict(tuple(post.groupby("term", sort=False)))
    return _topk_from_terms(
        by_term, filter_ids, idfs, avgdl, k, n_terms, or_mode, tfn_ref
    )


def _topk_from_terms(
    by_term: dict[str, pd.DataFrame],
    filter_ids: np.ndarray | None,
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    n_terms: int,
    or_mode: bool,
    tfn_ref: float = TFN_REF_AVGDL,
    caches: dict[str, dict] | None = None,
) -> pd.DataFrame:
    """Core of one shard's top-k, over an already-grouped
    term → posting-rows map.  The single-query kernel calls it with
    the whole shard group; the batch kernel (query/batch.py) calls it
    once per query with that query's term subset plus per-term decode
    caches so queries sharing a term never decode a block twice."""
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "score": pd.Series([], dtype="float64")})
    if filter_ids is not None and filter_ids.size == 0:
        return empty
    if not or_mode and len(by_term) < n_terms:
        return empty  # a query term absent from this shard ⇒ no AND match here
    if not by_term:
        return empty

    def _cache(t: str) -> dict | None:
        return caches.get(t) if caches is not None else None

    if or_mode:
        return _shard_topk_or(by_term, filter_ids, idfs, avgdl, k, empty,
                              tfn_ref, caches)

    # AND mode: drive from rarest term (fewest posting entries in shard)
    term_order = sorted(by_term, key=lambda t: int(by_term[t]["n"].sum()))
    cand, _, _ = _decode_term_blocks(by_term[term_order[0]], None, want=1,
                                     cache=_cache(term_order[0]))
    if filter_ids is not None:
        cand = cand[np.isin(cand, filter_ids)]
    tf_by_term: dict[str, np.ndarray] = {}
    for t in term_order[1:]:
        if cand.size == 0:
            return empty
        d, tf, _ = _decode_term_blocks(by_term[t], cand, want=2, cache=_cache(t))
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
    # tf + doclen of driver term for surviving candidates (doclen rides
    # in every term's blocks; any one term supplies it)
    d0, tf0, dl0 = _decode_term_blocks(by_term[term_order[0]], cand,
                                       cache=_cache(term_order[0]))
    sel0 = np.searchsorted(d0, cand)
    tf_by_term[term_order[0]] = tf0[sel0]

    dl = dl0[sel0].astype(np.float64)
    norm = K1 * (1.0 - B + B * dl / avgdl)
    score = np.zeros(cand.size, dtype=np.float64)
    for t, tf in tf_by_term.items():
        tff = tf.astype(np.float64)
        score += idfs[t] * tff / (tff + norm)

    return _local_topk(cand, score, k)


def _score_docs(cand, by_term, idfs, avgdl, caches=None):
    """Exact OR score of given docs: fence-decode each term's blocks
    around the candidate set and accumulate present contributions.
    doclen comes from the posting payloads themselves."""
    dl = np.zeros(cand.size, dtype=np.float64)
    have_dl = np.zeros(cand.size, dtype=bool)
    contrib = []
    for t, rows in by_term.items():
        d, tf, dls = _decode_term_blocks(
            rows, cand, cache=caches.get(t) if caches is not None else None
        )
        if d.size == 0:
            continue
        pos = np.searchsorted(d, cand)
        pos_c = np.minimum(pos, d.size - 1)
        present = d[pos_c] == cand
        dl = np.where(present & ~have_dl, dls[pos_c].astype(np.float64), dl)
        have_dl |= present
        contrib.append((t, present, tf[pos_c].astype(np.float64)))
    norm = K1 * (1.0 - B + B * dl / avgdl)
    score = np.zeros(cand.size, dtype=np.float64)
    for t, present, tff in contrib:
        score += np.where(present, idfs[t] * tff / (tff + norm), 0.0)
    return score


def _block_bounds(
    rows: pd.DataFrame, idf: float, avgdl: float, tfn_ref: float = TFN_REF_AVGDL
) -> np.ndarray:
    """Per-block BM25 upper bound: min(corner bound, scaled baked bound).
    ``tfn_ref`` is the reference avgdl the index baked qmax_tfn at
    (from the snapshot manifest — must match the build, not this code)."""
    mtf = rows["max_tf"].to_numpy().astype(np.float64)
    mdl = rows["min_dl"].to_numpy().astype(np.float64)
    corner = mtf / (mtf + K1 * (1.0 - B + B * mdl / avgdl))
    baked = (rows["qmax_tfn"].to_numpy().astype(np.float64) / 255.0) * max(
        1.0, avgdl / tfn_ref
    )
    return idf * np.minimum(corner, baked)


def _shard_topk_or(
    by_term, filter_ids, idfs, avgdl, k, empty, tfn_ref=TFN_REF_AVGDL,
    caches=None,
) -> pd.DataFrame:
    """OR mode: block-max WAND-style pruning, exact results.

    1. Seed a threshold θ: fully score the union of every term's
       best blocks (highest upper bound).
    2. Block pruning: block b of term t cannot contribute to a top-k doc
       if ub(b) + Σ_{t'≠t} max_ub(t') < θ — skip (never decode) it.
    3. Exact rescore of every candidate doc surviving pruning.
    Classic DAAT WAND pivots per document; this is its vectorized
    batch analog — same skip criterion, same exactness argument.
    """
    ubs: dict[str, np.ndarray] = {}
    max_ub: dict[str, float] = {}
    for t, rows in by_term.items():
        ub = _block_bounds(rows, idfs[t], avgdl, tfn_ref)
        ubs[t] = ub
        max_ub[t] = float(ub.max())
    total_ub = sum(max_ub.values())

    # 1. seed θ from the best blocks of EVERY term (a strong seed makes
    # step 2 prune more; seeding from only the strongest term was
    # measured too weak — VERDICT r2)
    n_seed = max(1, (2 * k + 127) // 128)
    seed_parts = []
    for t, rows in by_term.items():
        order = np.argsort(-ubs[t])
        d, _, _ = _decode_term_blocks(rows.iloc[order[:n_seed]], None, want=1,
                                      cache=caches.get(t) if caches is not None else None)
        seed_parts.append(d)
    seed_docs = np.unique(np.concatenate(seed_parts))
    if filter_ids is not None:
        seed_docs = seed_docs[np.isin(seed_docs, filter_ids)]
    theta = 0.0
    if seed_docs.size:
        seed_scores = _score_docs(seed_docs, by_term, idfs, avgdl, caches)
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
        d, _, _ = _decode_term_blocks(kept, None, want=1,
                                      cache=caches.get(t) if caches is not None else None)
        cand_parts.append(d)
    cand = np.unique(np.concatenate(cand_parts)) if cand_parts else np.zeros(0, np.uint64)
    if filter_ids is not None:
        cand = cand[np.isin(cand, filter_ids)]
    if cand.size == 0:
        return empty

    # 3. exact rescore of all surviving candidates
    score = _score_docs(cand, by_term, idfs, avgdl, caches)
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
    if snap.get("postings_format", 1) < 2:
        raise ValueError(
            "index predates the doclen-in-postings layout (postings_format 2); "
            "rebuild with build_index(resume=False)"
        )
    avgdl = snap["avgdl"]
    # the reference avgdl qmax_tfn was baked at — from the manifest, so
    # an index built by a different code version can never be silently
    # mis-scaled (ADVICE r3); pre-field format-2 snapshots used 256.0
    tfn_ref = float(snap.get("tfn_ref_avgdl", TFN_REF_AVGDL))
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

    n_terms = len(terms)
    local = _shard_kernel_job(
        spark, catalog, terms,
        lambda post_pdf, fids: _shard_topk(
            post_pdf, fids, idfs, avgdl, k, n_terms, or_mode, tfn_ref
        ),
        _RESULT_SCHEMA, lang, ts_lo, ts_hi, cols=_POSTING_COLS,
    )
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def _shard_kernel_job(
    spark, catalog, scan_terms: list[str], shard_fn, schema: str,
    lang, ts_lo, ts_hi, cols: list[str] = _POSTING_COLS,
) -> DataFrame:
    """The query family's one execution skeleton: term-IN pruned
    postings scan over ``cols`` → per-shard Arrow groups →
    ``shard_fn(post_pdf, filter_ids)`` — cogrouped with the filter
    doc-id set when any filter is present (no doc_stats side at all
    otherwise: doclens ride in the posting blocks).  Keyword top-k and
    every positional job (top-k, spans, passages — query/phrase.py,
    which passes its positional column list) run through here, so scan
    pruning / filter plumbing fixes apply to all of them at once."""
    filtered = lang is not None or ts_lo is not None or ts_hi is not None
    postings = (
        catalog.read_snapshot(spark, "postings")
        .where(F.col("term").isin(scan_terms))
        .select(*cols)
    )
    if not filtered:
        def kernel(post_pdf: pd.DataFrame) -> pd.DataFrame:
            return shard_fn(post_pdf, None)

        return postings.groupby("shard").applyInPandas(kernel, schema=schema)

    ds = _filtered_doc_ids(spark, catalog, lang, ts_lo, ts_hi)

    def kernel2(key, post_pdf, docs_pdf):
        fids = np.sort(docs_pdf["doc_id"].to_numpy().astype(np.uint64))
        return shard_fn(post_pdf, fids)

    return (
        postings.groupby("shard")
        .cogroup(ds.groupby("shard"))
        .applyInPandas(kernel2, schema=schema)
    )

"""Exact phrase top-k over a positional index (Lucene match_phrase
semantics, slop=0).

The reference exposes keyword AND/OR matching only (its fulltext layer
is Elasticsearch `multi_match`, apiserver/apiserver/search/__init__.py:
55-77); phrase matching is the canonical next capability of an inverted
index and is implemented here the way Lucene's PhraseQuery does it:

- tf   = phraseFreq: the number of token offsets p such that
  term_i appears at p+i for every phrase position i;
- idf  = Σ_i idf(term_i) over the phrase's positions (a repeated term
  contributes once per occurrence — Lucene sums the idf of its
  TermStatistics array, which lists each position's term);
- score = idf_sum · pf / (pf + k1·(1−b + b·dl/avgdl)) — the same BM25
  tf-normalization as a single synthetic term with tf = phraseFreq.

Execution is one scan + one kernel pass, the same shape as the AND
query path (query/wand.py):

  postings scan (`term IN (phrase terms)` pushed to row-group pruning,
  positional payload column read ONLY here — plain BM25 queries never
  select pos_vb, so a positional index costs them nothing)
  → groupBy shard [cogroup with the filter doc-id set when filtered]
  → per-shard kernel: AND-intersect candidates via block fences
    (rarest term drives), decode positions only for blocks that can
    contain a candidate, vectorized adjacency join, local top-k
  → global merge over ≤ k·S tiny rows.

The adjacency join is numpy: for phrase position i, every candidate
occurrence becomes a key ``local_doc·2^33 + (pos − i + m)``; the keys
of position 0 are successively intersected (sorted searchsorted) with
each later position's keys, and surviving keys bincount into per-doc
phrase frequencies.  No per-row python anywhere (north rule §2.10).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..analyzer import analyze_str, StemCache
from ..index.varbyte import vb_decode, delta_decode
from .bm25 import K1, B, idf_map, _filtered_doc_ids
from .wand import _local_topk

_RESULT_SCHEMA = "doc_id long, score double"

_PHRASE_COLS = [
    "shard", "term", "block_id", "n", "first_doc_id", "last_doc_id",
    "doc_ids_vb", "tfs_vb", "dls_vb", "pos_vb",
]

_Z = np.zeros(0, np.uint64)


def _decode_blocks_pos(
    rows: pd.DataFrame, candidates: np.ndarray | None
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode one term's surviving blocks incl. positions.  Returns
    (doc_ids, tfs, dls, flat_abs_positions, posting_pos_offsets) where
    ``posting_pos_offsets`` has len(doc_ids)+1 and posting j's positions
    are ``flat[off[j]:off[j+1]]`` (ascending within the posting)."""
    order = np.argsort(rows["block_id"].to_numpy())
    firsts = rows["first_doc_id"].to_numpy()[order]
    lasts = rows["last_doc_id"].to_numpy()[order]
    keep = np.ones(len(order), dtype=bool)
    if candidates is not None:
        if candidates.size == 0:
            return _Z, _Z, _Z, _Z, np.zeros(1, np.int64)
        left = np.searchsorted(candidates, firsts, side="left")
        keep = (left < candidates.size) & (
            candidates[np.minimum(left, candidates.size - 1)] <= lasts
        )
    dvb = rows["doc_ids_vb"].to_numpy()[order]
    tvb = rows["tfs_vb"].to_numpy()[order]
    lvb = rows["dls_vb"].to_numpy()[order]
    pvb = rows["pos_vb"].to_numpy()[order]
    d_parts, t_parts, l_parts, p_parts = [], [], [], []
    for i in np.flatnonzero(keep):
        tf = vb_decode(bytes(tvb[i]))
        d_parts.append(delta_decode(vb_decode(bytes(dvb[i]))))
        t_parts.append(tf)
        l_parts.append(vb_decode(bytes(lvb[i])))
        # positions: per-posting delta streams concatenated; groupwise
        # cumsum with a reset at each posting start recovers absolutes
        deltas = vb_decode(bytes(pvb[i])).astype(np.int64)
        counts = tf.astype(np.int64)
        starts = np.zeros(counts.size, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        run = np.cumsum(deltas)
        correction = run[starts] - deltas[starts]
        p_parts.append(run - np.repeat(correction, counts))
    if not d_parts:
        return _Z, _Z, _Z, _Z, np.zeros(1, np.int64)
    d = np.concatenate(d_parts)
    tf = np.concatenate(t_parts)
    dl = np.concatenate(l_parts)
    flat = np.concatenate(p_parts)
    off = np.zeros(d.size + 1, dtype=np.int64)
    np.cumsum(tf.astype(np.int64), out=off[1:])
    return d, tf, dl, flat, off


def _ragged_gather(offsets: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Indices selecting, for each j, the slice
    [offsets[j], offsets[j]+counts[j]) — concatenated, no python loop."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    shift = np.zeros(counts.size, dtype=np.int64)
    np.cumsum(counts[:-1], out=shift[1:])
    return (
        np.arange(total, dtype=np.int64)
        - np.repeat(shift, counts)
        + np.repeat(offsets, counts)
    )


def _phrase_topk_shard(
    post: pd.DataFrame,
    filter_ids: np.ndarray | None,
    phrase_terms: list[str],
    idf_sum: float,
    avgdl: float,
    k: int,
) -> pd.DataFrame:
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "score": pd.Series([], dtype="float64")})
    if post.empty or (filter_ids is not None and filter_ids.size == 0):
        return empty
    uniq: dict[str, None] = {}
    for t in phrase_terms:
        uniq.setdefault(t, None)
    by_term = dict(tuple(post.groupby("term", sort=False)))
    if len(by_term) < len(uniq):
        return empty  # a phrase term absent from this shard

    # 1. AND-intersection of candidate docs, rarest term driving
    term_order = sorted(uniq, key=lambda t: int(by_term[t]["n"].sum()))
    cand, _, _, _, _ = _decode_blocks_pos(by_term[term_order[0]], None)
    if filter_ids is not None:
        cand = cand[np.isin(cand, filter_ids)]
    for t in term_order[1:]:
        if cand.size == 0:
            return empty
        d, _, _, _, _ = _decode_blocks_pos(by_term[t], cand)
        cand = cand[np.isin(cand, d)]
    if cand.size == 0:
        return empty

    # 2. per-unique-term candidate positions as sorted key arrays
    m = len(phrase_terms)
    keys_of: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    dl_cand: np.ndarray | None = None
    for t in uniq:
        d, tf, dl, flat, off = _decode_blocks_pos(by_term[t], cand)
        sel = np.searchsorted(d, cand)
        if dl_cand is None:
            dl_cand = dl[sel].astype(np.float64)
        counts = tf[sel].astype(np.int64)
        idx = _ragged_gather(off[sel], counts)
        pos = flat[idx]
        doc_local = np.repeat(np.arange(cand.size, dtype=np.int64), counts)
        keys_of[t] = (doc_local, pos)

    # 3. adjacency: intersect key sets shifted by phrase position
    doc0, pos0 = keys_of[phrase_terms[0]]
    running = doc0 * (1 << 33) + (pos0 + m)  # sorted: docs asc, pos asc
    for i, t in enumerate(phrase_terms[1:], start=1):
        if running.size == 0:
            return empty
        doc_i, pos_i = keys_of[t]
        keys_i = doc_i * (1 << 33) + (pos_i - i + m)
        loc = np.searchsorted(keys_i, running)
        loc_c = np.minimum(loc, max(keys_i.size - 1, 0))
        running = (
            running[keys_i[loc_c] == running] if keys_i.size else running[:0]
        )
    if running.size == 0:
        return empty
    pf = np.bincount(running >> 33, minlength=cand.size).astype(np.float64)

    hit = pf > 0
    pfh = pf[hit]
    norm = K1 * (1.0 - B + B * dl_cand[hit] / avgdl)
    score = idf_sum * pfh / (pfh + norm)
    return _local_topk(cand[hit], score, k)


def bm25_phrase_topk(
    spark: SparkSession,
    catalog,
    phrase: str,
    k: int = 10,
    lang: str | None = None,
    ts_lo=None,
    ts_hi=None,
) -> DataFrame:
    """Exact-phrase BM25 top-k against a positional index
    (``build_index(..., positions=True)``)."""
    snap = catalog.current_snapshot()
    if not snap.get("positions", False):
        raise ValueError(
            "phrase queries need a positional index — rebuild with "
            "build_index(..., positions=True)"
        )
    avgdl = snap["avgdl"]
    stemming = snap.get("stemming", True)
    # full ordered token sequence, duplicates preserved (a phrase is a
    # sequence, not a term set — analyze_query dedups and cannot be
    # used here)
    terms = analyze_str(phrase, StemCache() if stemming else None,
                        tokenizer=snap.get("tokenizer", "simple"))
    empty = spark.createDataFrame([], _RESULT_SCHEMA)
    if not terms:
        return empty
    idfs = idf_map(spark, catalog, list(dict.fromkeys(terms)))
    if len(idfs) < len(set(terms)):
        return empty  # a phrase term with df=0 kills the phrase
    idf_sum = float(sum(idfs[t] for t in terms))
    if len(terms) == 1:
        # degenerate single-term phrase ≡ the term query with summed idf
        from .wand import bm25_topk_blockmax

        return bm25_topk_blockmax(
            spark, catalog, phrase, k=k, lang=lang, ts_lo=ts_lo, ts_hi=ts_hi
        )

    filtered = lang is not None or ts_lo is not None or ts_hi is not None
    postings = (
        catalog.read_snapshot(spark, "postings")
        .where(F.col("term").isin(list(set(terms))))
        .select(*_PHRASE_COLS)
    )

    if not filtered:
        def kernel(post_pdf: pd.DataFrame) -> pd.DataFrame:
            return _phrase_topk_shard(post_pdf, None, terms, idf_sum, avgdl, k)

        local = postings.groupby("shard").applyInPandas(
            kernel, schema=_RESULT_SCHEMA
        )
    else:
        ds = _filtered_doc_ids(spark, catalog, lang, ts_lo, ts_hi)

        def kernel2(key, post_pdf, docs_pdf):
            fids = np.sort(docs_pdf["doc_id"].to_numpy().astype(np.uint64))
            return _phrase_topk_shard(post_pdf, fids, terms, idf_sum, avgdl, k)

        local = (
            postings.groupby("shard")
            .cogroup(ds.groupby("shard"))
            .applyInPandas(kernel2, schema=_RESULT_SCHEMA)
        )
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

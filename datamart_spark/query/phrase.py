"""Phrase top-k over a positional index: exact (Lucene match_phrase,
slop=0) and ordered proximity (span_near in_order=true, slop>0).

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

``slop > 0`` switches the kernel to ordered proximity
(``_slop_matches``): per position-0 occurrence, a greedy vectorized
next-offset chain finds the minimal in-order completion; matches with
gap ≤ slop each contribute Lucene's 1/(gap+1) slop factor to the
weighted phrase frequency.  This is span_near(in_order=true) — NOT
ES match_phrase's sloppy mode, which also admits reordered terms
(transpositions cost 2); the in-order form is the documented choice
because its greedy chain is provably minimal per start and stays one
vectorized pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..analyzer import analyze_str, StemCache
from ..index.varbyte import vb_decode, delta_decode
from .bm25 import K1, B, idf_map
from .wand import _local_topk, _shard_kernel_job

_RESULT_SCHEMA = "doc_id long, score double"

_PHRASE_COLS = [
    "shard", "term", "block_id", "n", "first_doc_id", "last_doc_id",
    "doc_ids_vb", "tfs_vb", "dls_vb", "pos_vb",
]

_Z = np.zeros(0, np.uint64)


def _decode_blocks_pos(
    rows: pd.DataFrame, candidates: np.ndarray | None, want: int = 3,
    cache: dict | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode one term's surviving blocks incl. positions.  Returns
    (doc_ids, tfs, dls, flat_abs_positions, posting_pos_offsets) where
    ``posting_pos_offsets`` has len(doc_ids)+1 and posting j's positions
    are ``flat[off[j]:off[j+1]]`` (ascending within the posting).
    ``want``: 1 = doc ids only (the candidate-intersection passes — the
    position payload is the largest and must not be decoded there),
    3 = everything.

    ``cache`` (one dict per term, lossless per-block entries keyed
    ("ids"|"full", block_id)) makes every block decode at most once per
    shard-kernel no matter how many specs or passes touch it — the same
    contract as the keyword path's wand decode cache.  Candidate
    pruning only selects WHICH blocks decode; the per-block payload is
    candidate-independent, so cached entries are exact."""
    order = np.argsort(rows["block_id"].to_numpy())
    bids = rows["block_id"].to_numpy()[order]
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
        bid = int(bids[i])
        if want < 3:
            if cache is not None:
                hit = cache.get(("full", bid))
                if hit is not None:
                    d_parts.append(hit[0])
                    continue
                hit = cache.get(("ids", bid))
                if hit is not None:
                    d_parts.append(hit)
                    continue
            d = delta_decode(vb_decode(bytes(dvb[i])))
            if cache is not None:
                cache[("ids", bid)] = d
            d_parts.append(d)
            continue
        if cache is not None:
            hit = cache.get(("full", bid))
            if hit is not None:
                d_parts.append(hit[0])
                t_parts.append(hit[1])
                l_parts.append(hit[2])
                p_parts.append(hit[3])
                continue
        d = delta_decode(vb_decode(bytes(dvb[i])))
        tf = vb_decode(bytes(tvb[i]))
        dl = vb_decode(bytes(lvb[i]))
        # positions: per-posting delta streams concatenated; groupwise
        # cumsum with a reset at each posting start recovers absolutes
        deltas = vb_decode(bytes(pvb[i])).astype(np.int64)
        counts = tf.astype(np.int64)
        starts = np.zeros(counts.size, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        run = np.cumsum(deltas)
        correction = run[starts] - deltas[starts]
        pos = run - np.repeat(correction, counts)
        if cache is not None:
            cache[("full", bid)] = (d, tf, dl, pos)
        d_parts.append(d)
        t_parts.append(tf)
        l_parts.append(dl)
        p_parts.append(pos)
    if not d_parts:
        return _Z, _Z, _Z, _Z, np.zeros(1, np.int64)
    d = np.concatenate(d_parts)
    if want < 3:
        return d, _Z, _Z, _Z, np.zeros(1, np.int64)
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
    term_sets: list[list[str]],
    idf_sum: float,
    avgdl: float,
    k: int,
    slop: int = 0,
) -> pd.DataFrame:
    """Top-k of one shard for a positional sequence query (groups the
    shard's posting rows by term, then delegates)."""
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "score": pd.Series([], dtype="float64")})
    if post.empty:
        return empty
    by_term = dict(tuple(post.groupby("term", sort=False)))
    # a fresh per-call cache still pays off inside ONE query: the
    # ids-only intersection passes and the full pass hit the same blocks
    return _phrase_topk_from_terms(
        by_term, filter_ids, term_sets, idf_sum, avgdl, k, slop=slop,
        caches={},
    )


def _phrase_topk_from_terms(
    by_term: dict[str, pd.DataFrame],
    filter_ids: np.ndarray | None,
    term_sets: list[list[str]],
    idf_sum: float,
    avgdl: float,
    k: int,
    slop: int = 0,
    caches: dict[str, dict] | None = None,
) -> pd.DataFrame:
    """Core of one shard's positional top-k over an already-grouped
    term → posting-rows map (the batch kernel calls this directly,
    the way ``wand._topk_from_terms`` is shared).

    ``term_sets[i]`` is the set of terms acceptable at phrase position
    i — singletons for an exact phrase, and the prefix's expansion set
    at the last position for match_phrase_prefix (the Lucene
    MultiPhraseQuery shape).  A document is a candidate iff for EVERY
    position at least one of its terms is present; pf counts offsets p
    where position i matches some term of set i at p+i.

    ``slop > 0`` scores ordered proximity matches instead: pf becomes
    the sum of 1/(gap+1) over position-0 occurrences whose greedy
    in-order completion spans ≤ slop extra tokens (``_slop_matches``)."""
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "score": pd.Series([], dtype="float64")})
    if slop > 0:
        sm = _slop_matches(by_term, filter_ids, term_sets, slop, caches)
        if sm is None:
            return empty
        cand, dl_cand, doc_local, weights = sm
        pf = np.bincount(doc_local, weights=weights, minlength=cand.size)
    else:
        occ = _phrase_occurrences(by_term, filter_ids, term_sets, caches)
        if occ is None:
            return empty
        cand, dl_cand, running = occ
        pf = np.bincount(
            running >> 33, minlength=cand.size
        ).astype(np.float64)

    hit = pf > 0
    pfh = pf[hit]
    norm = K1 * (1.0 - B + B * dl_cand[hit] / avgdl)
    score = idf_sum * pfh / (pfh + norm)
    return _local_topk(cand[hit], score, k)


def _gather_positions(
    by_term: dict[str, pd.DataFrame],
    filter_ids: np.ndarray | None,
    term_sets: list[list[str]],
    caches: dict[str, dict] | None = None,
) -> tuple[np.ndarray, np.ndarray, list[list[str]],
           dict[str, tuple[np.ndarray, np.ndarray]]] | None:
    """Shared front half of every positional-sequence kernel: candidate
    docs (present in EVERY position's term set, post-filter) plus the
    decoded (local_doc, position) pairs of each surviving term.
    Returns (cand, dl_cand, present_sets, keys_of) or None when the
    shard cannot match.  ``caches`` maps term → its per-block decode
    cache (shared across the batch kernel's specs AND across this
    call's own ids-then-full passes)."""
    if filter_ids is not None and filter_ids.size == 0:
        return None
    # per position: the subset of its terms present in this shard
    present_sets: list[list[str]] = []
    for ts in term_sets:
        here = [t for t in ts if t in by_term]
        if not here:
            return None  # no acceptable term for this position here
        present_sets.append(here)

    def tcache(t: str) -> dict | None:
        return None if caches is None else caches.setdefault(t, {})

    def union_docs(ts: list[str], cand: np.ndarray | None) -> np.ndarray:
        parts = [
            _decode_blocks_pos(by_term[t], cand, want=1, cache=tcache(t))[0]
            for t in ts
        ]
        if len(parts) == 1:
            return parts[0]
        return np.unique(np.concatenate(parts))

    # 1. candidate intersection across positions, smallest set driving
    set_order = np.argsort([
        sum(int(by_term[t]["n"].sum()) for t in ts) for ts in present_sets
    ])
    cand = union_docs(present_sets[set_order[0]], None)
    if filter_ids is not None:
        cand = cand[np.isin(cand, filter_ids)]
    for si in set_order[1:]:
        if cand.size == 0:
            return None
        cand = cand[np.isin(cand, union_docs(present_sets[si], cand))]
    if cand.size == 0:
        return None

    # 2. per-term candidate positions (terms may repeat across
    # positions — decode once each) + doclen fill from any present term
    keys_of: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    dl_cand = np.zeros(cand.size, dtype=np.float64)
    for t in {t for ts in present_sets for t in ts}:
        d, tf, dl, flat, off = _decode_blocks_pos(
            by_term[t], cand, cache=tcache(t)
        )
        loc = np.searchsorted(d, cand)
        loc_c = np.minimum(loc, max(d.size - 1, 0))
        has = d[loc_c] == cand if d.size else np.zeros(cand.size, bool)
        dl_cand[has] = dl[loc_c[has]].astype(np.float64)
        sel = loc_c[has]
        counts = tf[sel].astype(np.int64)
        idx = _ragged_gather(off[sel], counts)
        pos = flat[idx]
        doc_local = np.repeat(
            np.flatnonzero(has).astype(np.int64), counts
        )
        keys_of[t] = (doc_local, pos)
    return cand, dl_cand, present_sets, keys_of


def _phrase_occurrences(
    by_term: dict[str, pd.DataFrame],
    filter_ids: np.ndarray | None,
    term_sets: list[list[str]],
    caches: dict[str, dict] | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Candidate docs + phrase-occurrence keys of one shard.  Returns
    (cand, dl_cand, running) where ``running`` holds one int64 key
    ``local_doc·2^33 + (start_pos + m)`` per phrase occurrence, or
    ``None`` when the shard cannot match."""
    g = _gather_positions(by_term, filter_ids, term_sets, caches)
    if g is None:
        return None
    cand, dl_cand, present_sets, keys_of = g
    m = len(term_sets)

    def position_keys(i: int) -> np.ndarray:
        parts = []
        for t in present_sets[i]:
            doc_t, pos_t = keys_of[t]
            parts.append(doc_t * (1 << 33) + (pos_t - i + m))
        if len(parts) == 1:
            return parts[0]  # already sorted (docs asc, pos asc)
        return np.sort(np.concatenate(parts))  # one token per offset ⇒ unique

    # 3. adjacency: intersect key sets shifted by phrase position
    running = position_keys(0)
    for i in range(1, m):
        if running.size == 0:
            return None
        keys_i = position_keys(i)
        loc = np.searchsorted(keys_i, running)
        loc_c = np.minimum(loc, max(keys_i.size - 1, 0))
        running = (
            running[keys_i[loc_c] == running] if keys_i.size else running[:0]
        )
    if running.size == 0:
        return None
    return cand, dl_cand, running


def _slop_matches(
    by_term: dict[str, pd.DataFrame],
    filter_ids: np.ndarray | None,
    term_sets: list[list[str]],
    slop: int,
    caches: dict[str, dict] | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray] | None:
    """Ordered proximity matches (span_near, in_order=true): for each
    occurrence of a position-0 term, later positions greedily take
    their SMALLEST matching offset strictly after the previous one —
    optimal for a fixed start (exchange argument: the greedy next
    offset minimizes the final span), so a start matches iff ANY
    in-order completion has gap = span − (m−1) ≤ slop.  Each match
    weighs 1/(gap+1) — Lucene's SloppyPhraseScorer slop factor — and
    slop=0 degenerates to the exact-phrase count.  Returns
    (cand, dl_cand, doc_local, weights) or None."""
    g = _gather_positions(by_term, filter_ids, term_sets, caches)
    if g is None:
        return None
    cand, dl_cand, present_sets, keys_of = g
    m = len(term_sets)

    def raw_keys(i: int) -> np.ndarray:
        parts = []
        for t in present_sets[i]:
            doc_t, pos_t = keys_of[t]
            parts.append(doc_t * (1 << 33) + pos_t)
        if len(parts) == 1:
            return parts[0]  # already sorted (docs asc, pos asc)
        return np.sort(np.concatenate(parts))  # one token per offset ⇒ unique

    cur = raw_keys(0)
    start = cur
    for i in range(1, m):
        if cur.size == 0:
            return None
        keys_i = raw_keys(i)
        if keys_i.size == 0:
            return None
        # smallest key of position i strictly after cur, same doc.
        # cur stays sorted: the next-after map is monotone nondecreasing.
        idx = np.searchsorted(keys_i, cur, side="right")
        ok = idx < keys_i.size
        nxt = keys_i[np.minimum(idx, keys_i.size - 1)]
        ok &= (nxt >> 33) == (cur >> 33)
        cur, start = nxt[ok], start[ok]
    if cur.size == 0:
        return None
    mask = (1 << 33) - 1
    gap = (cur & mask) - (start & mask) - (m - 1)
    keep = gap <= slop
    if not keep.any():
        return None
    return (
        cand,
        dl_cand,
        (start[keep] >> 33),
        1.0 / (gap[keep].astype(np.float64) + 1.0),
    )


def bm25_phrase_topk(
    spark: SparkSession,
    catalog,
    phrase: str,
    k: int = 10,
    slop: int = 0,
    lang: str | None = None,
    ts_lo=None,
    ts_hi=None,
) -> DataFrame:
    """Phrase BM25 top-k against a positional index
    (``build_index(..., positions=True)``).

    ``slop=0`` (default) is the exact phrase — Lucene match_phrase.
    ``slop>0`` is ordered proximity — span_near(in_order=true): the
    terms must appear in order with at most ``slop`` extra tokens
    between first and last; each match weighs 1/(gap+1) into the
    phrase frequency (Lucene's SloppyPhraseScorer slop factor).
    Unlike ES match_phrase's slop, reordered terms never match — the
    in-order semantics keep the kernel one vectorized greedy pass."""
    if slop < 0:
        raise ValueError(f"slop must be >= 0, got {slop}")
    snap = catalog.current_snapshot()
    if snap is None:
        raise ValueError("no committed snapshot in this catalog")
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

    term_sets = [[t] for t in terms]
    return _run_positional(
        spark, catalog, term_sets, idf_sum, avgdl, k, lang, ts_lo, ts_hi,
        slop=slop,
    )


_SPANS_SCHEMA = "doc_id long, pos int"


def phrase_spans(
    spark: SparkSession,
    catalog,
    phrase: str,
    lang: str | None = None,
    ts_lo=None,
    ts_hi=None,
) -> DataFrame:
    """Every occurrence of the exact phrase as (doc_id, pos) rows,
    ``pos`` the 0-based token offset of the phrase's first term — the
    passage-extraction primitive a training-data pipeline needs
    (retrieve matching windows, not just ranked doc ids).  Same one
    scan + one kernel pass as ``bm25_phrase_topk``; the kernel emits
    the adjacency join's surviving start offsets instead of folding
    them into phrase frequencies."""
    return _phrase_spans_df(
        spark, catalog, phrase, lang, ts_lo, ts_hi
    ).orderBy("doc_id", "pos")


def _phrase_spans_df(
    spark: SparkSession,
    catalog,
    phrase: str,
    lang: str | None = None,
    ts_lo=None,
    ts_hi=None,
) -> DataFrame:
    """``phrase_spans`` without the final global sort — the join-side
    form ``passages`` consumes."""
    snap = catalog.current_snapshot()
    if snap is None:
        raise ValueError("no committed snapshot in this catalog")
    if not snap.get("positions", False):
        raise ValueError(
            "phrase queries need a positional index — rebuild with "
            "build_index(..., positions=True)"
        )
    stemming = snap.get("stemming", True)
    terms = analyze_str(phrase, StemCache() if stemming else None,
                        tokenizer=snap.get("tokenizer", "simple"))
    empty = spark.createDataFrame([], _SPANS_SCHEMA)
    if not terms:
        return empty
    idfs = idf_map(spark, catalog, list(dict.fromkeys(terms)))
    if len(idfs) < len(set(terms)):
        return empty
    term_sets = [[t] for t in terms]
    m = len(term_sets)
    mask = (1 << 33) - 1

    def emit(post_pdf: pd.DataFrame, fids: np.ndarray | None) -> pd.DataFrame:
        out_empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                  "pos": pd.Series([], dtype="int32")})
        if post_pdf.empty:
            return out_empty
        by_term = dict(tuple(post_pdf.groupby("term", sort=False)))
        occ = _phrase_occurrences(by_term, fids, term_sets, caches={})
        if occ is None:
            return out_empty
        cand, _, running = occ
        return pd.DataFrame({
            "doc_id": cand[(running >> 33)].astype(np.int64),
            "pos": ((running & mask) - m).astype(np.int32),
        })

    return _shard_kernel_job(
        spark, catalog, sorted(set(terms)), emit, _SPANS_SCHEMA,
        lang, ts_lo, ts_hi, cols=_PHRASE_COLS,
    )


_PASSAGE_SCHEMA = "doc_id long, pos int, passage string"


def passages(
    spark: SparkSession,
    catalog,
    docs: DataFrame,
    phrase: str,
    window: int = 10,
    lang: str | None = None,
    ts_lo=None,
    ts_hi=None,
) -> DataFrame:
    """Every occurrence of the exact phrase as a context window of
    surface text: (doc_id, pos, passage) where ``passage`` is the
    ``window`` tokens either side of the match, space-joined — the
    retrieve-matching-windows-with-context primitive of a training-data
    pipeline (the index stores positions, not text, so the caller
    passes the document table).

    One spans job (``phrase_spans``' pruned scan + kernel) → equi-join
    with ``docs`` on doc_id (only matched documents' text moves) → one
    mapInPandas pass that re-tokenizes each matched document ONCE with
    the snapshot's tokenizer and slices [pos−window, pos+m−1+window].
    Surface ordinals equal index ordinals because analysis is
    positionally 1:1 — stemming maps token→stem in place and stopwords
    are indexed, never dropped — so the slice needs no stemmer."""
    if window < 0:
        raise ValueError(f"window must be >= 0, got {window}")
    snap = catalog.current_snapshot()
    if snap is None:
        raise ValueError("no committed snapshot in this catalog")
    tokenizer = snap.get("tokenizer", "simple")
    m = len(analyze_str(phrase, None, tokenizer=tokenizer))
    spans = _phrase_spans_df(spark, catalog, phrase, lang, ts_lo, ts_hi)
    joined = spans.join(docs.select("doc_id", "text"), "doc_id")

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            parts = []
            for doc_id, g in pdf.groupby("doc_id", sort=False):
                toks = analyze_str(
                    g["text"].iloc[0], None, tokenizer=tokenizer
                )
                for pos in g["pos"]:
                    lo = max(0, int(pos) - window)
                    parts.append((
                        int(doc_id), int(pos),
                        " ".join(toks[lo:int(pos) + m + window]),
                    ))
            if parts:
                yield pd.DataFrame(
                    parts, columns=["doc_id", "pos", "passage"]
                )

    return (
        joined.mapInPandas(gen, schema=_PASSAGE_SCHEMA)
        .orderBy("doc_id", "pos")
    )


def _run_positional(
    spark, catalog, term_sets, idf_sum, avgdl, k, lang, ts_lo, ts_hi,
    slop: int = 0,
) -> DataFrame:
    """Shared execution of a positional sequence query: one pruned scan
    over the union of all positions' terms, per-shard kernel, global
    merge."""
    all_terms = sorted({t for ts in term_sets for t in ts})
    local = _shard_kernel_job(
        spark, catalog, all_terms,
        lambda post_pdf, fids: _phrase_topk_shard(
            post_pdf, fids, term_sets, idf_sum, avgdl, k, slop
        ),
        _RESULT_SCHEMA, lang, ts_lo, ts_hi, cols=_PHRASE_COLS,
    )
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def expand_prefix(
    spark: SparkSession, catalog, prefix: str, max_expansions: int = 50
) -> list[str]:
    """The lexicographically-first ``max_expansions`` index terms with
    the given prefix — deterministic (Lucene expands in term-dictionary
    order, which IS lexicographic).  ``startswith`` is a parquet-
    pushable filter (StringStartsWith) against the term_stats scan."""
    rows = (
        catalog.read_snapshot(spark, "term_stats")
        .where(F.col("term").startswith(prefix))
        .orderBy("term")
        .limit(max_expansions)
        .select("term")
        .collect()
    )
    return [r["term"] for r in rows]


def expand_prefixes(
    spark: SparkSession, catalog, reqs: dict[str, int]
) -> dict[str, list[str]]:
    """Resolve MANY prefixes in ONE term_stats scan (the batch form of
    ``expand_prefix`` — N driver-side jobs collapse to one): the scan
    filters on the OR of the pushed ``startswith`` predicates, a tiny
    broadcast prefix table joins each surviving term to the prefixes it
    extends, and a per-prefix window keeps the lexicographically-first
    ``reqs[prefix]`` terms, so the collect stays bounded by
    Σ max_expansions."""
    if not reqs:
        return {}
    from pyspark.sql import Window

    cond = None
    for p in sorted(reqs):
        c = F.col("term").startswith(p)
        cond = c if cond is None else (cond | c)
    pf = spark.createDataFrame(
        [(p, n) for p, n in sorted(reqs.items())], "prefix string, mx int"
    )
    t = catalog.read_snapshot(spark, "term_stats").where(cond).select("term")
    w = Window.partitionBy("prefix").orderBy("term")
    rows = (
        t.join(F.broadcast(pf), F.col("term").startswith(F.col("prefix")))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.col("mx"))
        .select("prefix", "term")
        .collect()
    )
    out: dict[str, list[str]] = {p: [] for p in reqs}
    for r in rows:
        out[r["prefix"]].append(r["term"])
    for p in out:
        out[p].sort()
    return out


def bm25_phrase_prefix_topk(
    spark: SparkSession,
    catalog,
    phrase: str,
    k: int = 10,
    max_expansions: int = 50,
    slop: int = 0,
    lang: str | None = None,
    ts_lo=None,
    ts_hi=None,
) -> DataFrame:
    """match_phrase_prefix (search-as-you-type): the LAST token of
    ``phrase`` is a prefix; it expands to the lexicographically-first
    ``max_expansions`` index terms (ES match_phrase_prefix semantics,
    default cap 50), and a document matches where the fixed terms are
    followed by ANY expansion — Lucene's MultiPhraseQuery.  Scoring
    follows MultiPhraseWeight: idf is summed over the fixed positions
    AND every expansion's term statistics; tf is the match count.

    The prefix is lowercased but NOT stemmed — expansions match raw
    index terms (on a stemmed index they are stems), mirroring how ES
    keyword-expands against the term dictionary rather than analyzing
    the fragment.  ``slop`` as in ``bm25_phrase_topk`` (ordered
    proximity; the expansion set is still the last position)."""
    if slop < 0:
        raise ValueError(f"slop must be >= 0, got {slop}")
    snap = catalog.current_snapshot()
    if snap is None:
        raise ValueError("no committed snapshot in this catalog")
    if not snap.get("positions", False):
        raise ValueError(
            "phrase queries need a positional index — rebuild with "
            "build_index(..., positions=True)"
        )
    avgdl = snap["avgdl"]
    stemming = snap.get("stemming", True)
    tokens = analyze_str(phrase, None, tokenizer=snap.get("tokenizer", "simple"))
    empty = spark.createDataFrame([], _RESULT_SCHEMA)
    if not tokens:
        return empty
    prefix = tokens[-1]
    fixed_surface = tokens[:-1]
    if stemming:
        cache = StemCache()
        fixed = [cache(t) for t in fixed_surface]
    else:
        fixed = fixed_surface
    expansions = expand_prefix(spark, catalog, prefix, max_expansions)
    if not expansions:
        return empty
    idfs = idf_map(spark, catalog, list(dict.fromkeys(fixed + expansions)))
    # membership, not a count: idfs also holds the expansions, so a
    # df=0 FIXED term would otherwise slip past a size comparison
    if any(t not in idfs for t in fixed):
        return empty  # a fixed term with df=0 kills the query
    # MultiPhraseWeight: one TermStatistics entry per fixed position
    # plus one per expansion — a fixed term that is also an expansion
    # counts in both sums
    idf_sum = float(
        sum(idfs[t] for t in fixed)
        + sum(idfs[t] for t in expansions if t in idfs)
    )
    if not fixed:
        # bare prefix: a 1-position sequence over the expansion set
        term_sets = [expansions]
    else:
        term_sets = [[t] for t in fixed] + [expansions]
    return _run_positional(
        spark, catalog, term_sets, idf_sum, avgdl, k, lang, ts_lo, ts_hi,
        slop=slop,
    )

"""Batch multi-query engine (query/batch.py): exact rank identity with
the single-query block-max engine across the full reference query set
— AND, OR, stopword-tier, absent-term, lang-filtered and ts-filtered
queries all evaluated in ONE batch call, compared per query against
``bm25_topk_blockmax``.  The batch kernel runs the same
``_topk_from_terms`` code per query; the only batch-specific state is
the shared block-decode cache, so identity here gates that cache.
"""

import math

import pandas as pd
import pytest

from datamart_spark.corpus import generate_documents, generate_queries
from datamart_spark.index import IndexCatalog, build_index
from datamart_spark.query import bm25_topk_batch, bm25_topk_blockmax

N_DOCS = 1200
K = 10


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("batch_index"))
    catalog = IndexCatalog(root)
    docs = generate_documents(spark, N_DOCS)
    build_index(docs, catalog, n_shards=8)
    return catalog


def _specs(or_ids=()):
    """Reference query set → batch spec dicts (heterogeneous filters)."""
    out = []
    for _, q in generate_queries().iterrows():
        out.append(
            {
                "query_id": f"q{q['query_id']:02d}",
                "query": q["query"],
                "or_mode": int(q["query_id"]) in set(or_ids),
                "lang": q["lang_filter"] if isinstance(q["lang_filter"], str) else None,
                "ts_lo": q["ts_lo"] if pd.notna(q["ts_lo"]) else None,
                "ts_hi": q["ts_hi"] if pd.notna(q["ts_hi"]) else None,
            }
        )
    return out


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_batch_rank_identity_full_query_set(built, spark):
    catalog = built
    # a third of the set in OR mode, incl. absent-term + filtered ids,
    # so both kernel modes run against the shared decode caches
    or_ids = (1, 21, 26, 31, 36, 41, 45, 47, 49)
    specs = _specs(or_ids)
    batched = bm25_topk_batch(spark, catalog, specs, k=K).collect()
    by_qid: dict[str, list] = {}
    for r in batched:
        by_qid.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))

    for s in specs:
        want = _rows(
            bm25_topk_blockmax(
                spark,
                catalog,
                s["query"],
                k=K,
                lang=s["lang"],
                ts_lo=s["ts_lo"],
                ts_hi=s["ts_hi"],
                or_mode=s["or_mode"],
            )
        )
        got = by_qid.get(s["query_id"], [])
        assert len(got) == len(want), (s, got, want)
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gd == wd, (s, got, want)
            assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-12), (s, gd, gs, ws)


def test_filter_stats_cache_skips_dead_session_handles(built, spark):
    """Evicting a _DS_CACHE entry from a PREVIOUS SparkSession must not
    touch its dead JVM handle (unpersist on a stopped context NPEs —
    it failed the first filtered query of every new session in a
    multi-session process until guarded)."""
    from datamart_spark.query import bm25

    class DeadHandle:
        def unpersist(self):
            raise RuntimeError("unpersist reached a stopped session's handle")

    catalog = built
    # eviction runs only on a cache miss: drop live entries (unpersist
    # is safe for them — same session) so the lookup below misses
    for k in list(bm25._DS_CACHE):
        bm25._DS_CACHE.pop(k).unpersist()
    stale_key = ("app-from-stopped-session", catalog.root, -1, 0.0)
    bm25._DS_CACHE[stale_key] = DeadHandle()
    try:
        out = bm25_topk_batch(
            spark, catalog, [{"query_id": "x", "query": "the", "lang": "en"}], k=5
        ).collect()
        assert stale_key not in bm25._DS_CACHE  # evicted without unpersist
        assert out  # and the filtered query itself worked
    finally:
        bm25._DS_CACHE.pop(stale_key, None)


def test_batch_empty_and_edge_inputs(built, spark):
    catalog = built
    # all-absent AND, all-absent OR, empty-analysis query → zero rows
    specs = [
        {"query_id": "a", "query": "zzzneverseen qqqneverseen"},
        {"query_id": "b", "query": "zzzneverseen", "or_mode": True},
        {"query_id": "c", "query": "    "},
    ]
    assert bm25_topk_batch(spark, catalog, specs, k=K).count() == 0
    assert bm25_topk_batch(spark, catalog, [], k=K).count() == 0


def test_search_many_hydrates_and_matches_search(built, spark):
    """search_many = per-query search(): same hits, same metadata."""
    from datamart_spark.corpus import _VOCAB
    from datamart_spark.query import search, search_many

    catalog = built
    q = f"the {_VOCAB[60]}"
    specs = [
        {"query_id": "a", "query": q},
        {"query_id": "b", "query": q, "lang": "de"},
    ]
    out = search_many(spark, catalog, specs, k=K).collect()
    assert out and set(out[0].asDict()) == {
        "query_id", "doc_id", "url", "lang", "warc_ts", "score"
    }
    for s in specs:
        want = [
            (r["doc_id"], r["url"], r["lang"], r["score"])
            for r in search(spark, catalog, s["query"], k=K,
                            lang=s.get("lang")).collect()
        ]
        got = [
            (r["doc_id"], r["url"], r["lang"], r["score"])
            for r in out
            if r["query_id"] == s["query_id"]
        ]
        assert got == want, s
    assert all(r["lang"] == "de" for r in out if r["query_id"] == "b")


def test_batch_single_query_matches(built, spark):
    """A 1-query batch is the single-query engine with a query_id."""
    from datamart_spark.corpus import _VOCAB

    catalog = built
    q = f"the {_VOCAB[60]}"  # stopword-tier + mid-frequency term
    specs = [{"query_id": "only", "query": q, "lang": "en"}]
    got = _rows(bm25_topk_batch(spark, catalog, specs, k=K).drop("query_id"))
    want = _rows(bm25_topk_blockmax(spark, catalog, q, k=K, lang="en"))
    assert got and got == want


def test_batch_rejects_duplicate_query_ids(built, spark):
    """Two queries sharing a query_id would silently merge their top-k
    lists into one wrong ranking — reject at the driver."""
    with pytest.raises(ValueError, match="duplicate query_id"):
        bm25_topk_batch(
            spark,
            built,
            [{"query_id": "a", "query": "the"},
             {"query_id": "a", "query": "data"}],
            k=5,
        )


def test_generated_query_set_deterministic_and_mixed():
    """generate_query_set(n): the bulk-labeling workload generator —
    deterministic, reference-set mix proportions at any n, and NOT a
    repeat of the 50-query reference set."""
    from datamart_spark.corpus import generate_query_set

    a = generate_query_set(100)
    b = generate_query_set(100)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 100
    assert list(a.columns) == [
        "query_id", "query", "lang_filter", "ts_lo", "ts_hi"
    ]
    assert int(a["lang_filter"].notna().sum()) == 30
    assert int(a["ts_lo"].notna().sum()) == 20
    assert sum(
        q.split()[-1].startswith("zzzunseen") for q in a["query"]
    ) == 10
    # 40% single / 30% two-term / 20% three-term mix (absent-term rows
    # are two tokens: real term + unseen sentinel)
    n_terms = a["query"].str.split().str.len()
    assert int((n_terms == 1).sum()) == 40
    assert int((n_terms == 3).sum()) == 20
    # independent draws, not the reference set re-sliced
    assert set(a["query"]) != set(generate_queries()["query"])
    # a different n gives a different (still deterministic) draw
    assert list(generate_query_set(20)["query"]) != list(a["query"][:20])


def test_generated_batch_rank_identity_sample(built, spark):
    """A generated 100-query batch through ONE bm25_topk_batch call is
    rank-identical to the single-query engine (spot-checked on every
    8th query, covering all four shape slices + both filter kinds)."""
    from datamart_spark.corpus import generate_query_set

    catalog = built
    specs = []
    for _, q in generate_query_set(100).iterrows():
        specs.append(
            {
                "query_id": f"g{int(q['query_id']):03d}",
                "query": q["query"],
                "lang": q["lang_filter"]
                if isinstance(q["lang_filter"], str) else None,
                "ts_lo": q["ts_lo"] if pd.notna(q["ts_lo"]) else None,
                "ts_hi": q["ts_hi"] if pd.notna(q["ts_hi"]) else None,
            }
        )
    batched = bm25_topk_batch(spark, catalog, specs, k=K).collect()
    by_qid: dict[str, list] = {}
    for r in batched:
        by_qid.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for s in specs[::8]:
        want = _rows(
            bm25_topk_blockmax(
                spark, catalog, s["query"], k=K, lang=s["lang"],
                ts_lo=s["ts_lo"], ts_hi=s["ts_hi"],
            )
        )
        got = by_qid.get(s["query_id"], [])
        assert len(got) == len(want), (s, got, want)
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gd == wd, (s, got, want)
            assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-12)

"""Incremental/partial builds (north rule: resumable from checkpoint
with per-partition lineage) and the top-level search facade."""

import pytest

from datamart_spark.corpus import generate_documents, generate_documents_pandas, _VOCAB
from datamart_spark.index import IndexCatalog, build_index
from datamart_spark.query import bm25_topk_blockmax, search
from datamart_spark.query.bm25_oracle import Bm25Oracle

N = 800


def test_partial_build_then_resume_equals_full(spark, tmp_path):
    docs = generate_documents(spark, N)

    # reference build in one shot
    full_cat = IndexCatalog(str(tmp_path / "full"))
    build_index(docs, full_cat, n_shards=6, resume=False)

    # incremental: shards {0,1,2} then resume for the rest
    inc_cat = IndexCatalog(str(tmp_path / "inc"))
    m1 = build_index(docs, inc_cat, n_shards=6, only_shards=[0, 1, 2])
    assert m1["built_shards_this_run"] == [0, 1, 2]
    assert set(m1["shards"]) == {"0", "1", "2"}  # lineage shows partial state

    m2 = build_index(docs, inc_cat)  # resume fills 3..5, reuses tokens checkpoint
    assert m2["built_shards_this_run"] == [3, 4, 5]
    assert set(m2["shards"]) == {str(i) for i in range(6)}
    assert "analyze_tokens" not in m2["phase_seconds"]  # checkpoint reused

    # same index contents: every query term set agrees with the full build
    q = f"{_VOCAB[40]} {_VOCAB[300]}"
    a = [(r["doc_id"], round(r["score"], 9))
         for r in bm25_topk_blockmax(spark, full_cat, q, k=20).collect()]
    b = [(r["doc_id"], round(r["score"], 9))
         for r in bm25_topk_blockmax(spark, inc_cat, q, k=20).collect()]
    assert a == b and len(a) > 0

    # per-shard lineage metrics match the full build's
    assert m2["shards"] == build_index(docs, full_cat)["shards"]


def test_search_facade(spark, tmp_path):
    docs = generate_documents(spark, N)
    cat = IndexCatalog(str(tmp_path / "s"))
    build_index(docs, cat, n_shards=4, resume=False)
    oracle = Bm25Oracle(generate_documents_pandas(N)[["doc_id", "text", "lang", "warc_ts"]])

    q = f"{_VOCAB[45]} {_VOCAB[120]}"
    res = search(spark, cat, q, k=10).collect()
    assert 0 < len(res) <= 10
    assert list(res[0].asDict()) == ["doc_id", "url", "lang", "warc_ts", "score"]
    want = oracle.topk(q, k=10)
    assert [(r["doc_id"], round(r["score"], 9)) for r in res] == [
        (d, round(s, 9)) for d, s in want
    ]
    # hydrated url matches the corpus row
    pdf = generate_documents_pandas(N)
    for r in res:
        assert r["url"] == pdf.iloc[r["doc_id"]]["url"]

    # filtered search
    res_de = search(spark, cat, _VOCAB[45], k=10, lang="de").collect()
    assert all(r["lang"] == "de" for r in res_de)

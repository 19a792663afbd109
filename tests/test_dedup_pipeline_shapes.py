"""dedup_pipeline dispatches between two physical shapes on corpus
size (suite/textfns.py): the fused single-job plan for small corpora
and the staged (checkpointed-signature, vocabulary-hashed,
array-intersect-verify) plan for large ones.  The driver's oracle gate
only ever exercises the small shape at its SFs, so this test pins the
two shapes to byte-identical results on the same data — the staged
plan inherits the oracle gate transitively."""

import pytest

from datamart_spark.suite.textfns import (
    _corpus_rows,
    _dedup_pipeline_fused,
    _dedup_pipeline_staged,
)


@pytest.mark.parametrize("sf_dir", [
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
])
def test_fused_and_staged_shapes_identical(spark, sf_dir):
    a = [tuple(r) for r in _dedup_pipeline_fused(spark, sf_dir).collect()]
    b = [tuple(r) for r in _dedup_pipeline_staged(spark, sf_dir).collect()]
    assert len(a) > 0
    assert a == b


def test_corpus_rows_metadata():
    n = _corpus_rows("/root/testdata/sf0.01")
    assert n is not None and 500 <= n
    assert _corpus_rows("/root/testdata/sf0.01", "nope") is None

"""Varbyte + delta codec round-trip properties."""

import numpy as np
from hypothesis import given, settings, strategies as st

from datamart_spark.index.varbyte import (
    delta_decode,
    delta_encode,
    decode_postings,
    encode_postings,
    vb_decode,
    vb_encode,
)


def test_empty():
    assert vb_encode(np.array([], dtype=np.uint64)) == b""
    assert vb_decode(b"").size == 0


def test_small_values():
    v = np.array([0, 1, 127, 128, 255, 16383, 16384], dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(v)), v)


def test_single_byte_for_small():
    assert len(vb_encode(np.array([5], dtype=np.uint64))) == 1
    assert len(vb_encode(np.array([127], dtype=np.uint64))) == 1
    assert len(vb_encode(np.array([128], dtype=np.uint64))) == 2


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=500))
@settings(max_examples=200, deadline=None)
def test_vb_roundtrip(values):
    v = np.array(values, dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(v)), v)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True)
)
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(doc_ids):
    d = np.sort(np.array(doc_ids, dtype=np.uint64))
    assert np.array_equal(delta_decode(delta_encode(d)), d)


def test_postings_roundtrip():
    d = np.sort(np.random.RandomState(0).choice(10**6, size=1000, replace=False)).astype(
        np.uint64
    )
    tf = np.random.RandomState(1).randint(1, 100, size=1000).astype(np.uint64)
    dvb, tvb = encode_postings(d, tf)
    d2, tf2 = decode_postings(dvb, tvb)
    assert np.array_equal(d, d2)
    assert np.array_equal(tf, tf2)
    # compression actually compresses: gaps of ~1000 fit in 2 bytes
    assert len(dvb) < 8 * len(d) / 2


def test_default_n_shards_parallelism_floor():
    """VERDICT r4 #7: mid-size corpora must fill the cluster's task
    slots (2M docs at the bare 8-shard floor idled half a 16-slot
    machine through the encode phase), while tiny corpora keep few
    shards (fragmenting terms across O(slots) shards was measured 5x
    slower at 20k docs) and huge corpora stay governed by the
    ~250k-docs/shard ceil term."""
    from datamart_spark.index.build import default_n_shards

    assert default_n_shards(20_000) == 8
    assert default_n_shards(20_000, parallelism=16) == 8   # tiny: unchanged
    assert default_n_shards(200_000, parallelism=16) == 8  # bench size: unchanged
    assert default_n_shards(500_000, parallelism=16) == 16
    assert default_n_shards(2_000_000, parallelism=16) == 16
    assert default_n_shards(5_000_000, parallelism=16) == 20  # ceil governs
    assert default_n_shards(10**9, parallelism=16) == 4000
    # a grown snapshot pins shard_width, so this floor only applies to
    # FRESH builds (n_shards=None path) - monotone in n_docs either way
    assert default_n_shards(10**12, parallelism=16_000) == 4_000_000

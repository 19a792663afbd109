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
    # ceil gives 20 -> rounded up to even 2x16 waves (no 4-task tail)
    assert default_n_shards(5_000_000, parallelism=16) == 32
    assert default_n_shards(10**9, parallelism=16) == 4000
    # a grown snapshot pins shard_width, so this floor only applies to
    # FRESH builds (n_shards=None path) - monotone in n_docs either way
    assert default_n_shards(10**12, parallelism=16_000) == 4_000_000


def test_encode_partitioning_exact_assignment(spark):
    """The driver-computed salt map must place every shard in its own
    task: pmod(murmur3(salt), n) enumerates 0..n-1 (the 5M-doc hash
    placement put 4 whole shards in one task, NOTES_SCALING r5).
    (spark fixture: the map expression needs an active SparkContext)"""
    from datamart_spark.index.build import (
        _EXACT_ASSIGN_MAX,
        _murmur3_int,
        encode_partitioning,
    )

    for todo in ([0], list(range(20)), list(range(7, 40)), [3, 99, 1000]):
        n, _expr = encode_partitioning(todo, 16)
        assert n == len(todo)
    # beyond the bound: plain hash partitioning with 2x buckets
    big = list(range(_EXACT_ASSIGN_MAX + 1))
    n, _ = encode_partitioning(big, 16)
    assert n == 2 * len(big)
    # the salt search itself: ranks are a permutation of 0..n-1
    needed = {}
    k = 0
    while len(needed) < 20:
        r = _murmur3_int(k) % 20
        needed.setdefault(r, k)
        k += 1
    assert sorted(needed) == list(range(20))


def test_murmur3_matches_spark_hash(spark):
    from pyspark.sql import functions as F

    from datamart_spark.index.build import _murmur3_int

    rows = (
        spark.range(-50, 1000, 37)
        .select(F.col("id").cast("int").alias("v"),
                F.hash(F.col("id").cast("int")).alias("h"))
        .collect()
    )
    assert rows and all(_murmur3_int(r.v) == r.h for r in rows)


def test_encode_partitioning_places_one_shard_per_task(spark):
    from pyspark.sql import functions as F

    from datamart_spark.index.build import encode_partitioning

    todo = list(range(20))
    n, expr = encode_partitioning(todo, 16)
    df = spark.range(200_000).select((F.col("id") % 20).cast("int").alias("shard"))
    got = (
        df.repartition(n, expr)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count_distinct("shard").alias("nsh"))
        .collect()
    )
    assert len(got) == 20 and all(r.nsh == 1 for r in got)

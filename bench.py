"""Benchmark driver: index-build throughput at two parallelism levels
(the sandbox stand-in for N vs 4N executors — BASELINE.json north rule),
BM25 top-10 p50 latency over the reference query set, and headline
suite queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "index_build": {...}, "scaling": {...}, "bm25_p50_sec": ...}

and refreshes BENCH/BASELINE.md with the scaling table.

Method notes:
- the corpus is materialized to parquet ONCE (outside timing) — the
  timed job is read-parquet → analyze → shuffle → encode → write,
  matching "index an existing documents table";
- the two builds run in fresh SparkSessions (local[8], local[32]) on
  the SAME input; efficiency = (t8/t32) / (32/8);
- p50 latency is per-query wall time of the block-max path, median
  over the 50-query reference set.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "300000"))
# Scaling pair: a local[N] job with Arrow UDF stages runs N JVM task
# threads + N python workers concurrently — effective CPU need ≈ 2N.
# On this 32-core box the largest honest 4× pair is therefore
# local[4] vs local[16] (needs 8 vs 32 cores); local[8]→local[32]
# oversubscribes the high end 2× and systematically under-measures it.
HIGH_CPUS = int(os.environ.get("SPARK_GRAFT_BENCH_HIGH_CPUS", "16"))
LOW_CPUS = int(os.environ.get("SPARK_GRAFT_BENCH_LOW_CPUS", "4"))
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
CORPUS_DIR = os.environ.get("SPARK_GRAFT_BENCH_CORPUS", f"/tmp/bench_corpus_{N_DOCS}")
WORK_DIR = "/tmp/bench_index"

HEADLINE = [
    "bm25_two_term_and",
    "bm25_lang_filtered",
    "term_stats_top",
    "dedup_exact",
    "minhash_lsh_pairs",
    "groupby_flag_status",
    "join_left_agg",
    "cosine_topk",
    "window_top3_per_priority",
]


def _session(cpus: int, name: str):
    from datamart_spark.session import get_spark

    return get_spark(
        name,
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )


def materialize_corpus() -> None:
    if os.path.isdir(CORPUS_DIR) and os.path.exists(f"{CORPUS_DIR}/_SUCCESS"):
        return
    from datamart_spark.corpus import generate_documents

    spark = _session(CPUS, "bench_gen")
    generate_documents(spark, N_DOCS, partitions=CPUS).write.mode("overwrite").parquet(
        CORPUS_DIR
    )
    spark.stop()


def timed_build(cpus: int) -> tuple[float, dict]:
    from datamart_spark.index import IndexCatalog, build_index

    spark = _session(cpus, f"bench_build_{cpus}")
    root = f"{WORK_DIR}_{cpus}"
    shutil.rmtree(root, ignore_errors=True)
    catalog = IndexCatalog(root)
    docs = spark.read.parquet(CORPUS_DIR)
    t0 = time.time()
    manifest = build_index(docs, catalog, resume=False, n_docs=N_DOCS)
    elapsed = time.time() - t0
    spark.stop()
    return elapsed, manifest


def query_p50(cpus: int) -> float:
    import pandas as pd

    from datamart_spark.corpus import generate_queries
    from datamart_spark.index import IndexCatalog
    from datamart_spark.query import bm25_topk_blockmax

    spark = _session(cpus, "bench_query")
    catalog = IndexCatalog(f"{WORK_DIR}_{cpus}")
    queries = generate_queries()
    lat = []
    for _, q in queries.iterrows():
        lang = q["lang_filter"] if isinstance(q["lang_filter"], str) else None
        ts_lo = q["ts_lo"] if pd.notna(q["ts_lo"]) else None
        ts_hi = q["ts_hi"] if pd.notna(q["ts_hi"]) else None
        t0 = time.time()
        bm25_topk_blockmax(
            spark, catalog, q["query"], k=10, lang=lang, ts_lo=ts_lo, ts_hi=ts_hi
        ).collect()
        lat.append(time.time() - t0)
    spark.stop()
    return statistics.median(lat)


def run_headline(sf_dir: str) -> dict[str, float]:
    from datamart_spark.suite import REGISTRY

    spark = _session(CPUS, "bench_suite")
    out = {}
    for name in HEADLINE:
        t0 = time.time()
        REGISTRY[name](spark, sf_dir).collect()
        out[name] = round(time.time() - t0, 3)
    spark.stop()
    return out


def write_baseline_md(result: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    s = result["scaling"]
    ib = result["index_build"]
    hi = s["high_cpus"]
    lo = s["low_cpus"]
    md = f"""# BENCH/BASELINE — measured numbers (local-mode stand-in)

North rule: indexing-throughput scaling efficiency >= 0.8 between two
cluster sizes (N vs 4N executors); sandbox evidence = same job, same
input, local[{lo}] vs local[{hi}] (4x task slots; each slot drives one
JVM task thread + one Arrow python worker, so the pair needs {2*lo} vs
{2*hi} of the machine's 32 cores — the largest honest 4x pair here).
Min of {REPEATS} alternating repetitions per level (shared-host noise).

## Index build ({N_DOCS} docs, corpus parquet -> postings+stats tables)

| parallelism | build sec | docs/sec |
|---|---|---|
| local[{lo}] | {s['t_low_sec']:.1f} | {s['docs_per_sec_low']:.0f} |
| local[{hi}] | {s['t_high_sec']:.1f} | {s['docs_per_sec_high']:.0f} |

**Scaling efficiency = (T{lo}/T{hi}) / ({hi}/{lo}) =
{s['efficiency']:.3f}** (target >= 0.8)

Index stats: avgdl={ib['avgdl']:.1f}, shards={ib['n_shards']},
postings={ib['total_postings']}, blocks={ib['total_blocks']}.

## BM25 top-10 query latency (50-query reference set, local[{hi}])

p50 = {result['bm25_p50_sec']:.3f} s/query (block-max DAAT kernel path).

## Headline suite queries @ {result['sf']}

| query | sec |
|---|---|
""" + "\n".join(f"| {k} | {v:.3f} |" for k, v in result["queries"].items()) + "\n"
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)


def main() -> None:
    t_total0 = time.time()
    materialize_corpus()

    # alternate levels, take min per level — the sandbox shares the host,
    # so single measurements carry noisy-neighbor variance
    t_lows, t_highs = [], []
    manifest = None
    for _ in range(REPEATS):
        tl, _ = timed_build(LOW_CPUS)
        th, manifest = timed_build(HIGH_CPUS)
        t_lows.append(tl)
        t_highs.append(th)
    t_low, t_high = min(t_lows), min(t_highs)
    p50 = query_p50(HIGH_CPUS)
    queries = run_headline(SF_DIR)

    eff = (t_low / t_high) / (HIGH_CPUS / LOW_CPUS)
    total_postings = sum(v["postings"] for v in manifest["shards"].values())
    total_blocks = sum(v["blocks"] for v in manifest["shards"].values())
    result = {
        "metric": "index_build_and_query_suite",
        "value": round(time.time() - t_total0, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("/")[-1],
        "index_build": {
            "n_docs": N_DOCS,
            "avgdl": manifest["avgdl"],
            "n_shards": manifest["n_shards"],
            "total_postings": total_postings,
            "total_blocks": total_blocks,
        },
        "scaling": {
            "low_cpus": LOW_CPUS,
            "high_cpus": HIGH_CPUS,
            "t_low_sec": round(t_low, 3),
            "t_high_sec": round(t_high, 3),
            "docs_per_sec_low": round(N_DOCS / t_low, 1),
            "docs_per_sec_high": round(N_DOCS / t_high, 1),
            "efficiency": round(eff, 3),
        },
        "bm25_p50_sec": round(p50, 4),
    }
    write_baseline_md(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Profile the index build at one parallelism level, printing phase times.

Usage: python tools/profile_build.py <cpus> [n_docs]
"""
import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

cpus = int(sys.argv[1])
n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000

from datamart_spark.session import get_spark
from datamart_spark.index import IndexCatalog, build_index

spark = get_spark(f"profile_{cpus}", master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
root = f"/tmp/profile_index_{cpus}"
shutil.rmtree(root, ignore_errors=True)
catalog = IndexCatalog(root)
docs = spark.read.parquet(f"/tmp/bench_corpus_{n_docs}")
t0 = time.time()
manifest = build_index(docs, catalog, resume=False, n_docs=n_docs)
elapsed = time.time() - t0
print(json.dumps({"cpus": cpus, "elapsed": round(elapsed, 2),
                  "phases": manifest["phase_seconds"]}))
spark.stop()

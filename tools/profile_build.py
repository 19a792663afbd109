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

import os as _os
_extra = {}
if _os.environ.get("PROFILE_EVENTLOG"):
    _os.makedirs("/tmp/spark-events", exist_ok=True)
    _extra = {"spark.eventLog.enabled": "true", "spark.eventLog.dir": "/tmp/spark-events",
              "spark.eventLog.compress": "false", "spark.eventLog.rolling.enabled": "false"}
spark = get_spark(f"profile_{cpus}", master=f"local[{cpus}]", shuffle_partitions=2 * cpus, extra_conf=_extra)
root = f"/tmp/profile_index_{cpus}"
shutil.rmtree(root, ignore_errors=True)
catalog = IndexCatalog(root)
docs = spark.read.parquet(f"/tmp/bench_corpus_{n_docs}")

# warm-up: spawn + import-load every python worker (JVM task slots x
# Arrow workers), JIT the shuffle+parquet write paths — none of this is
# per-build work on a long-lived cluster
from pyspark.sql import functions as F
warm_cat = IndexCatalog(f"/tmp/_warm_index_{cpus}")
warm_cat.drop()
build_index(docs.where(F.col("doc_id") < n_docs // 10), warm_cat,
            resume=False, n_docs=n_docs // 10)

t0 = time.time()
manifest = build_index(docs, catalog, resume=False, n_docs=n_docs)
elapsed = time.time() - t0
print(json.dumps({"cpus": cpus, "elapsed": round(elapsed, 2), "app": spark.sparkContext.applicationId,
                  "phases": manifest["phase_seconds"]}))
spark.stop()

"""Local replica of the driver's Spark-vs-DuckDB oracle comparison.

Usage: python tools/check_oracle.py [name ...]   (default: all registry)
Compares row count, sorted-by-name column sets, and order-insensitive
values at sf0.01 — a strict superset of CORRECTNESS_r{N}.json's check.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    return str(v)


def frame_to_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)
    return [cols[i] for i in idx], out


def main(names):
    from datamart_spark.session import get_spark
    from datamart_spark.suite import ORACLE, REGISTRY

    spark = get_spark("oracle_check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    names = names or list(REGISTRY)
    failures = []
    for name in names:
        fn = REGISTRY[name]
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        if name not in ORACLE:
            print(f"~ {name}: rows-only (no oracle) → {len(srows)} rows")
            continue
        try:
            res = con.execute(ORACLE[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"✗ {name}: DUCKDB ERROR {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        sc, sr = frame_to_rows(scols, [tuple(r) for r in srows])
        dc, dr = frame_to_rows(dcols, drows)
        if sc != dc:
            print(f"✗ {name}: SCHEMA spark={sc} duckdb={dc}")
            failures.append(name)
        elif len(sr) != len(dr):
            print(f"✗ {name}: ROWCOUNT spark={len(sr)} duckdb={len(dr)}")
            failures.append(name)
        elif sr != dr:
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"✗ {name}: VALUES differ, first diffs: {diff}")
            failures.append(name)
        else:
            print(f"✓ {name}: {len(sr)} rows match")
    spark.stop()
    print(f"\n{len(names) - len(failures)}/{len(names)} OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

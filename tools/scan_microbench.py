#!/usr/bin/env python
"""Per-core parquet scan-decode ceiling: the irreducible residue behind the
Spark-vs-DuckDB gap on scan-bound aggregates (BASELINE.md).

Runs the same two kernels on the same re-chunked lineitem file in both
engines, single-threaded and all-cores:

- ``count``: COUNT(*) — pure scan + row materialization, no compute;
- ``revenue``: SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*1e6) AS
  BIGINT)) — the Q1/Q6 decode+compute kernel.

If Spark's single-thread revenue kernel is K x slower than DuckDB's, then K
is the per-core scan-decode ratio and any scan-bound query ratio above ~K
indicates a plan problem; a ratio at ~K is the engine constant that only
more cores (a cluster) can buy back. Prints one JSON line.

Usage: python tools/scan_microbench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time


def _best(fn, n=3) -> float:
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    path = os.path.join(sf_dir, "lineitem.parquet")
    # re-chunked layouts store each table as a DIRECTORY of part files;
    # DuckDB needs the glob form, Spark reads the directory natively.
    if os.path.isdir(path):
        duck_path = os.path.join(path, "*.parquet")
        nbytes = sum(
            os.path.getsize(os.path.join(path, g)) for g in os.listdir(path)
        )
    else:
        duck_path = path
        nbytes = os.path.getsize(path)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32)))

    import duckdb

    duck_sql = {
        "count": f"SELECT COUNT(*) FROM read_parquet('{duck_path}')",
        "revenue": (
            "SELECT SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000.0)"
            f" AS BIGINT)) FROM read_parquet('{duck_path}')"
        ),
    }
    duck: dict[str, float] = {}
    for threads, tag in ((1, "t1"), (cpus, f"t{cpus}")):
        con = duckdb.connect()
        con.execute(f"PRAGMA threads={threads}")
        for k, sql in duck_sql.items():
            con.execute(sql)  # warm
            duck[f"{k}_{tag}"] = _best(lambda s=sql: con.execute(s).fetchall())
        con.close()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rev = F.sum(
        F.round((F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 1e6).cast(
            "long"
        )
    )
    sp: dict[str, float] = {}
    # split size controls intra-file parallelism: one giant split = 1 task
    # (per-core number); the parallel mode uses bench.py's sizing (~64
    # splits of the file — finer splits just buy task-dispatch overhead,
    # measured 0.55 s of pure dispatch at 550 splits).
    par_split = min(max(nbytes // 64, 256 * 1024), 128 * 1024 * 1024)
    # Round-5 fix: the single-core mode is coalesce(1), not a huge
    # maxPartitionBytes — Spark sizes splits as min(maxPartitionBytes,
    # max(openCostInBytes, totalBytes/defaultParallelism)), so the split
    # conf alone still fanned the scan across all cores and the earlier
    # "t1" numbers here were in fact parallel. coalesce merges the file
    # splits without a shuffle; n_partitions in the output proves the
    # mode. Kernels are also built fresh per pass (re-collecting one
    # DataFrame object is served by a result-reuse path in ~50 ms).
    n_parts: dict[str, int] = {}
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(par_split))
    for single, tag in ((True, "t1"), (False, f"t{cpus}")):

        def _read():
            d = spark.read.parquet(path)
            return d.coalesce(1) if single else d

        n_parts[tag] = _read().rdd.getNumPartitions()
        kernels = {
            "count": lambda: _read().selectExpr("count(*)").collect(),
            "revenue": lambda: _read().agg(rev.alias("s")).collect(),
        }
        for k, fn in kernels.items():
            fn()  # warm (codegen + page cache)
            sp[f"{k}_{tag}"] = _best(fn)

    out = {
        "metric": "scan_microbench",
        "sf_dir": sf_dir,
        "lineitem_bytes": nbytes,
        "cpus": cpus,
        "duckdb": {k: round(v, 4) for k, v in duck.items()},
        "spark": {k: round(v, 4) for k, v in sp.items()},
        "spark_scan_partitions": n_parts,
        "per_core_ratio_revenue": round(sp["revenue_t1"] / duck["revenue_t1"], 2),
        "per_core_ratio_count": round(sp["count_t1"] / duck["count_t1"], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

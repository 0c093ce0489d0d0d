#!/usr/bin/env python
"""r13 verdict task 2b, root cause: bucketed_join_revenue read 5.09x at
the r13 sf30 leg and 5.45x in this round's same-minute re-read — NOT
load skew. The cell still builds its layout with ensure_bucketed_table's
default 16 buckets, i.e. 16 scan/join tasks on a 32-core host, the
exact under-parallelism the r13 CDC n_buckets A/B demonstrated (16
writer tasks starved the host; 32 cut sf60 merge+write -30%). This A/B
times the recurring bucketed join (the cell's timed window) at 16/32/64
buckets, values asserted identical, one file per bucket asserted, with
the DuckDB oracle in the same session minute.

Usage: python tools/bjr_nbuckets_ab_r14.py <sf_dir> [passes]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import duckdb
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark import (
    get_spark,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.functions.numerics import (
    stable_sum,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (
    oracle_sql,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.scale import (
    _corpus_digest,
    _session_token,
    ensure_bucketed_table,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.sinks import (
    verify_bucket_layout,
)
from pyspark.sql import functions as F


def main():
    print("load_avg_start:", os.getloadavg())
    sf_dir = bench._rechunk(sys.argv[1])
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    bench._warm_page_cache(sf_dir)
    n_cpu = os.cpu_count() or 32
    spark = get_spark(
        app_name="bjr-nbuckets-ab-r14",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024 * 1024),
            "spark.sql.shuffle.partitions": str(n_cpu),
            "spark.sql.adaptive.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    digest = _corpus_digest(orders, cust)
    tok = _session_token()

    def build(n):
        to = f"bjrab{n}_o_{digest}_{tok}"
        tc = f"bjrab{n}_c_{digest}_{tok}"
        t0 = time.perf_counter()
        ensure_bucketed_table(
            spark, to, orders.select("o_custkey", "o_totalprice"),
            "o_custkey", digest, n_buckets=n,
        )
        ensure_bucketed_table(
            spark, tc, cust.select("c_custkey", "c_mktsegment"),
            "c_custkey", digest, n_buckets=n,
        )
        print(f"# layout n={n} built in {time.perf_counter() - t0:.2f}s, "
              f"files {verify_bucket_layout(spark, to, n)}/"
              f"{verify_bucket_layout(spark, tc, n)}")
        o = spark.table(to)
        c = spark.table(tc).hint("merge")
        return (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n_orders"),
                stable_sum("o_totalprice").alias("total_revenue"),
            )
        )

    joins = {n: build(n) for n in (16, 32, 64)}
    vals = {
        n: sorted(tuple(r) for r in df.collect()) for n, df in joins.items()
    }
    assert vals[16] == vals[32] == vals[64], "bucket counts changed values"
    print("# values identical across bucket counts,", len(vals[16]), "rows")
    for n, df in joins.items():
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        print(f"# n={n} exchanges={plan.count('Exchange')} "
              f"sorts={plan.count('Sort ')}")

    con = duckdb.connect()
    con.execute("SET timezone='UTC'")
    for tbl in ["orders", "customer"]:
        p = os.path.join(sf_dir, f"{tbl}.parquet")
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet({src})")

    best: dict[str, float] = {}
    for _ in range(passes):
        for n, df in joins.items():
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best[f"join@{n}"] = min(
                best.get(f"join@{n}", 1e9), time.perf_counter() - t0
            )
        t0 = time.perf_counter()
        con.execute(oracle_sql()["bucketed_join_revenue"]).fetchall()
        best["duckdb"] = min(best.get("duckdb", 1e9), time.perf_counter() - t0)
    for name, v in sorted(best.items()):
        print(f"{name:12s} {v:.3f}")
    for n in (16, 32, 64):
        for p in (f"bjrab{n}_o_{digest}_{tok}", f"bjrab{n}_c_{digest}_{tok}"):
            spark.sql(f"DROP TABLE IF EXISTS {p}")
    print("load_avg_end:", os.getloadavg())


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-7 A/B for tpch_q4's shuffle-form squeeze (r05/r06 brief item).

Forms, all verified to collect identical rows at sf10:
  v0 current      broadcast orders-window into pruned lineitem, non-equi
                  lag predicate in the join, per-order collapse
  v1 countDistinct  same join, single groupBy(priority) countDistinct
  v2 rollup+broadcast  the brief's suggestion: pre-aggregate lineitem to
                  per-orderkey MAX(l_shipdate) under the derived bound,
                  then broadcast-join (the rollup hashes ~12M near-unique
                  orderkeys — the pagerank lesson in reverse)
  v3 semi-on-orders  orders LEFT SEMI pruned-lineitem with the lag
                  predicate in the join condition

Measured sf10 min-of-3, same session (quiet host):
  v0 1.44s   v1 1.46s   v2 2.03s   v3 2.56s   DuckDB oracle 0.29s

Conclusion: the current form stands; the suggested pre-aggregation is
1.4x slower because the per-orderkey rollup builds a ~12M-key hash table
to collapse ~4 rows/key, while the broadcast probe touches each pruned
lineitem row once. The residual gap to DuckDB is the single-threaded
broadcast hash build (~1.5M orders) plus the JVM scan floor, not a plan
defect.

Usage: python tools/q4_ab.py <sf_dir> [passes]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
import duckdb
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark import (
    get_spark,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
    register_views,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (
    queries,
    oracle_sql,
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaled/sf10"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = bench._rechunk(sf_dir)
    bench._warm_page_cache(sf_dir)
    spark = get_spark(
        app_name="q4-ab",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024 * 1024),
            "spark.sql.shuffle.partitions": "32",
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.driver.memory": "24g",
        },
    )
    t = register_views(spark, sf_dir)
    t["lineitem"].count()
    ts = lambda s: F.lit(s).cast("timestamp_ntz")  # noqa: E731

    def base():
        o = t["orders"].where(
            (F.col("o_orderdate") >= ts("1997-01-01 00:00:00"))
            & (F.col("o_orderdate") < ts("1997-07-01 00:00:00"))
        )
        l = t["lineitem"].where(F.col("l_shipdate") > ts("1997-04-01 00:00:00"))
        return o.select("o_orderkey", "o_orderdate", "o_orderpriority"), l

    lag = F.expr("INTERVAL 90 DAYS")

    def v0():
        return queries()["tpch_q4_order_priority"](spark, sf_dir)

    def v1():
        op, l = base()
        return (
            l.join(
                F.broadcast(op),
                (l.l_orderkey == op.o_orderkey)
                & (l.l_shipdate > op.o_orderdate + lag),
            )
            .groupBy("o_orderpriority")
            .agg(F.countDistinct("o_orderkey").alias("order_count"))
        )

    def v2():
        op, l = base()
        lmax = l.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("mx"))
        return (
            lmax.join(
                F.broadcast(op),
                (F.col("l_orderkey") == op.o_orderkey)
                & (F.col("mx") > op.o_orderdate + lag),
            )
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count"))
        )

    def v3():
        op, l = base()
        qual = op.join(
            l,
            (l.l_orderkey == op.o_orderkey)
            & (l.l_shipdate > op.o_orderdate + lag),
            "left_semi",
        )
        return qual.groupBy("o_orderpriority").agg(
            F.count("*").alias("order_count")
        )

    forms = {"v0_current": v0, "v1_countdistinct": v1, "v2_rollup": v2, "v3_semi": v3}
    ref = None
    for name, mk in forms.items():
        rows = sorted(tuple(r) for r in mk().collect())
        ref = ref or rows
        assert rows == ref, name
    print("all forms agree")
    for name, mk in forms.items():
        best = None
        for _ in range(passes):
            df = mk()
            s = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - s
            best = el if best is None else min(best, el)
        print(f"{name}: {best:.3f}", flush=True)
    con = duckdb.connect()
    for tab in ["orders", "lineitem"]:
        p = os.path.join(sf_dir, f"{tab}.parquet")
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {tab} AS SELECT * FROM read_parquet({src})")
    sql = oracle_sql()["tpch_q4_order_priority"]
    best = None
    for _ in range(passes):
        s = time.perf_counter()
        con.execute(sql).fetchall()
        el = time.perf_counter() - s
        best = el if best is None else min(best, el)
    print(f"duckdb: {best:.3f}")


if __name__ == "__main__":
    main()

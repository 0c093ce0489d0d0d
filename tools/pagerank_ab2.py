#!/usr/bin/env python
"""Round-7 pagerank decomposition A/B: where does the sf10 time go, and
what moves it.

Phases measured separately under exact bench conditions:
  edge build (to the pruned-co localCheckpoint) x {default confs,
  raised objectHashAggregate fallback threshold} — the basket
  collect_set currently falls back to sort-based aggregation at 128
  keys (the conf default), i.e. every partial agg is a full sort.
  iteration (pairs_d build + 3 unrolled rounds + top-20), run in a
  cloned session with AQE off (the round-7 production form — no global
  conf toggle).
Plus the DuckDB oracle, same session, min-of-N — the ratio's
denominator measured under the same host state.

Also validates the A-Priori suggestion from the r06 verdict: counts
parts with order-frequency < MIN_SUPPORT (prunable by a frequent-item
first pass). Measured 0 at sf0.01/0.1 (every part appears in >= 2
orders in this corpus), so the prune is a no-op here.

Usage: python tools/pagerank_ab2.py <sf_dir> [passes]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import bench
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark import (
    get_spark,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
    register_views,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.graph import (
    _MIN_SUPPORT,
    _pagerank_oracle,
)


def build_co(t):
    baskets = t["lineitem"].groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("parts")
    )
    packed_pairs = F.expr(
        "flatten(transform(parts, x -> "
        f"transform(filter(parts, y -> y > x), y -> x * {1 << 31} + y)))"
    )
    return (
        baskets.select(F.explode(packed_pairs).alias("pk"))
        .groupBy("pk")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= _MIN_SUPPORT)
        .select(
            F.expr(f"pk div {1 << 31}").alias("src"),
            (F.col("pk") % F.lit(1 << 31)).alias("dst"),
        )
    )


def run_iteration(spark, co, scale=1_000_000_000_000, iters=3):
    new = spark.newSession()
    for k in (
        "spark.sql.shuffle.partitions",
        "spark.sql.autoBroadcastJoinThreshold",
    ):
        new.conf.set(k, spark.conf.get(k))
    new.conf.set("spark.sql.adaptive.enabled", "false")
    co2 = DataFrame(
        new._jsparkSession.createDataFrame(co._jdf.toJavaRDD(), co._jdf.schema()),
        new,
    )
    pairs = co2.unionAll(
        co2.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = pairs.groupBy("src").agg(F.count("*").alias("d"))
    nn = deg.agg(F.count("*").alias("c"))
    pairs_d = pairs.join(deg, "src").crossJoin(F.broadcast(nn)).localCheckpoint()
    rank = pairs_d.groupBy(F.col("src").alias("node")).agg(
        F.expr(f"{scale} div any_value(c)").alias("r")
    )
    for _ in range(iters):
        contrib = (
            pairs_d.join(rank, pairs_d.src == rank.node)
            .select("dst", F.expr("r div d").alias("con"), "c")
            .groupBy("dst")
            .agg(F.sum("con").alias("s"), F.expr("any_value(c)").alias("c"))
        )
        rank = contrib.select(
            F.col("dst").alias("node"),
            (
                F.expr(f"{scale * 15} div (100 * c)")
                + F.expr("(85 * s) div 100")
            ).alias("r"),
        )
    out = (
        rank.select(
            F.col("node").alias("part_key"),
            F.col("r").cast("long").alias("rank_micro"),
        )
        .orderBy(F.desc("rank_micro"), "part_key")
        .limit(20)
    )
    return out.localCheckpoint()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaled/sf10"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    raw = sf_dir
    sf_dir = bench._rechunk(sf_dir)
    bench._warm_page_cache(sf_dir)
    spark = get_spark(
        app_name="pagerank-ab2",
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
    t["lineitem"].count()  # warmup

    # A-Priori check: how many parts would a frequent-item pass prune?
    infreq = (
        t["lineitem"].select("l_orderkey", "l_partkey").distinct()
        .groupBy("l_partkey").count()
        .where(F.col("count") < _MIN_SUPPORT)
        .count()
    )
    print(f"parts with order-frequency < {_MIN_SUPPORT}: {infreq}", flush=True)

    results = {}
    for label, thr in [("edge_thr128", None), ("edge_thr4M", "4194304")]:
        if thr is not None:
            spark.conf.set(
                "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thr
            )
        best = None
        for _ in range(passes):
            start = time.perf_counter()
            co = build_co(t).localCheckpoint()
            el = time.perf_counter() - start
            best = el if best is None else min(best, el)
        results[label] = round(best, 3)
        print(f"{label}: {best:.3f}s", flush=True)
        if thr is not None:
            spark.conf.set(
                "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128"
            )

    co = build_co(t).localCheckpoint()
    best = None
    for _ in range(passes):
        start = time.perf_counter()
        out = run_iteration(spark, co)
        el = time.perf_counter() - start
        best = el if best is None else min(best, el)
    results["iteration_newsession"] = round(best, 3)
    print(f"iteration_newsession: {best:.3f}s", flush=True)
    print("spark top-3:", [tuple(r) for r in out.limit(3).collect()], flush=True)

    # DuckDB same-session oracle
    import duckdb

    con = duckdb.connect()
    for tab in ["lineitem"]:
        p = os.path.join(sf_dir, f"{tab}.parquet")
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {tab} AS SELECT * FROM read_parquet({src})")
    sql = _pagerank_oracle()
    best = None
    for _ in range(passes):
        start = time.perf_counter()
        rows = con.execute(sql).fetchall()
        el = time.perf_counter() - start
        best = el if best is None else min(best, el)
    results["duckdb_oracle"] = round(best, 3)
    print(f"duckdb_oracle: {best:.3f}s", flush=True)
    print("duckdb top-3:", rows[:3], flush=True)
    print("SUMMARY", results, raw, flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B the pagerank co-purchase edge-list build forms under EXACT bench
conditions (rechunked 32-file tables, bench confs, warmed page cache).

Forms (each plugged into the full unrolled-pagerank query):
  A: current — collect_set baskets + HOF pair expansion
  C: plain distinct + aliased self-join (basket_part_pairs form), SHJ hint
  D: packed-long distinct (one 8-byte shuffle key) + self-join on unpacked ok
  E: repartition(l_orderkey) -> colocated distinct agg -> self-join
     (exchange reused, zero extra join exchange)

Usage: python tools/pagerank_ab.py /tmp/scaled/sf10 [passes] [forms]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark import (
    get_spark,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
    register_views,
)

_MIN_SUPPORT = 2
_SCALE = 1_000_000_000_000
_ITERS = 3


def co_a(t):
    baskets = t["lineitem"].groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("parts")
    )
    pair_structs = F.expr(
        "flatten(transform(parts, x -> "
        "transform(filter(parts, y -> y > x), y -> struct(x AS src, y AS dst))))"
    )
    return (
        baskets.select(F.explode(pair_structs).alias("p"))
        .select("p.src", "p.dst")
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= _MIN_SUPPORT)
        .select("src", "dst")
    )


def _pairs_from_items(items):
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = items.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("dst"))
    return (
        a.hint("shuffle_hash")
        .join(b, (F.col("ok") == F.col("ok2")) & (F.col("src") < F.col("dst")))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= _MIN_SUPPORT)
        .select("src", "dst")
    )


def co_c(t):
    return _pairs_from_items(
        t["lineitem"].select("l_orderkey", "l_partkey").distinct()
    )


def co_d(t):
    packed = (
        t["lineitem"]
        .select(
            (F.col("l_orderkey") * F.lit(1 << 22) + F.col("l_partkey")).alias("k")
        )
        .distinct()
    )
    items = packed.select(
        F.expr("k div 4194304").alias("l_orderkey"),
        (F.col("k") % F.lit(1 << 22)).alias("l_partkey"),
    )
    return _pairs_from_items(items)


def co_e(t):
    items = (
        t["lineitem"]
        .select("l_orderkey", "l_partkey")
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_partkey")
        .agg(F.lit(1))
        .select("l_orderkey", "l_partkey")
    )
    return _pairs_from_items(items)


def full_query(co):
    pairs = co.unionAll(
        co.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    deg = pairs.groupBy("src").agg(F.count("*").alias("d"))
    n = deg.agg(F.count("*").alias("c"))
    rank = deg.crossJoin(F.broadcast(n)).select(
        F.col("src").alias("node"), F.expr(f"{_SCALE} div c").alias("r")
    )
    for _ in range(_ITERS):
        contrib = (
            pairs.join(rank, pairs.src == rank.node)
            .join(deg, "src")
            .select("dst", F.expr("r div d").alias("con"))
            .groupBy("dst")
            .agg(F.sum("con").alias("s"))
        )
        rank = (
            rank.join(contrib, rank.node == contrib.dst, "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                (
                    F.expr(f"{_SCALE * 15} div (100 * c)")
                    + F.expr("(85 * coalesce(s, 0)) div 100")
                ).alias("r"),
            )
        )
    return (
        rank.select(
            F.col("node").alias("part_key"), F.col("r").cast("long").alias("rank_micro")
        )
        .orderBy(F.desc("rank_micro"), "part_key")
        .limit(20)
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaled/sf10"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    which = sys.argv[3] if len(sys.argv) > 3 else "ACDE"
    sf_dir = bench._rechunk(sf_dir)
    bench._warm_page_cache(sf_dir)
    spark = get_spark(
        app_name="pagerank-ab",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024 * 1024),
            "spark.sql.shuffle.partitions": "32",
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.driver.memory": "24g",
        },
    )
    forms = {
        k: v
        for k, v in {"A": co_a, "C": co_c, "D": co_d, "E": co_e}.items()
        if k in which
    }
    best = {k: None for k in forms}
    register_views(spark, sf_dir)["lineitem"].count()  # warmup
    for i in range(passes):
        for k, fn in forms.items():
            t = register_views(spark, sf_dir)
            start = time.perf_counter()
            df = full_query(fn(t))
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - start
            best[k] = el if best[k] is None else min(best[k], el)
            print(f"pass {i} {k}: {el:.3f}s", flush=True)
    print("BEST:", {k: round(v, 3) for k, v in best.items()}, flush=True)
    t = register_views(spark, sf_dir)
    rows = {k: [tuple(r) for r in full_query(fn(t)).collect()] for k, fn in forms.items()}
    vals = list(rows.values())
    print("results MATCH" if all(v == vals[0] for v in vals) else "results MISMATCH")


if __name__ == "__main__":
    main()

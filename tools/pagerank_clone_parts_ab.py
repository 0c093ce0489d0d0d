#!/usr/bin/env python
"""Round-9 A/B: shuffle parallelism for PageRank's AQE-off iteration clone.

The r08 verdict named graph_pagerank_parts a non-floor sf0.1 cell
(1.77 s) and suggested the clone's SESSION CREATION amortized poorly.
Measured first (2026-08-15, min-of-4 after JIT warmup): clone+lift is
0.026-0.073 s steady — NOT the cost. The real sf0.1 residue: the
iteration subtree inherits the parent's shuffle partition count while
running over a few-thousand-row checkpointed edge list, so every
iteration stage is scheduling floor.

Variants: clone spark.sql.shuffle.partitions = parent (shipped r07-r08)
vs 1 / 4 / 8, outputs verified identical. Interleaved min-of-3/4, one
session per scale, bench-config sessions (sf0.1: AQE off, 8 partitions;
sf10: AQE on, 32), edge list built once per scale and the iteration
phase timed in isolation at sf10:

  sf0.1 (3.4 k edges, whole cell): parent(8) 1.408  1 part 1.236  2 parts 1.255
  sf10 (357 k edges, iteration phase): parent(32) 2.341  8 parts 1.671
                                       4 parts 2.047  1 part 4.884

VERDICT: size the clone's parallelism to the MATERIALIZED edge count —
~50 k edges/partition, floor 1, capped at the parent setting (picks 1
at sf0.1 and 8 at sf10, the winners; keeps parent parallelism at
cluster scale where the cap binds). Shipped in graph.py (the
clone_parts block after the edge checkpoint); the count is one cheap
job over the already-checkpointed RDD.

Usage: python tools/pagerank_clone_parts_ab.py [sf_dir] [passes]
(builds the edge list once, then times the iteration phase per variant)
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
import ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.graph as g


def iter_phase(co, clone_parts):
    """The iteration subtree of graph_pagerank_parts, parameterized on the
    clone's shuffle parallelism (None = inherit the parent's)."""
    co2 = g._lift_into_aqe_off_session(co.sparkSession, co)
    if clone_parts is not None:
        co2.sparkSession.conf.set(
            "spark.sql.shuffle.partitions", str(clone_parts)
        )
    pairs2 = co2.unionAll(
        co2.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = pairs2.groupBy("src").agg(F.count("*").alias("d"))
    nn = deg.agg(F.count("*").alias("c"))
    pairs_d = pairs2.join(deg, "src").crossJoin(F.broadcast(nn)).localCheckpoint()
    rank = pairs_d.groupBy(F.col("src").alias("node")).agg(
        F.expr(f"{g._SCALE} div any_value(c)").alias("r")
    )
    for _ in range(g._ITERS):
        contrib = (
            pairs_d.join(rank, pairs_d.src == rank.node)
            .select("dst", F.expr("r div d").alias("con"), "c")
            .groupBy("dst")
            .agg(F.sum("con").alias("s"), F.expr("any_value(c)").alias("c"))
        )
        rank = contrib.select(
            F.col("dst").alias("node"),
            (
                F.expr(f"{g._SCALE * 15} div (100 * c)")
                + F.expr("(85 * s) div 100")
            ).alias("r"),
        )
    return (
        rank.select(
            F.col("node").alias("part_key"),
            F.col("r").cast("long").alias("rank_micro"),
        )
        .orderBy(F.desc("rank_micro"), "part_key")
        .limit(20)
    ).localCheckpoint()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = bench._rechunk(sf_dir)
    bench._warm_page_cache(sf_dir)
    spark = get_spark(
        app_name="pagerank-clone-parts-ab",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "24g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = register_views(spark, sf_dir)

    baskets = g.order_baskets(t["lineitem"])
    packed = F.expr(
        "flatten(transform(parts, x -> "
        f"transform(filter(parts, y -> y > x), y -> x * {1 << 31} + y)))"
    )
    pairs = baskets.select(F.explode(packed).alias("pk"))
    dup = (
        pairs.groupBy("pk")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= g._MIN_SUPPORT)
    )
    co = dup.select(
        F.expr(f"pk div {1 << 31}").alias("src"),
        (F.col("pk") % F.lit(1 << 31)).alias("dst"),
    ).localCheckpoint()
    print("edges:", co.count())

    variants = [None, 1, 4, 8]
    ref = sorted(tuple(r) for r in iter_phase(co, None).collect())
    for p in variants[1:]:
        assert sorted(tuple(r) for r in iter_phase(co, p).collect()) == ref
    print("outputs identical across variants")

    res = {}
    for _ in range(passes):
        for p in variants:
            t0 = time.perf_counter()
            iter_phase(co, p).collect()
            res.setdefault(str(p), []).append(
                round(time.perf_counter() - t0, 3)
            )
    for k, v in res.items():
        print(f"clone_parts {k}: min {min(v)} passes {v}")


if __name__ == "__main__":
    main()

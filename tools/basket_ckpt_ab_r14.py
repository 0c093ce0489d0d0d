#!/usr/bin/env python
"""r13 verdict task 7b: give basket_lift_rules a phase_split_s the way
pagerank got one — IF a materialization boundary at the shared basket
subtree is free. Form A = shipped (lazy plan, Catalyst reuses the one
order-grain exchange across pairs/sup/total). Form B = the same query
over an eagerly localCheckpointed `order_baskets` relation: the
checkpoint IS the phase boundary (basket_build vs rule scoring), and the
three consumers read the materialized blocks instead of re-reading one
shuffle's files. Values asserted identical (exact top-20 rows — the
lift doubles are exact per the operator's docstring). If B is
neutral-or-better, the shipped cell gains the checkpoint + phase split;
if slower, this file is the rejection record.

Usage: python tools/basket_ckpt_ab_r14.py <sf_dir> [passes]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark import (
    get_spark,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.graph import (
    copurchase_pair_counts,
    order_baskets,
)
from pyspark.sql import functions as F


def rules_from_baskets(baskets):
    items = baskets.select("l_orderkey", F.explode("parts").alias("l_partkey"))
    sup = items.groupBy("l_partkey").agg(F.count("*").alias("n"))
    total = baskets.agg(F.count("*").alias("n_orders"))
    pairs = copurchase_pair_counts(min_support=2, baskets=baskets)
    sa = sup.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("na"))
    sb = sup.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(total))
        .select(
            "part_a", "part_b", "n_ab",
            (F.col("n_ab").cast("double") / F.col("na")).alias("confidence_a_to_b"),
            ((F.col("n_ab") * F.col("n_orders")).cast("double")
             / (F.col("na") * F.col("nb"))).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(20)
    )


def main():
    print("load_avg_start:", os.getloadavg())
    sf_dir = bench._rechunk(sys.argv[1])
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    bench._warm_page_cache(sf_dir)
    n_cpu = os.cpu_count() or 32
    spark = get_spark(
        app_name="basket-ckpt-ab-r14",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024 * 1024),
            "spark.sql.shuffle.partitions": str(n_cpu),
            "spark.sql.adaptive.enabled": "true",
            "spark.driver.memory": "24g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey"
    )
    li.count()

    a = sorted(tuple(r) for r in rules_from_baskets(order_baskets(li)).collect())
    ck0 = order_baskets(li).localCheckpoint()
    b = sorted(tuple(r) for r in rules_from_baskets(ck0).collect())
    ck0.unpersist()
    assert a and a == b, "checkpointed form changed values"
    print("# forms value-identical, top-%d rows" % len(a))

    best: dict[str, float] = {}
    split_best: dict[str, float] = {}
    for _ in range(passes):
        t0 = time.perf_counter()
        rules_from_baskets(order_baskets(li)).write.format("noop").mode(
            "overwrite"
        ).save()
        best["shipped(lazy)"] = min(
            best.get("shipped(lazy)", 1e9), time.perf_counter() - t0
        )
        spark._jvm.System.gc(); time.sleep(0.3)
        t0 = time.perf_counter()
        ck = order_baskets(li).localCheckpoint()
        t1 = time.perf_counter()
        rules_from_baskets(ck).write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        ck.unpersist()
        best["ckpt(total)"] = min(best.get("ckpt(total)", 1e9), t2 - t0)
        split_best["basket_build_s"] = min(
            split_best.get("basket_build_s", 1e9), t1 - t0
        )
        split_best["scoring_s"] = min(split_best.get("scoring_s", 1e9), t2 - t1)
        spark._jvm.System.gc(); time.sleep(0.3)
    for name, v in sorted(best.items()):
        print(f"{name:16s} {v:.3f}")
    print("# ckpt phase split:", {k: round(v, 3) for k, v in split_best.items()})
    print("load_avg_end:", os.getloadavg())


if __name__ == "__main__":
    main()

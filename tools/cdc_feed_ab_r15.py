#!/usr/bin/env python
"""Round-15 audit of cdc_merge_incremental (r14 verdict task 3:
8.89 s / 4.0x at sf30, merge1_write 8.73 s at sf60).

Two questions, answered with numbers:

1. BUCKET-TOUCH HISTOGRAM — can the merge write skip (hardlink) buckets
   no feed key lands in (the commit-14fe4c8 versioned side-table
   technique)? The feed derives from o_orderkey residues (%10 in
   {1,3,7} for batch 1), which Murmur3-hash UNIFORMLY across the bucket
   scheme: if every bucket holds feed keys, a bucket-skipping rewrite
   can skip nothing and the rewrite-everything floor stands. This tool
   prints the per-bucket feed-key counts (pmod(hash(key), n) — the exact
   expression Spark bucketing assigns files by).

2. FEED-BUILD SINGLE-SCAN — each batch's feed unions three filtered
   branches of the SAME orders scan (plus the kmx scalar), so its
   localCheckpoint pays ~4 scans of orders; a CASE-based single-scan
   form reads orders once (plus kmx) and must produce the IDENTICAL row
   multiset (asserted via sorted collect at small SF / checksum here).
   A/B: time localCheckpoint of the old vs new feed forms, interleaved
   min-of-N.

Usage: python tools/cdc_feed_ab_r15.py [sf_dir] [passes]
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
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.changes import (
    _CDC_N_BUCKETS,
    _changes_batch1,
    _changes_batch2,
    _key_max,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
    register_views,
)


def old_batch1(o):
    """The pre-r15 three-branch union form (kept here verbatim as the
    A/B baseline after the operator switched to the single-scan form)."""
    upd = o.where(F.col("o_orderkey") % 10 == 3).select(
        F.col("o_orderkey").alias("key"),
        F.lit("U").alias("op"),
        (F.col("o_totalprice") + 100.0).alias("price"),
        F.lit("U").alias("status"),
    )
    dele = o.where(F.col("o_orderkey") % 10 == 7).select(
        F.col("o_orderkey").alias("key"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("price"),
        F.lit(None).cast("string").alias("status"),
    )
    ins = (
        o.where(F.col("o_orderkey") % 10 == 1)
        .crossJoin(F.broadcast(_key_max(o)))
        .select(
            (F.col("o_orderkey") + F.col("kmx")).alias("key"),
            F.lit("I").alias("op"),
            F.col("o_totalprice").alias("price"),
            F.lit("N").alias("status"),
        )
    )
    return upd.unionAll(dele).unionAll(ins)


def old_batch2(o):
    return (
        o.where(F.col("o_orderkey") % 10 == 5)
        .select(
            F.col("o_orderkey").alias("key"),
            F.lit("U").alias("op"),
            (F.col("o_totalprice") + 50.0).alias("price"),
            F.lit("V").alias("status"),
        )
        .unionAll(
            o.where(F.col("o_orderkey") % 10 == 3).select(
                F.col("o_orderkey").alias("key"),
                F.lit("D").alias("op"),
                F.lit(None).cast("double").alias("price"),
                F.lit(None).cast("string").alias("status"),
            )
        )
        .unionAll(
            o.where(F.col("o_orderkey") % 20 == 1)
            .crossJoin(F.broadcast(_key_max(o)))
            .select(
                (F.col("o_orderkey") + F.col("kmx")).alias("key"),
                F.lit("U").alias("op"),
                (F.col("o_totalprice") * 2).alias("price"),
                F.lit("M").alias("status"),
            )
        )
    )


def checksum(df):
    return df.select(
        F.sum(
            F.xxhash64("key", "op", "price", "status") % F.lit(2**31)
        ).alias("cs"),
        F.count("*").alias("n"),
    ).collect()[0]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaled/sf30"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = bench._rechunk(sf_dir)
    bench._warm_page_cache(sf_dir)
    spark = get_spark(
        app_name="cdc-feed-ab-r15",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024 * 1024),
            "spark.sql.shuffle.partitions": "32",
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.driver.memory": "24g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = register_views(spark, sf_dir)
    o = t["orders"]

    # --- 1. bucket-touch histogram ---
    feed_keys = old_batch1(o).select("key")
    hist = (
        feed_keys.groupBy(
            F.pmod(F.hash("key"), F.lit(_CDC_N_BUCKETS)).alias("bucket")
        )
        .count()
        .orderBy("bucket")
        .collect()
    )
    touched = len(hist)
    print(
        f"bucket-touch histogram (batch1 feed, n_buckets={_CDC_N_BUCKETS}): "
        f"{touched}/{_CDC_N_BUCKETS} buckets touched",
        flush=True,
    )
    counts = [r["count"] for r in hist]
    print(f"  min/median/max feed keys per bucket: "
          f"{min(counts)}/{sorted(counts)[len(counts)//2]}/{max(counts)}")

    # --- 2. feed-build A/B ---
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.changes import (  # noqa: E501
        _changes_batch1 as new_batch1,
    )

    c_old1, c_new1 = checksum(old_batch1(o)), checksum(new_batch1(o))
    assert tuple(c_old1) == tuple(c_new1), (c_old1, c_new1)
    c_old2, c_new2 = checksum(old_batch2(o)), checksum(_changes_batch2(o))
    assert tuple(c_old2) == tuple(c_new2), (c_old2, c_new2)
    print("feed row multisets identical (xxhash64 checksum + count)", flush=True)

    res = {}
    for p in range(passes):
        for name, b1, b2 in (
            ("old_union_feed", old_batch1, old_batch2),
            ("new_singlescan_feed", new_batch1, _changes_batch2),
        ):
            spark.sparkContext.setJobDescription(f"{name} pass {p}")
            t0 = time.perf_counter()
            x1 = b1(o).localCheckpoint()
            x2 = b2(o).localCheckpoint()
            el = time.perf_counter() - t0
            res.setdefault(name, []).append(round(el, 3))
            x1.unpersist()
            x2.unpersist()
    for name, vals in res.items():
        print(f"{name}: min {min(vals)} passes {vals}", flush=True)
    print(f"load_avg now: {os.getloadavg()}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""n_buckets scale-knob A/B for cdc_merge_incremental's durable write
(r12 verdict task 3): the r12 audit measured the bucketed merge WRITE at
+2.9 s/merge (sf30) and 10.1 of 26.3 s (sf60) with n_buckets=16, and the
code comment calls n_buckets the per-bucket-size scale knob — this tool
proves (or refutes) it.

Protocol: per n_buckets in {16, 32, 64}, replay the cell's exact durable
path — base snapshot bucketed-table write, then batch-1 merge read+write
(zero-exchange base side, pre_partitioned output) — interleaved
min-of-N, per-phase wall separated, merged VALUES asserted identical
across bucket counts (full rollup compare, not a digest). The trade-off
under test: write parallelism (16 buckets = 16 writer tasks on a
32-core host, i.e. half the cores idle during the one-file-per-bucket
write) vs per-bucket file size and downstream scan task count.

Usage: python tools/nbuckets_ab.py <sf_dir> [passes]
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
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.functions.numerics import (
    stable_sum,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.changes import (
    _changes_batch1,
    _merge_batch,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
    register_views,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.sinks import (
    _count_bucket_files,
    write_bucketed,
)
from pyspark.sql import functions as F


def main():
    print("load_avg_start:", os.getloadavg())
    sf_dir = bench._rechunk(sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaled/sf30")
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    bench._warm_page_cache(sf_dir)
    spark = get_spark(
        app_name="nbuckets-ab",
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
    snapshot = o.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    batch1 = _changes_batch1(o).localCheckpoint()
    print("orders:", o.count(), "feed:", batch1.count(), flush=True)

    def rollup(df):
        return sorted(
            tuple(r)
            for r in df.groupBy("status")
            .agg(F.count("*").alias("n"), stable_sum("price").alias("tp"))
            .collect()
        )

    ref = None
    best: dict[str, float] = {}
    files: dict[int, tuple[int, int]] = {}
    for p in range(passes):
        for nb in (16, 32, 64):
            base_tbl, inc_tbl = f"nbab_base_{nb}", f"nbab_inc_{nb}"
            spark.sql(f"DROP TABLE IF EXISTS {base_tbl}")
            spark.sql(f"DROP TABLE IF EXISTS {inc_tbl}")
            t0 = time.perf_counter()
            write_bucketed(snapshot, base_tbl, "key", n_buckets=nb, sort_col="key")
            base_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            v1 = _merge_batch(spark.table(base_tbl), batch1)
            write_bucketed(
                v1, inc_tbl, "key", n_buckets=nb, sort_col="key",
                pre_partitioned=True,
            )
            merge_s = time.perf_counter() - t0
            best[f"base_write@{nb}"] = min(
                best.get(f"base_write@{nb}", 1e9), base_s
            )
            best[f"merge+write@{nb}"] = min(
                best.get(f"merge+write@{nb}", 1e9), merge_s
            )
            files[nb] = (
                _count_bucket_files(spark, base_tbl),
                _count_bucket_files(spark, inc_tbl),
            )
            print(
                f"pass{p} nb={nb}: base {base_s:.2f}s merge+write "
                f"{merge_s:.2f}s files={files[nb]} load "
                f"{os.getloadavg()[0]:.1f}",
                flush=True,
            )
            if p == 0:
                r = rollup(spark.table(inc_tbl))
                if ref is None:
                    ref = r
                else:
                    assert r == ref, f"nb={nb} merged values differ"
    print("# merged values identical across bucket counts", flush=True)
    for name, v in sorted(best.items()):
        print(f"{name:22s} {v:.3f}")
    print("files (base, inc):", files)
    print("load_avg_end:", os.getloadavg())
    for nb in (16, 32, 64):
        spark.sql(f"DROP TABLE IF EXISTS nbab_base_{nb}")
        spark.sql(f"DROP TABLE IF EXISTS nbab_inc_{nb}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <scale factor>}

Each query executes to completion through the `noop` sink — full plan
runs (scan, shuffles, aggregation) with no driver-side materialization
cost distorting the number.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark import (
    get_spark,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (
    queries,
)

#: Representative operator mix: scan-agg, selective joins, star join,
#: windows, sessionization, near-dup (exact + LSH), ANN, text pipeline.
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q4_order_priority",
    "tpch_q8_market_share",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_volume_customers",
    "tpch_q22_global_sales_opportunity",
    "join_star_flagship",
    "filter_not_null_group_count",
    "window_rank_per_group",
    "events_sessionize",
    "events_tumbling_window",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "similarity_bruteforce_topk",
    "similarity_bucketed_ann",
    "text_fingerprint",
    "text_quality_score",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Local-bench-only tuning: the test parquet files are ~10 MB, so the
    # 128 MB default split gives 1-3 scan partitions on a 32-core local
    # master — tiny splits restore scan parallelism. A real cluster keeps
    # the defaults (these would be harmful at 100 TB: too many tasks).
    spark = get_spark(
        app_name="fabric-bench",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024),
            "spark.sql.shuffle.partitions": "16",
        },
    )

    qs = queries()
    # JVM/codegen warmup on a trivial plan so the first timed query doesn't
    # absorb session startup.
    qs["agg_count_star"](spark, sf_dir).collect()

    # Three passes per query, report the min: pass 1 pays whole-stage-codegen
    # compilation and OS page-cache warmup (cached thereafter), so later
    # passes measure steady-state execution — the number that actually
    # extrapolates to a long-running cluster where plans compile once and
    # run for hours. Min-of-3 also damps scheduler jitter on a shared host.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = None
        for _ in range(3):
            df = qs[name](spark, sf_dir)
            start = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - start
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

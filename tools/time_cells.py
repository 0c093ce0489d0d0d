#!/usr/bin/env python
"""Time individual registered cells under exact bench conditions.

Usage: python tools/time_cells.py <sf_dir> <passes> name1,name2,...
Prints per-cell min-of-N seconds (timed like bench.py: construction
untimed unless the cell is in bench.TIMED_CONSTRUCTION, noop sink).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark import (
    get_spark,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (
    queries,
)


def main():
    sf_dir = sys.argv[1]
    passes = int(sys.argv[2])
    names = sys.argv[3].split(",")
    raw = sf_dir
    sf_dir = bench._rechunk(sf_dir)
    bench._warm_page_cache(sf_dir)

    def tbl_size(f):
        p = os.path.join(sf_dir, f)
        if os.path.isdir(p):
            return sum(os.path.getsize(os.path.join(p, g)) for g in os.listdir(p))
        return os.path.getsize(p)

    largest = max(
        (tbl_size(f) for f in os.listdir(sf_dir) if f.endswith(".parquet")),
        default=10 * 1024 * 1024,
    )
    split = 256 * 1024 * 1024
    bcast = min(max(largest // 16, 10 * 1024 * 1024), 64 * 1024 * 1024)
    small = largest < 64 * 1024 * 1024
    spark = get_spark(
        app_name="time-cells",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(split),
            "spark.sql.files.openCostInBytes": str(split),
            "spark.sql.shuffle.partitions": "8" if small else str(os.cpu_count() or 32),
            "spark.sql.adaptive.enabled": "false" if small else "true",
            "spark.sql.autoBroadcastJoinThreshold": str(bcast),
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
        },
    )
    qs = queries()
    qs["agg_count_star"](spark, sf_dir).collect()
    timed_construction = getattr(
        bench, "TIMED_CONSTRUCTION", {"dedup_components", "graph_pagerank_parts"}
    )
    for name in names:
        best = None
        for _ in range(passes):
            start = time.perf_counter()
            df = qs[name](spark, sf_dir)
            if name not in timed_construction:
                start = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - start
            best = el if best is None else min(best, el)
        print(f"{name} @ {raw}: {best:.3f}", flush=True)


if __name__ == "__main__":
    main()

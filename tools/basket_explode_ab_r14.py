#!/usr/bin/env python
"""r13 verdict task 3: attack (or bound) the basket-explode spine shared
by graph_pagerank_parts and basket_lift_rules — post-r13-partition-fix,
the sf60 pagerank edge build is still 125 s of the 147 s cell, and
basket_lift_rules (179 s, no oracle at sf60 — DuckDB died at the temp
cap twice) shares the same order_baskets -> pair-explode -> rollup spine.

Candidate EDGE-BUILD forms, value-asserted to produce the identical
support-pruned edge set (count + order-independent checksum):

- shipped:       packed-pair HOF explode -> repartition(n_roll, pk) ->
                 numpy per-partition sort+count (graph.py's current form;
                 n_roll from the r13 data-scaled rule).
- roll@half/x2:  the same with n_roll halved / doubled (is the 3M
                 pairs/task target still the sweet spot at sf60?).
- selfjoin:      pair GENERATION without materializing the per-basket
                 pair array: explode baskets back to (orderkey, part)
                 grain — partitioning hash(l_orderkey) from the basket
                 exchange survives the generator, so the a<b self-join
                 is ZERO-exchange — then pack and run the same numpy
                 rollup. Trades the interpreted HOF pair lambdas for a
                 codegen'd join.
- jvmhash@roll:  packed HOF explode -> JVM hash groupBy/HAVING at the
                 DATA-SCALED partition count (the r13 rejection of this
                 form ran at the session's 32 partitions and died
                 UNABLE_TO_ACQUIRE_MEMORY; re-auditioned at n_roll).
- floor:baskets  the order-grain collect_set exchange alone.
- floor:explode  baskets + packed pair explode, no rollup exchange —
                 floor:explode minus floor:baskets isolates the HOF
                 pair-generation cost the selfjoin form removes.

Every form is wrapped: an executor OOM records ERR for that form and the
audit continues.

Usage: python tools/basket_explode_ab_r14.py <sf_dir> [passes]
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
    _MIN_SUPPORT,
    _duplicated_keys_fn,
    order_baskets,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.relational import (
    plan_size_estimate,
)
from pyspark.sql import functions as F

PACK = 1 << 31


def main():
    print("load_avg_start:", os.getloadavg())
    sf_dir = bench._rechunk(sys.argv[1])
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    bench._warm_page_cache(sf_dir)
    n_cpu = os.cpu_count() or 32
    spark = get_spark(
        app_name="basket-explode-ab-r14",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024 * 1024),
            "spark.sql.shuffle.partitions": str(n_cpu),
            "spark.sql.adaptive.enabled": "true",
            # bench parity: the suite runs at 24g; the 8g default OOM'd
            # mid-timing at sf30 (3x Java heap space).
            "spark.driver.memory": "24g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    li_full = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li = li_full.select("l_orderkey", "l_partkey")
    li.count()

    # Estimate on the FULL table, exactly as graph.py's shipped rule does
    # (the pruned 2-column estimate would halve n_roll vs production).
    est = plan_size_estimate(li_full)
    n_roll = max(n_cpu, min(1024, est // (28 << 20)))
    print(f"# lineitem estimate {est >> 20} MB, n_roll {n_roll}")

    packed_pairs = F.expr(
        "flatten(transform(parts, x -> "
        f"transform(filter(parts, y -> y > x), y -> x * {PACK} + y)))"
    )

    def baskets():
        return order_baskets(li)

    def pairs_hof():
        return baskets().select(F.explode(packed_pairs).alias("pk"))

    def shipped(n=None):
        dup = (
            pairs_hof()
            .repartition(n or n_roll, "pk")
            .mapInPandas(_duplicated_keys_fn(_MIN_SUPPORT), "pk long")
        )
        return dup

    def selfjoin():
        e = baskets().select(
            F.col("l_orderkey").alias("ok"), F.explode("parts").alias("p")
        )
        e2 = e.select(F.col("ok").alias("ok2"), F.col("p").alias("p2"))
        pk = (
            e.join(e2, (F.col("ok") == F.col("ok2")) & (F.col("p") < F.col("p2")))
            .select((F.col("p") * PACK + F.col("p2")).alias("pk"))
        )
        return pk.repartition(n_roll, "pk").mapInPandas(
            _duplicated_keys_fn(_MIN_SUPPORT), "pk long"
        )

    def jvmhash():
        # Explicit repartition(n_roll, pk): the groupBy's required
        # distribution is already satisfied, so no second exchange — and
        # the map-side partial combine (useless on near-unique keys) is
        # skipped, mirroring the numpy form's shuffle shape exactly.
        return (
            pairs_hof()
            .repartition(n_roll, "pk")
            .groupBy("pk")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") >= _MIN_SUPPORT)
            .select("pk")
        )

    def checksum(df):
        # order-independent; modulo keeps the long sum ANSI-safe
        r = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64(F.col("pk")) % 1_000_000_007).alias("h"),
        ).first()
        return (r["n"], r["h"])

    forms = {
        "shipped": lambda: shipped(),
        "roll@half": lambda: shipped(max(n_cpu, n_roll // 2)),
        "roll@x2": lambda: shipped(min(2048, n_roll * 2)),
        "selfjoin": selfjoin,
        "jvmhash@roll": jvmhash,
    }
    floors = {
        "floor:baskets": lambda: baskets().select(
            "l_orderkey", F.size("parts").alias("z")
        ),
        "floor:explode": pairs_hof,
    }

    # value identity across all candidate forms (one execution each)
    ref = None
    sigs = {}
    for name, fn in forms.items():
        try:
            sigs[name] = checksum(fn())
        except Exception as exc:
            sigs[name] = f"ERR {type(exc).__name__}"
    ref = sigs["shipped"]
    print("# edge-set signatures:", sigs, flush=True)
    assert not str(ref).startswith("ERR"), f"shipped form errored: {ref}"
    bad = {k: v for k, v in sigs.items() if v != ref and not str(v).startswith("ERR")}
    assert not bad, f"forms disagree with shipped: {bad}"

    best: dict[str, float] = {}
    errs: dict[str, str] = {}
    for _ in range(passes):
        for name, fn in {**forms, **floors}.items():
            if name in errs:
                continue
            t0 = time.perf_counter()
            try:
                fn().write.format("noop").mode("overwrite").save()
                best[name] = min(
                    best.get(name, 1e9), time.perf_counter() - t0
                )
            except Exception as exc:
                errs[name] = f"{type(exc).__name__}: {str(exc)[:120]}"
            spark._jvm.System.gc()
            time.sleep(0.3)
    for name, v in sorted(best.items()):
        print(f"{name:20s} {v:.3f}")
    for name, e in sorted(errs.items()):
        print(f"{name:20s} ERR {e}")
    print("load_avg_end:", os.getloadavg())


if __name__ == "__main__":
    main()

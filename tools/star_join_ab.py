#!/usr/bin/env python
"""Round-10 at-scale rejection audit for the two join cells the r09
verdict flagged >2x at sf30 with no recorded audit (item 3):
`join_star_flagship` (2.7x, 2.8 s abs) and `bucketed_join_revenue`
(3.0x, 1.2 s abs).

Discipline = tools/q3q5_ab.py: interleaved min-of-N, ONE session, the
exact bench at-scale config, candidate forms including the shuffle
branch, the scan floor measured, same-session DuckDB reference.

join_star candidates (identical 25-row output verified per run):
  js_v0_shipped   cost-chosen entry (at sf10/sf30: staged key-hierarchy
                  rollup — per-orderkey, re-agg per custkey, shuffle
                  join with customer)
  js_v1_midforce  per-order rollup + FORCED broadcast customer (the
                  sf10-class middle form past its row-cap gate)
  js_v2_plain     plain 5-way join tree, no pre-aggregation (what a
                  naive user writes; Catalyst broadcasts what fits)
  js_scanfloor    lineitem scan + micro-unit revenue reduce (the
                  irreducible cost of reading the fact columns)

bucketed_join candidates (identical 5-row output verified per run;
table builds happen once per session BEFORE timing — bench reports them
as untimed construction):
  bk_v0_shipped   16-bucket SMJ with merge hint (the entry)
  bk_v1_b32       32-bucket layout (16 buckets = only 16 scan/join
                  tasks on a 32-core box — the hypothesis is bucket
                  count, not plan shape)
  bk_v2_broadcast raw parquet orders + broadcast customer (what the
                  cost model would pick with no layout)
  bk_v3_shuffle   raw parquet SMJ, no bucketing (the write-amortization
                  counterfactual: what every query pays WITHOUT the
                  bucketed layout)
  bk_scanfloor    orders scan + totalprice reduce (plain double sums in
                  both floors: the micro-unit encoding overflows 2^63 at
                  the GLOBAL grain past ~sf25; the entries group below it)

MEASURED 2026-08-15 (interleaved min-of-3, ONE session per scale,
rechunked + page-cache-warmed, idle host — 1-min load 0.10 at sf10
start):

  sf10: js_v0_shipped 2.713 [3.106, 2.912, 2.713]
        js_v1_midforce 3.113 [3.243, 3.357, 3.113]
        js_v2_plain    3.634 [4.515, 3.722, 3.634]
        js_scanfloor   0.251    duckdb join_star 0.922
        bk_v0_shipped  0.626 [0.921, 0.644, 0.626]
        bk_v1_b32      0.778 [1.093, 0.836, 0.778]
        bk_v2_broadcast 0.916   bk_v3_shuffle 1.036
        bk_scanfloor   0.155    duckdb bucketed 0.122

  sf30: js_v0_shipped 7.356 [7.744, 7.356, 8.279]
        js_v1_midforce 7.192 [9.875, 7.192, 7.275]
        js_v2_plain   10.288 [12.271, 10.288, 12.019]
        js_scanfloor   0.452    duckdb join_star 2.699
        bk_v0_shipped  1.070 [1.259, 1.070, 1.208]
        bk_v1_b32      1.082 [1.148, 1.082, 1.144]
        bk_v2_broadcast 2.492   bk_v3_shuffle 1.989
        bk_scanfloor   0.147    duckdb bucketed 0.368

VERDICTS (both cells: shipped form stands, no code change):
- join_star_flagship: the shipped staged form wins clearly at sf10
  (2.71 vs 3.11/3.63) and ties the forced-broadcast middle form within
  noise at sf30 (7.36 vs 7.19 min, but the middle form's worst pass is
  9.9 s and its 4.5M-row broadcast build is the q22-audited
  single-threaded hazard the row cap exists for — not worth the
  variance for a ~2% min). The plain tree loses 34-40% at both scales:
  the staged rollup is doing its job. Ratio vs DuckDB 2.7-2.9x with
  the scan floor at ~1/6 of DuckDB's whole query: the residual is the
  order-grain exchange + SMJ that DuckDB replaces with one fused
  morsel-pass hash join — the q3/q5/q8-audited executor-model family,
  not a plan gap. REJECTED: js_v1_midforce (variance + build hazard,
  no min win), js_v2_plain (2x).
- bucketed_join_revenue: 16 vs 32 buckets is a TIE at sf30 (1.070 vs
  1.082) and 16 wins at sf10 (0.626 vs 0.778) — the parallelism
  hypothesis is REJECTED; the merge pass is not task-starved. Both
  bucketed forms beat the no-layout counterfactuals (broadcast 2.3x,
  raw shuffle 1.9x worse at sf30), which is the property the entry
  demonstrates. Vs DuckDB 2.9x at sf30: Spark's bare 2-column orders
  scan-reduce (0.147) is already 40% of DuckDB's WHOLE hash join —
  the residual is the streaming sorted-merge + per-row agg vs a radix
  hash join, engine-model, not plan. REJECTED: bk_v1_b32 (no win),
  bk_v2_broadcast, bk_v3_shuffle (both ~2x worse).

Usage: python tools/star_join_ab.py [sf_dir] [passes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
import duckdb
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark import (
    get_spark,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.functions.numerics import (
    micro_units,
    stable_sum,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (
    oracle_sql,
    queries,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
    register_views,
)


def js_v1_midforce(t):
    """The middle form with customer broadcast FORCED past the row cap."""
    l, o, c = t["lineitem"], t["orders"], t["customer"]
    n, r = t["nation"], t["region"]
    per_order = l.groupBy("l_orderkey").agg(
        F.sum(
            micro_units(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("rev_micro"),
        F.count("*").alias("n_items"),
    )
    cs = c.select("c_custkey", "c_mktsegment", "c_nationkey")
    return (
        per_order.join(
            o.select("o_orderkey", "o_custkey"),
            per_order.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(cs), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "c_mktsegment")
        .agg(
            (F.sum("rev_micro") / F.lit(1e6)).alias("revenue"),
            F.sum("n_items").alias("n_items"),
        )
    )


def js_v2_plain(t):
    l, o, c = t["lineitem"], t["orders"], t["customer"]
    n, r = t["nation"], t["region"]
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "c_mktsegment")
        .agg(
            stable_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def js_scanfloor(t):
    # plain double sum: a floor probe only needs scan + reduce; the exact
    # micro-unit encoding overflows 2^63 at the GLOBAL grain past ~sf25
    # (the entries themselves always group below that grain)
    return t["lineitem"].select(
        F.count("l_orderkey"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
    )


def bk_make(spark, t, n_buckets):
    """Build (once) and return the two bucketed relations at the given
    bucket count, merge-hinted join + rollup — the entry's timed shape."""
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.scale import (
        _corpus_digest,
        _session_token,
        ensure_bucketed_table,
    )

    orders, cust = t["orders"], t["customer"]
    digest = _corpus_digest(orders, cust)
    tok = _session_token()
    to = f"bk_orders_{n_buckets}_{digest}_{tok}"
    tc = f"bk_customer_{n_buckets}_{digest}_{tok}"
    ensure_bucketed_table(
        spark, to, orders.select("o_custkey", "o_totalprice"), "o_custkey",
        digest, n_buckets=n_buckets,
    )
    ensure_bucketed_table(
        spark, tc, cust.select("c_custkey", "c_mktsegment"), "c_custkey",
        digest, n_buckets=n_buckets,
    )

    def run():
        o = spark.table(to)
        c = spark.table(tc).hint("merge")
        return (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n_orders"),
                stable_sum("o_totalprice").alias("total_revenue"),
            )
        )

    return run


def bk_v2_broadcast(t):
    o = t["orders"].select("o_custkey", "o_totalprice")
    c = t["customer"].select("c_custkey", "c_mktsegment")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            stable_sum("o_totalprice").alias("total_revenue"),
        )
    )


def bk_v3_shuffle(t):
    o = t["orders"].select("o_custkey", "o_totalprice")
    c = t["customer"].select("c_custkey", "c_mktsegment").hint("merge")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            stable_sum("o_totalprice").alias("total_revenue"),
        )
    )


def bk_scanfloor(t):
    return t["orders"].select(
        F.count("o_custkey"), F.sum(F.col("o_totalprice"))
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaled/sf10"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = bench._rechunk(sf_dir)
    bench._warm_page_cache(sf_dir)
    spark = get_spark(
        app_name="star-join-ab",
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
    qs = queries()

    def rows(df):
        return sorted(
            tuple(round(v, 4) if isinstance(v, float) else v for v in r)
            for r in df.collect()
        )

    bk16 = bk_make(spark, t, 16)
    bk32 = bk_make(spark, t, 32)
    forms = {
        "js_v0_shipped": lambda: qs["join_star_flagship"](spark, sf_dir),
        "js_v1_midforce": lambda: js_v1_midforce(t),
        "js_v2_plain": lambda: js_v2_plain(t),
        "js_scanfloor": lambda: js_scanfloor(t),
        "bk_v0_shipped": bk16,
        "bk_v1_b32": bk32,
        "bk_v2_broadcast": lambda: bk_v2_broadcast(t),
        "bk_v3_shuffle": lambda: bk_v3_shuffle(t),
        "bk_scanfloor": lambda: bk_scanfloor(t),
    }
    assert (
        rows(forms["js_v0_shipped"]())
        == rows(forms["js_v1_midforce"]())
        == rows(forms["js_v2_plain"]())
    ), "join_star candidate outputs diverge"
    assert (
        rows(forms["bk_v0_shipped"]())
        == rows(forms["bk_v1_b32"]())
        == rows(forms["bk_v2_broadcast"]())
        == rows(forms["bk_v3_shuffle"]())
    ), "bucketed candidate outputs diverge"
    print("outputs identical within each family")

    res = {name: [] for name in forms}
    for _ in range(passes):
        for name, fn in forms.items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            res[name].append(round(time.perf_counter() - t0, 3))
    for name, vals in res.items():
        print(f"{name}: min {min(vals)} passes {vals}")

    con = duckdb.connect()
    con.execute("SET timezone='UTC'")
    for tname in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem"):
        p = os.path.join(sf_dir, f"{tname}.parquet")
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM read_parquet({src})")
    osql = oracle_sql()
    for name in ("join_star_flagship", "bucketed_join_revenue"):
        vals = []
        for _ in range(passes):
            t0 = time.perf_counter()
            con.execute(osql[name]).fetchall()
            vals.append(round(time.perf_counter() - t0, 3))
        print(f"duckdb {name}: min {min(vals)} passes {vals}")


if __name__ == "__main__":
    main()

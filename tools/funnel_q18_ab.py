#!/usr/bin/env python
"""Round-11 rejection audit for the two never-audited weak cells
(r10 verdict item 3): events_funnel_conversion (3.0x sf30 in the r10
replicate leg, 1.13 s abs) and tpch_q18_large_volume_customers (2.2x
sf30, 5.47 s — plan-gated all-broadcast but no recorded alternative
measurement).

Forms (identical outputs asserted within each family before timing):

  funnel_v0_shipped   one scan, one object-agg: conditional MIN +
                      sorted purchase-ts array, codegen'd array probe
  funnel_v1_window    sort-based alternative: running MIN(view ts)
                      window + plain codegen'd hash agg — NO
                      ObjectHashAggregate anywhere (candidate because
                      the object-agg family is this host's documented
                      drift family)
  funnel_v2_joinform  the pre-r08 two-rollup + join form (re-measured
                      for the record)
  funnel_scanfloor    count+min over the view/purchase-filtered scan
                      (work every form must do)

  q18_v0_shipped      one lineitem rollup -> HAVING -> broadcast into
                      orders -> broadcast into customer
  q18_v1_smj          naive order: customer JOIN orders shuffled first,
                      then the rollup joins in (the textbook plan)
  q18_rollupfloor     the lineitem (l_orderkey, sum qty) rollup alone —
                      the one exchange every correct plan pays

Protocol: tools/q3q5_ab.py discipline — ONE session, bench at-scale
conf (AQE on, 32 shuffle partitions, 64 MB broadcast), rechunked +
page-cache-warmed corpus, noop-sink timing, interleaved passes,
DuckDB same-process on the same files afterwards, min-of-N.

VERDICT (measured 2026-08-15 by this tool at sf30 — 1-min load 0.69 at
launch but 5-min 9.8: residual heat from the same-session pagerank
audit, visible as pass spread; passes 3, min-of-3):

  funnel: v0_shipped 1.22   v1_window 1.04   v2_joinform 1.13
          scanfloor 0.295   duckdb 0.302
  q18:    v0_shipped 5.54   v1_smj 7.14      rollupfloor 3.47
          duckdb 2.70

Both shipped forms STAND — with the floor named in both cases:

* funnel: the three forms sit within 0.2 s of each other and a
  follow-up cross-scale re-check on a quieter host read v0 vs v1 as a
  TIE (sf0.1: 0.231 vs 0.245; sf10: 0.582 vs 0.578, min-of-5
  interleaved) — the sf30 margin was pass noise, so no form switch.
  The finding that matters: DuckDB's WHOLE funnel (0.302 s) runs at
  Spark's bare filtered-scan floor (0.295 s) — whatever form Spark
  picks, the 0.7-0.9 s residual is one exchange + agg over what DuckDB
  fuses into its scan morsels. Executor-model floor, not a plan gap.
* q18: the all-broadcast chain beats the textbook shuffle order by
  29%, and the lineitem rollup ALONE (3.47 s — the one exchange every
  correct plan pays) exceeds DuckDB's entire query (2.70 s): the cell
  IS the q1-family scan-aggregate floor plus two broadcast probes.
  Nothing above the floor is left to squeeze.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

import bench  # noqa: E402
import duckdb  # noqa: E402
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark import (  # noqa: E402
    get_spark,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.functions.numerics import (  # noqa: E402
    stable_sum,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (  # noqa: E402
    oracle_sql,
    queries,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (  # noqa: E402
    register_views,
)


def funnel_v1_window(t):
    ev = (
        t["events"]
        .where(F.col("event_type").isin("view", "purchase"))
        .select("user_id", "ts", "event_type")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fv = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    cand = ev.withColumn("fv", fv)
    return (
        cand.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
                "first_view"
            ),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("fv")),
                    F.col("ts"),
                )
            ).alias("first_purchase"),
        )
        .where(
            F.col("first_view").isNotNull() & F.col("first_purchase").isNotNull()
        )
        .select("user_id", "first_view", "first_purchase")
    )


def funnel_v2_joinform(t):
    ev = t["events"]
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    return (
        p.join(v, "user_id")
        .where(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(
            F.min("first_view").alias("first_view"),
            F.min("ts").alias("first_purchase"),
        )
        .select("user_id", "first_view", "first_purchase")
    )


def funnel_scanfloor(t):
    ev = t["events"].where(F.col("event_type").isin("view", "purchase"))
    return ev.select(
        F.count("user_id"), F.min("ts"), F.count(F.col("event_type"))
    )


def q18_v1_smj(t):
    c, o, l = t["customer"], t["orders"], t["lineitem"]
    big = (
        l.groupBy("l_orderkey")
        .agg(stable_sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250)
        .withColumnRenamed("l_orderkey", "big_key")
    )
    co = c.hint("merge").join(o, c.c_custkey == o.o_custkey)
    return (
        co.join(big, F.col("o_orderkey") == F.col("big_key"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


def q18_rollupfloor(t):
    l = t["lineitem"]
    return (
        l.groupBy("l_orderkey")
        .agg(stable_sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250)
        .select(F.count("l_orderkey"), F.sum("total_qty"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaled/sf30"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    print("load_avg_start:", os.getloadavg())
    sf_dir = bench._rechunk(sf_dir)
    bench._warm_page_cache(sf_dir)
    spark = get_spark(
        app_name="funnel-q18-ab",
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
        return sorted(tuple(r) for r in df.collect())

    forms = {
        "funnel_v0_shipped": lambda: qs["events_funnel_conversion"](spark, sf_dir),
        "funnel_v1_window": lambda: funnel_v1_window(t),
        "funnel_v2_joinform": lambda: funnel_v2_joinform(t),
        "funnel_scanfloor": lambda: funnel_scanfloor(t),
        "q18_v0_shipped": lambda: qs["tpch_q18_large_volume_customers"](
            spark, sf_dir
        ),
        "q18_v1_smj": lambda: q18_v1_smj(t),
        "q18_rollupfloor": lambda: q18_rollupfloor(t),
    }
    r0 = rows(forms["funnel_v0_shipped"]())
    assert r0, "funnel returned nothing — vacuous A/B"
    assert r0 == rows(forms["funnel_v1_window"]()) == rows(
        forms["funnel_v2_joinform"]()
    ), "funnel forms disagree"
    r0 = rows(forms["q18_v0_shipped"]())
    assert r0, "q18 returned nothing — vacuous A/B"
    assert r0 == rows(forms["q18_v1_smj"]()), "q18 forms disagree"
    print("outputs identical within each family")

    res = {}
    for _ in range(passes):
        for name, fn in forms.items():
            df = fn()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            res.setdefault(name, []).append(round(time.perf_counter() - t0, 3))
    for name, vals in res.items():
        print(f"{name}: min {min(vals)} passes {vals}")

    con = duckdb.connect()
    for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
                "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{tbl}.parquet")
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet({src})")
    osql = oracle_sql()
    for name in ["events_funnel_conversion", "tpch_q18_large_volume_customers"]:
        vals = []
        for _ in range(passes):
            t0 = time.perf_counter()
            con.execute(osql[name]).fetchall()
            vals.append(round(time.perf_counter() - t0, 3))
        print(f"duckdb {name}: min {min(vals)} passes {vals}")
    print("load_avg_end:", os.getloadavg())


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-7 A/B for cdc_merge_apply's join shape.

The shipped form is one full-outer keyed join — correct at any feed
size, but a full-outer cannot broadcast in Spark, so the SNAPSHOT
shuffles even when the change feed is tiny (the common CDC case). The
candidate decomposes MERGE into:

  main  = snapshot LEFT JOIN broadcast(changes)   -- matched U/D + carry
  ins   = changes LEFT ANTI snapshot.select(key)  -- unmatched upserts
  out   = main (D dropped) UNION ALL ins

main broadcasts (left-outer build-right IS broadcastable), so the only
exchange touching snapshot-scale data is the anti branch's KEY-ONLY
shuffle — 8-byte keys instead of full rows.

Measured (interleaved min-of-N, same session, identical rollups):

  sf0.1 (min-of-2): v0 0.91  v1 0.55  duckdb 0.049
  sf10  (min-of-3): v0 1.84  v1 7.81  duckdb 0.271

Conclusion: REJECTED — the shipped full-outer stands. The registered
entry's change feed is ~20% of orders by construction (it is derived
from the orders table), so it scales WITH the corpus: at sf10 the
"broadcast" side is ~3M rows built serially on the driver and shipped
twice (once per branch), plus a key-only snapshot shuffle for the anti —
strictly more work than the one full-outer exchange. The decomposition
only wins when the feed is genuinely small relative to the snapshot
(sf0.1's inversion shows the crossover exists); at a real deployment
that case is better served by cdc_merge_incremental's bucketed target,
which makes the snapshot side exchange-free at ANY feed size instead of
betting on a broadcastable feed.

Usage: python tools/cdc_ab.py <sf_dir> [passes]
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
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
    register_views,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators import (
    changes as ch,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (
    oracle_sql,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.functions.numerics import (
    stable_sum,
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaled/sf10"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = bench._rechunk(sf_dir)
    bench._warm_page_cache(sf_dir)
    spark = get_spark(
        app_name="cdc-ab",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024 * 1024),
            "spark.sql.shuffle.partitions": "32",
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.driver.memory": "24g",
        },
    )
    t = register_views(spark, sf_dir)
    t["orders"].count()
    o = t["orders"]

    def snapshot():
        return o.select(
            F.col("o_orderkey").alias("key"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderstatus").alias("status"),
        )

    def rollup(merged):
        return merged.groupBy("status").agg(
            F.count("*").alias("n_orders"),
            stable_sum("price").alias("total_price"),
        )

    def v0_full_outer():
        return rollup(ch._merge_batch(snapshot(), ch._changes_batch1(o)))

    def v1_broadcast_split():
        s = snapshot().alias("s")
        feed = ch._changes_batch1(o)
        c = F.broadcast(feed.alias("c"))
        main_rows = (
            s.join(c, F.col("s.key") == F.col("c.key"), "left")
            .where(F.col("c.op").isNull() | (F.col("c.op") != "D"))
            .select(
                F.col("s.key").alias("key"),
                F.when(F.col("c.op").isin("U", "I"), F.col("c.price"))
                .otherwise(F.col("s.price"))
                .alias("price"),
                F.when(F.col("c.op").isin("U", "I"), F.col("c.status"))
                .otherwise(F.col("s.status"))
                .alias("status"),
            )
        )
        ins = (
            feed.join(snapshot().select("key"), "key", "left_anti")
            .where(F.col("op") != "D")
            .select("key", "price", "status")
        )
        return rollup(main_rows.unionAll(ins))

    forms = {"v0_full_outer": v0_full_outer, "v1_broadcast_split": v1_broadcast_split}
    ref = None
    for name, mk in forms.items():
        rows = sorted(tuple(r) for r in mk().collect())
        assert rows, f"{name}: empty result (vacuous agreement)"
        ref = rows if ref is None else ref
        assert rows == ref, name
    print("forms agree")
    best = {n: None for n in forms}
    for _ in range(passes):
        for name, mk in forms.items():
            df = mk()
            st = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - st
            best[name] = el if best[name] is None else min(best[name], el)
    for name, b in best.items():
        print(f"{name}: {b:.3f}", flush=True)
    con = duckdb.connect()
    p = os.path.join(sf_dir, "orders.parquet")
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet({src})")
    sql = oracle_sql()["cdc_merge_apply"]
    b = None
    for _ in range(passes):
        st = time.perf_counter()
        con.execute(sql).fetchall()
        el = time.perf_counter() - st
        b = el if b is None else min(b, el)
    print(f"duckdb: {b:.3f}")


if __name__ == "__main__":
    main()

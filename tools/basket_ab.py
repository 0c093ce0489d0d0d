#!/usr/bin/env python
"""Round-7 A/B for the basket-mining pair-count primitive.

basket_lift_rules was the largest absolute cell in the r07 curve
(17.5 s at sf10, 2.3x). Candidate rewrite: route its (part_a, part_b,
n_ab) source through the shared packed-key machinery PageRank's edge
build uses (graph.copurchase_pair_counts) instead of the shipped
distinct + self-join + near-unique-key hash aggregation.

Forms (all verified to produce identical top-20 rule rows):
  v0_selfjoin    r01-r06 shipped form — distinct items, self-join on
                 orderkey, groupBy(part_a, part_b) count, support >= 2
  v1_packed_vec  collect_set baskets -> packed 8-byte pair explode ->
                 hash-partitioned per-partition numpy sort+count
                 (mapInPandas) carrying counts out
  v2_packed_gb   same packed explode, plain groupBy(pk) count (isolates
                 explode-vs-self-join from vec-vs-hashagg)
  v3_struct      struct-pair explode + groupBy (no 2^31 assumption)
  v4_shared_baskets  v3's pairs PLUS sup and total all derived from one
                 order_baskets subtree — one lineitem exchange total
                 instead of three

Measured (interleaved min-of-3, same session; v0-v3 feed the identical
per-relation rules tail, v4 is the whole-query rewrite):

  sf10: v0 17.14  v1 19.71  v2 17.79  v3 17.73  v4 15.55  duckdb 6.77
  sf0.1 (min-of-2): v0 2.29  v1 1.29  v2 1.51  v3 1.33  v4 1.16

Conclusion (shipped as the round-7 basket_lift_rules): v4. The pair-
build variants are within noise of each other — the three separate
lineitem shuffles in the rules tail were the real cost, not the rollup
form — and the packed+vectorized rollup that wins inside PageRank's
edge build LOSES here (v1 worst at sf10: carrying counts through the
Arrow round-trip costs more than the hash agg it replaces). The struct
form needs no partkey-width guard, so the production primitive
(graph.copurchase_pair_counts) is JVM-only and scale-safe.

Round-10 addendum — the r09 verdict flagged basket's at-scale cells
(25.0 s/4.2x sf10, 83.7 s/2.8x sf30 in the r09 curve legs) as lacking a
CURRENT at-scale rejection audit. Re-run 2026-08-15 at sf10 (interleaved
min-of-3, one session, idle host, same config): v1_packed_vec 18.674,
v2_packed_gb 15.686, v3_struct 14.973, **v4_shared_baskets 14.653**
(shipped, wins again), duckdb 5.993 — ratio 2.45x. The r09 leg's 25 s
was the documented object-agg host-drift family (same code measured 15.6
in the r08 leg and 14.7 here); v4 remains the rejection-audited floor:
every candidate loses, and the residual vs DuckDB is the collect_set
basket build (ObjectHashAggregate) that DuckDB's list() vectorizes —
engine-model, not plan. VERDICT unchanged: v4 ships.

Round-9 addendum — the apparent sf0.1 driver regression (r07 0.159 s on
v0 -> r08 1.01 s on v4) was re-adjudicated under the EXACT bench
small-scale config (AQE off, shuffle.partitions=8, 10 MB broadcast
threshold, rechunked + page-cache-warmed sf0.1), both whole-query forms
interleaved min-of-6 in ONE session: v0 0.800 s (passes 2.158, 1.129,
0.913, 1.030, 0.800, 0.833), v4 0.737 s (1.334, 0.742, 0.849, 0.760,
0.743, 0.737), outputs identical. v4 wins at sf0.1 under bench
conditions too; the r07 0.159 s belongs to a faster host state
(BASELINE.md's r07 host-drift control), not to the old form. NO cost
gate: the shared-baskets form is the single shipped form at every
scale. (The sf0.1 table above reads v0 2.29 / v4 1.16 because this
harness uses the AQE-on/32-partition at-scale session, not the bench's
small-scale one — same ordering, different floor.)

Usage: python tools/basket_ab.py <sf_dir> [passes]
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
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (
    oracle_sql,
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaled/sf10"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = bench._rechunk(sf_dir)
    bench._warm_page_cache(sf_dir)
    spark = get_spark(
        app_name="basket-ab",
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
    t["lineitem"].count()

    def pairs_selfjoin():
        items = t["lineitem"].select("l_orderkey", "l_partkey").distinct()
        a = items.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
        )
        b = items.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
        )
        return (
            a.join(b, "ok")
            .where(F.col("part_a") < F.col("part_b"))
            .groupBy("part_a", "part_b")
            .agg(F.count("*").alias("n_ab"))
            .where(F.col("n_ab") >= 2)
        )

    def _baskets():
        return t["lineitem"].groupBy("l_orderkey").agg(
            F.collect_set("l_partkey").alias("parts")
        )

    packed = F.expr(
        "flatten(transform(parts, x -> "
        f"transform(filter(parts, y -> y > x), y -> x * {1 << 31} + y)))"
    )

    def pairs_packed_vec():
        # Inline (the production helper dropped this path after it lost):
        # packed explode -> hash-partition -> per-partition numpy
        # sort+count carrying counts out.
        import pandas as pd  # noqa: F401

        def kernel(batches):
            import numpy as np
            import pandas as pd

            chunks = [b["pk"].to_numpy() for b in batches]
            if not chunks:
                return
            u, c = np.unique(np.concatenate(chunks), return_counts=True)
            keep = c >= 2
            yield pd.DataFrame({"pk": u[keep], "n_ab": c[keep].astype("int64")})

        pk = _baskets().select(F.explode(packed).alias("pk"))
        cnt = pk.repartition(32, "pk").mapInPandas(kernel, "pk long, n_ab long")
        return cnt.select(
            F.expr(f"pk div {1 << 31}").alias("part_a"),
            (F.col("pk") % F.lit(1 << 31)).alias("part_b"),
            "n_ab",
        )

    def pairs_packed_gb():
        pk = _baskets().select(F.explode(packed).alias("pk"))
        cnt = (
            pk.groupBy("pk")
            .agg(F.count("*").alias("n_ab"))
            .where(F.col("n_ab") >= 2)
        )
        return cnt.select(
            F.expr(f"pk div {1 << 31}").alias("part_a"),
            (F.col("pk") % F.lit(1 << 31)).alias("part_b"),
            "n_ab",
        )

    def pairs_struct():
        ps = F.expr(
            "flatten(transform(parts, x -> transform(filter(parts, y -> y > x),"
            " y -> struct(x AS part_a, y AS part_b))))"
        )
        return (
            _baskets()
            .select(F.explode(ps).alias("p"))
            .select("p.part_a", "p.part_b")
            .groupBy("part_a", "part_b")
            .agg(F.count("*").alias("n_ab"))
            .where(F.col("n_ab") >= 2)
        )

    def rules(pairs):
        items = t["lineitem"].select("l_orderkey", "l_partkey").distinct()
        sup = items.groupBy("l_partkey").agg(F.count("*").alias("n"))
        total = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
        sup_a = sup.select(
            F.col("l_partkey").alias("part_a"), F.col("n").alias("sup_a")
        )
        sup_b = sup.select(
            F.col("l_partkey").alias("part_b"), F.col("n").alias("sup_b")
        )
        return (
            pairs.join(F.broadcast(sup_a), "part_a")
            .join(F.broadcast(sup_b), "part_b")
            .crossJoin(F.broadcast(total))
            .select(
                "part_a",
                "part_b",
                "n_ab",
                (
                    (F.col("n_ab") * F.col("n_orders")).cast("double")
                    / (F.col("sup_a") * F.col("sup_b")).cast("double")
                ).alias("lift"),
            )
            .orderBy(F.desc("lift"), F.desc("n_ab"), "part_a", "part_b")
            .limit(20)
        )

    def rules_shared_baskets():
        # Everything — pair counts, per-part support, order total — derives
        # from ONE baskets subtree, so Catalyst/AQE reuses a single
        # lineitem exchange (ReusedExchange) instead of the three separate
        # lineitem shuffles the per-relation forms pay (items.distinct for
        # the pairs, again for sup, again for total).
        baskets = _baskets()
        total = baskets.agg(F.count("*").alias("n_orders"))
        sup = (
            baskets.select(F.explode("parts").alias("l_partkey"))
            .groupBy("l_partkey")
            .agg(F.count("*").alias("n"))
        )
        ps = F.expr(
            "flatten(transform(parts, x -> transform(filter(parts, y -> y > x),"
            " y -> struct(x AS part_a, y AS part_b))))"
        )
        pairs = (
            baskets.select(F.explode(ps).alias("p"))
            .select("p.part_a", "p.part_b")
            .groupBy("part_a", "part_b")
            .agg(F.count("*").alias("n_ab"))
            .where(F.col("n_ab") >= 2)
        )
        sup_a = sup.select(
            F.col("l_partkey").alias("part_a"), F.col("n").alias("sup_a")
        )
        sup_b = sup.select(
            F.col("l_partkey").alias("part_b"), F.col("n").alias("sup_b")
        )
        return (
            pairs.join(F.broadcast(sup_a), "part_a")
            .join(F.broadcast(sup_b), "part_b")
            .crossJoin(F.broadcast(total))
            .select(
                "part_a",
                "part_b",
                "n_ab",
                (
                    (F.col("n_ab") * F.col("n_orders")).cast("double")
                    / (F.col("sup_a") * F.col("sup_b")).cast("double")
                ).alias("lift"),
            )
            .orderBy(F.desc("lift"), F.desc("n_ab"), "part_a", "part_b")
            .limit(20)
        )

    forms = {
        "v0_selfjoin": pairs_selfjoin,
        "v1_packed_vec": pairs_packed_vec,
        "v2_packed_gb": pairs_packed_gb,
        "v3_struct": pairs_struct,
    }
    full = {name: (lambda mk=mk: rules(mk())) for name, mk in forms.items()}
    full["v4_shared_baskets"] = rules_shared_baskets
    ref = None
    for name, mk in full.items():
        rows = sorted(tuple(r) for r in mk().collect())
        assert rows, f"{name}: empty result (vacuous agreement)"
        ref = rows if ref is None else ref
        assert rows == ref, name
    print("all forms agree")
    n_reuse = (
        rules_shared_baskets()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .count("ReusedExchange")
    )
    print(f"v4 executed plan ReusedExchange nodes: {n_reuse}")
    # Interleaved passes so host drift hits every form equally.
    best = {n: None for n in full}
    for _ in range(passes):
        for name, mk in full.items():
            df = mk()
            s = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - s
            best[name] = el if best[name] is None else min(best[name], el)
    for name, b in best.items():
        print(f"{name}: {b:.3f}", flush=True)
    con = duckdb.connect()
    p = os.path.join(sf_dir, "lineitem.parquet")
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet({src})")
    sql = oracle_sql()["basket_lift_rules"]
    b = None
    for _ in range(passes):
        s = time.perf_counter()
        con.execute(sql).fetchall()
        el = time.perf_counter() - s
        b = el if b is None else min(b, el)
    print(f"duckdb: {b:.3f}")


if __name__ == "__main__":
    main()

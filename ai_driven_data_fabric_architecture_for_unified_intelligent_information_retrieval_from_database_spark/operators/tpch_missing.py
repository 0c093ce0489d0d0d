"""The six TPC-H shapes whose originals need the partsupp table (absent from
the driver schema, TESTDATA.md): Q2, Q9, Q11, Q12, Q16, Q20. Each is adapted
with the distinct ``(l_partkey, l_suppkey)`` pairs of lineitem standing in as
the part-supplier bridge, keeping the *plan shape* the original exists to
exercise:

- Q2  — correlated scalar-MIN subquery, decorrelated to a per-group window;
- Q9  — four-dimension profit rollup with the aggregation pushed below the
        fact-fact join;
- Q11 — HAVING against a broadcast global-total scalar (value-share cut);
- Q12 — fact-fact non-equi join with two-way conditional counting;
- Q16 — COUNT(DISTINCT) over a bridge join with a NOT-IN exclusion;
- Q20 — nested semi-join chain over a two-level quantity rollup.

Together with operators/tpch.py and tpch_extra.py this completes all 22
TPC-H query shapes.

Scale posture: the part-side filters are applied before the bridge distinct
so the big dedup shuffle carries only matching pairs; every share/threshold
comparison is computed on exact micro-unit longs (functions/numerics
rationale) so the cut is bitwise-identical across engines and partition
orders; dimension sides broadcast.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.numerics import micro_units as _micro
from ..functions.numerics import sql_stable_sum, stable_sum
from .registry import query

#: exact micro-unit accumulator (see functions/numerics.py module docstring):
#: share thresholds compare long-derived doubles, never order-dependent sums.
#: The SQL twin keeps ROUND (cheap in DuckDB); the Spark side uses the
#: codegen-friendly micro_units form — value-identical (numerics.py).
_MICRO = "CAST(ROUND({expr} * 1000000.0) AS BIGINT)"


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
        WITH bridge AS (
            SELECT DISTINCT l.l_partkey, l.l_suppkey
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_size BETWEEN 10 AND 15 AND p.p_type = 'STANDARD'
        ),
        cand AS (
            SELECT p.p_partkey, p.p_brand, p.p_type, n.n_name, s.s_name,
                   s.s_acctbal,
                   MIN(s.s_acctbal) OVER (PARTITION BY p.p_partkey) AS min_bal
            FROM bridge b
            JOIN part p ON p.p_partkey = b.l_partkey
            JOIN supplier s ON s.s_suppkey = b.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
        )
        SELECT p_partkey, p_brand, p_type, n_name, s_name, s_acctbal
        FROM cand
        WHERE s_acctbal = min_bal
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    covers="TPC-H Q2 shape: correlated scalar-MIN subquery (decorrelated to window)",
)
def tpch_q2(spark, t):
    """Minimum-balance supplier per part (adapted: s_acctbal stands in for the
    missing ps_supplycost; lineitem pairs stand in for partsupp).

    The correlated ``= (SELECT MIN ...)`` is decorrelated into a single
    window MIN over the candidate set — one shuffle on p_partkey instead of a
    re-scan per part. The part filter lands *before* the bridge distinct, so
    the dedup shuffle carries only pairs for qualifying parts (~2% of parts),
    and both supplier and nation are broadcast. MIN is comparison-only (no
    arithmetic), so the equality cut is exact in both engines.
    """
    p = (
        t["part"]
        .where(F.col("p_size").between(10, 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_brand", "p_type")
    )
    bridge = (
        t["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_brand", "p_type", "l_suppkey")
        .distinct()
    )
    s = t["supplier"].join(
        F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    cand = bridge.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .select("p_partkey", "p_brand", "p_type", "n_name", "s_name", "s_acctbal")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q9_product_type_profit",
    oracle=f"""
        SELECT n.n_name AS nation,
               CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
               {sql_stable_sum('l.l_extendedprice * (1 - l.l_discount)')} AS sum_profit
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY n.n_name, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT)
    """,
    covers="TPC-H Q9 shape: profit rollup over part/supplier/nation/year",
)
def tpch_q9(spark, t):
    """Profit by supplier nation and order year for one part family
    (adapted: revenue stands in for profit — no ps_supplycost to subtract;
    ``p_name LIKE '%red%'`` is the family filter).

    The revenue aggregation is pushed below the orders join: lineitem is cut
    by the broadcast part filter, grouped by (l_orderkey, n_name) — partial
    combine before the one orderkey shuffle — then the year lands from
    orders and a cheap regroup by (nation, year) finishes. The shuffle
    carries one row per (order, nation), never raw lineitems.
    """
    p = t["part"].where(F.col("p_name").like("%red%")).select("p_partkey")
    s = t["supplier"].join(
        F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    lagg = (
        t["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_orderkey", "n_name")
        .agg(
            F.sum(
                _micro(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("rev_micro")
        )
    )
    o = t["orders"].select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    return (
        lagg.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg((F.sum("rev_micro") / F.lit(1000000.0)).alias("sum_profit"))
    )


@query(
    "tpch_q11_important_part_values",
    oracle=f"""
        WITH nat_items AS (
            SELECT l.l_partkey, {_MICRO.format(expr='l.l_extendedprice')} AS v_micro
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE n.n_name = 'NATION_1'
        ),
        partval AS (
            SELECT l_partkey AS p_partkey, SUM(v_micro) AS value_micro
            FROM nat_items GROUP BY l_partkey
        )
        SELECT p_partkey, CAST(value_micro AS DOUBLE) / 1000000.0 AS part_value
        FROM partval
        WHERE CAST(value_micro AS DOUBLE)
              > 0.001 * (SELECT CAST(SUM(value_micro) AS DOUBLE) FROM partval)
    """,
    covers="TPC-H Q11 shape: HAVING vs global-total scalar subquery",
)
def tpch_q11(spark, t):
    """Parts carrying an outsized share of one nation's shipped value
    (adapted: shipped extendedprice stands in for ps_supplycost*availqty).

    The global total is the sum of the per-part micro-unit longs — exact,
    associative, so re-aggregating group sums equals the direct global sum
    and the 0.1% threshold cut is bitwise-identical in both engines. The
    scalar total joins back as a broadcast (Spark) / scalar subquery
    (DuckDB); the fact table is scanned once.
    """
    s = t["supplier"].join(
        F.broadcast(
            t["nation"].where(F.col("n_name") == "NATION_1").select("n_nationkey")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
        "left_semi",
    ).select("s_suppkey")
    partval = (
        t["lineitem"]
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(_micro(F.col("l_extendedprice"))).alias("value_micro"))
    )
    total = partval.agg(F.sum("value_micro").alias("total_micro"))
    return (
        partval.join(F.broadcast(total))
        .where(
            F.col("value_micro").cast("double")
            > F.lit(0.001) * F.col("total_micro").cast("double")
        )
        .select(
            "p_partkey",
            (F.col("value_micro").cast("double") / F.lit(1000000.0)).alias(
                "part_value"
            ),
        )
    )


@query(
    "tpch_q12_ship_priority_counts",
    oracle="""
        SELECT l.l_linestatus,
               COUNT(*) FILTER (
                   WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               ) AS high_line_count,
               COUNT(*) FILTER (
                   WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               ) AS low_line_count
        FROM orders o
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
          AND l.l_shipdate <  o.o_orderdate + INTERVAL 120 DAY
        GROUP BY l.l_linestatus
    """,
    covers="TPC-H Q12 shape: non-equi fact-fact join + two-way conditional counts",
)
def tpch_q12(spark, t):
    """Late-shipment counts by line status and order priority (adapted:
    l_linestatus stands in for the missing l_shipmode; the 60–120 day
    ship lag stands in for the commit/receipt window).

    The non-equi lag predicate cannot prune the orders scan by itself, so
    the implied bound is applied by hand: shipdate in 1997 with a 60–120 day
    lag forces o_orderdate into (1996-09-04, 1997-11-01] — Catalyst cannot
    derive a range across a non-equi condition. Both prunes reach the
    parquet scans; the one shuffle is the orderkey equi-join, with the lag
    window evaluated as a post-join filter.
    """
    l = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    o = t["orders"].where(
        (F.col("o_orderdate") > F.lit("1996-09-03 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") <= F.lit("1997-11-01 00:00:00").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            l,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 120 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q16_supplier_relationship_count",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT b.l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
        JOIN part p ON p.p_partkey = b.l_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
          AND b.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    covers="TPC-H Q16 shape: COUNT(DISTINCT) over bridge join + NOT-IN exclusion",
)
def tpch_q16(spark, t):
    """Distinct supplier count per (brand, type, size) family, excluding
    suppliers in arrears (adapted: ``s_acctbal < 0`` stands in for the
    complaints LIKE-filter; lineitem pairs for partsupp).

    The part filter broadcasts into lineitem *before* the pair distinct, and
    the exclusion is a broadcast anti-join (NOT IN over a non-null key is
    exactly left_anti). The distinct + countDistinct pair collapses into one
    two-phase shuffle on the group keys — no all-pairs anywhere.
    """
    p = (
        t["part"]
        .where(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = t["supplier"].where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20_dominant_part_suppliers",
    oracle="""
        WITH partqty AS (
            SELECT l.l_suppkey, l.l_partkey,
                   SUM(CAST(ROUND(l.l_quantity * 1000000.0) AS BIGINT)) AS qty_micro
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
            WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l.l_suppkey, l.l_partkey
        ),
        parttot AS (
            SELECT l_partkey, SUM(qty_micro) AS tot_micro
            FROM partqty GROUP BY l_partkey
        )
        SELECT s.s_name, s.s_acctbal
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
          AND s.s_suppkey IN (
              SELECT pq.l_suppkey
              FROM partqty pq
              JOIN parttot pt ON pt.l_partkey = pq.l_partkey
              WHERE CAST(pq.qty_micro AS DOUBLE)
                    > 0.3 * CAST(pt.tot_micro AS DOUBLE)
          )
    """,
    covers="TPC-H Q20 shape: nested semi-join chain over a two-level rollup",
)
def tpch_q20(spark, t):
    """Suppliers who dominate (>30% of 1997 volume) some PROMO part, within
    three nations (adapted: shipped-quantity share stands in for the
    availqty-vs-demand test).

    Two-level rollup: (supplier, part) quantities first — one shuffle, with
    map-side combine — then per-part totals re-aggregate those group sums
    (exact long addition, so the share cut is engine-identical). The
    dominant-pair set reaches supplier as a broadcast semi-join; nation is a
    broadcast semi-join too. The fact table is scanned once.
    """
    p = t["part"].where(F.col("p_type") == "PROMO").select("p_partkey")
    partqty = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_micro(F.col("l_quantity"))).alias("qty_micro"))
    )
    parttot = partqty.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("qty_micro").alias("tot_micro")
    )
    dominant = (
        partqty.join(parttot, F.col("l_partkey") == F.col("pt_partkey"))
        .where(
            F.col("qty_micro").cast("double")
            > F.lit(0.3) * F.col("tot_micro").cast("double")
        )
        .select("l_suppkey")
        .distinct()
    )
    nat = t["nation"].where(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    ).select("n_nationkey")
    return (
        t["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(F.broadcast(dominant), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )

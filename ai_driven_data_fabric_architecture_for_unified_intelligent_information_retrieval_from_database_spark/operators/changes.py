"""Change-data-capture operators: MERGE/upsert application and SCD-2
history building (north-star expansion — the incremental-maintenance
primitives a continuously-refreshed 100 TB corpus needs; the reference's
Django ORM mutates rows in place and has no batch-change surface).

Both operators derive their change feeds DETERMINISTICALLY from the test
tables (the same re-injection idiom dedup_exact and text_pii_scrub use),
so the DuckDB oracles replay identical inputs and the hash compare is
exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.numerics import sql_stable_sum, stable_sum
from .registry import query

#: The synthetic change feed, shared by the Spark plan and the oracle:
#: one update, one delete, and one insert slice of orders, keyed so the
#: slices are disjoint and insert keys cannot collide with live keys.
_CHANGES_SQL = """
        changes AS (
            SELECT o_orderkey AS key, 'U' AS op,
                   o_totalprice + 100.0 AS price, 'U' AS status
            FROM orders WHERE o_orderkey % 10 = 3
            UNION ALL
            SELECT o_orderkey AS key, 'D' AS op,
                   CAST(NULL AS DOUBLE) AS price, CAST(NULL AS VARCHAR) AS status
            FROM orders WHERE o_orderkey % 10 = 7
            UNION ALL
            SELECT o_orderkey + 1000000000 AS key, 'I' AS op,
                   o_totalprice AS price, 'N' AS status
            FROM orders WHERE o_orderkey % 10 = 1
        )
"""


@query(
    "cdc_merge_apply",
    oracle=f"""
        WITH snapshot AS (
            SELECT o_orderkey AS key, o_totalprice AS price,
                   o_orderstatus AS status
            FROM orders
        ),
        {_CHANGES_SQL},
        merged AS (
            SELECT COALESCE(c.key, s.key) AS key,
                   CASE WHEN c.op IN ('U', 'I') THEN c.price
                        ELSE s.price END AS price,
                   CASE WHEN c.op IN ('U', 'I') THEN c.status
                        ELSE s.status END AS status
            FROM snapshot s FULL OUTER JOIN changes c ON s.key = c.key
            WHERE c.op IS NULL OR c.op <> 'D'
        )
        SELECT status, COUNT(*) AS n_orders,
               {sql_stable_sum('price')} AS total_price
        FROM merged GROUP BY status
    """,
    covers="expansion: MERGE/upsert application (CDC apply via full-outer "
    "join — insert + update + delete in one keyed pass)",
)
def cdc_merge_apply(spark, t):
    """Apply a change feed (inserts, updates, deletes) onto a snapshot in
    one keyed pass — relational MERGE semantics, the batch form of what a
    lakehouse MERGE INTO executes (connectors.py documents the delta/
    iceberg jar limit; this is the engine-level shape those formats
    optimize with file skipping).

    The snapshot full-outer-joins the change feed on the key: matched 'U'
    rows take the change's values, matched 'D' rows are dropped,
    unmatched change rows ('I') insert, unmatched snapshot rows carry
    over. Output is the post-merge per-status rollup, which pins every
    branch (counts move between statuses, deletes shrink them, inserts
    create status 'N').

    Scale shape: ONE shuffle of each side on the merge key — the same
    cost as any keyed join at 100 TB; no collect, no per-row dispatch.
    (A full-outer equi-join cannot broadcast in Spark — BroadcastHashJoin
    does not support full outer — so both sides always exchange
    regardless of feed size; a lakehouse MERGE INTO beats this shape not
    by broadcasting but by file-skipping to the touched partitions,
    which is what the delta/iceberg connectors would add.)"""
    o = t["orders"]
    snapshot = o.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    upd = o.where(F.col("o_orderkey") % 10 == 3).select(
        F.col("o_orderkey").alias("key"),
        F.lit("U").alias("op"),
        (F.col("o_totalprice") + 100.0).alias("price"),
        F.lit("U").alias("status"),
    )
    dele = o.where(F.col("o_orderkey") % 10 == 7).select(
        F.col("o_orderkey").alias("key"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("price"),
        F.lit(None).cast("string").alias("status"),
    )
    ins = o.where(F.col("o_orderkey") % 10 == 1).select(
        (F.col("o_orderkey") + 1_000_000_000).alias("key"),
        F.lit("I").alias("op"),
        F.col("o_totalprice").alias("price"),
        F.lit("N").alias("status"),
    )
    changes = upd.unionAll(dele).unionAll(ins)
    s, c = snapshot.alias("s"), changes.alias("c")
    merged = (
        s.join(c, F.col("s.key") == F.col("c.key"), "full_outer")
        .where(F.col("c.op").isNull() | (F.col("c.op") != "D"))
        .select(
            F.when(F.col("c.op").isin("U", "I"), F.col("c.price"))
            .otherwise(F.col("s.price"))
            .alias("price"),
            F.when(F.col("c.op").isin("U", "I"), F.col("c.status"))
            .otherwise(F.col("s.status"))
            .alias("status"),
        )
    )
    return merged.groupBy("status").agg(
        F.count("*").alias("n_orders"),
        stable_sum("price").alias("total_price"),
    )


@query(
    "cdc_scd2_intervals",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   CASE WHEN event_type IS DISTINCT FROM
                             LAG(event_type) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)
                        THEN 1 ELSE 0 END AS chg
            FROM events
        ),
        runs AS (
            SELECT user_id, event_type, ts,
                   SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS run_id
            FROM ordered
        ),
        intervals AS (
            SELECT user_id, event_type, CAST(run_id AS BIGINT) AS run_id,
                   MIN(ts) AS valid_from, COUNT(*) AS n_events
            FROM runs GROUP BY user_id, event_type, run_id
        )
        SELECT user_id, event_type, run_id, valid_from,
               LEAD(valid_from) OVER (PARTITION BY user_id
                                      ORDER BY valid_from, run_id)
                   AS valid_to,
               n_events
        FROM intervals
    """,
    covers="expansion: SCD-2 history build (run-length collapse of a "
    "change stream into validity intervals, current row open-ended)",
)
def cdc_scd2_intervals(spark, t):
    """Slowly-changing-dimension type-2 history from a change stream:
    consecutive equal states per user collapse into one row with
    ``[valid_from, valid_to)`` validity (the current state's ``valid_to``
    is NULL). The lag-flag / running-sum / lead chain is the standard
    distributed run-length encoding — one shuffle on user_id serves every
    window and the rollup, so at 100 TB this is a single partition-and-
    sort of the feed, no iteration. Plan body in :func:`scd2_intervals`
    so the NULL-state differential test (tests/test_text_numeric_fuzz.py)
    can drive it on synthetic input."""
    return scd2_intervals(t["events"])


def scd2_intervals(events):
    """See :func:`cdc_scd2_intervals`."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("event_type").over(w)
    # eqNullSafe mirrors the oracle's IS DISTINCT FROM exactly: with a
    # plain != the flag is NULL (skipped by SUM) whenever either side is
    # NULL, silently merging a NULL state into the preceding run — a
    # latent divergence the first corpus with NULL event_types would
    # surface as a driver hash mismatch.
    chg = (~F.col("event_type").eqNullSafe(prev)).cast("long")
    runs = (
        events.select("user_id", "event_type", "ts", "event_id")
        .withColumn("run_id", F.sum(chg).over(wrun))
    )
    intervals = runs.groupBy("user_id", "event_type", "run_id").agg(
        F.min("ts").alias("valid_from"), F.count("*").alias("n_events")
    )
    w_lead = Window.partitionBy("user_id").orderBy("valid_from", "run_id")
    return intervals.select(
        "user_id",
        "event_type",
        "run_id",
        "valid_from",
        F.lead("valid_from").over(w_lead).alias("valid_to"),
        "n_events",
    )

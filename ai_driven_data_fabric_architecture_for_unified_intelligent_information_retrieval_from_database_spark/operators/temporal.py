"""Temporal join operators Spark lacks natively: as-of join and banded
range join — implemented as compositions of built-in DataFrame ops (the
preferred strategy per the build rules; no Pandas fallback needed).

As-of join is THE canonical "operator the engine doesn't ship": DuckDB has
``ASOF JOIN`` syntax (which the oracle uses), Spark does not. The
composition here — tagged union + partitioned carry-forward window — is the
scalable distributed form: one shuffle on the join key, state bounded by a
single carried row per partition position, no per-group pandas and no
skew-prone inequality join. ``merge_asof`` via ``applyInPandas`` would pull
every group through Python; this stays in Tungsten end to end.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .registry import query


@query(
    "asof_join_event_signup",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts, e.event_type,
               s.event_id AS signup_event_id,
               s.ts AS signup_ts
        FROM events e
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
          ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
    covers="custom operator: as-of join (union + carry-forward window; DuckDB ASOF JOIN oracle)",
)
def asof_join_event_signup(spark, t):
    """Each event joined to the latest signup at-or-before it (per user).

    Technique: tag left rows (side=1) and right rows (side=0), union, then
    ``last(value, ignorenulls)`` over (user, ts, side) carries the most
    recent right-side values forward; keep left rows. Equal timestamps
    order the right row first, matching ASOF's ``>=`` semantics.
    """
    ev = t["events"]
    ts_t = dict(ev.dtypes)["ts"]
    left = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lit(None).cast("long").alias("r_event_id"),
        F.lit(None).cast(ts_t).alias("r_ts"),
        F.lit(1).alias("side"),
    )
    right = (
        ev.where(F.col("event_type") == "signup")
        .select(
            "user_id",
            "ts",
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("string").alias("event_type"),
            F.col("event_id").alias("r_event_id"),
            F.col("ts").alias("r_ts"),
            F.lit(0).alias("side"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "r_event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        left.unionByName(right)
        .withColumn("signup_event_id", F.last("r_event_id", ignorenulls=True).over(w))
        .withColumn("signup_ts", F.last("r_ts", ignorenulls=True).over(w))
        .where(F.col("side") == 1)
        .select("event_id", "user_id", "ts", "event_type", "signup_event_id", "signup_ts")
    )


@query(
    "range_join_price_bands",
    oracle="""
        WITH bands(band, lo, hi) AS (
            VALUES ('budget', 0.0, 100000.0),
                   ('standard', 100000.0, 300000.0),
                   ('premium', 300000.0, 600000.0)
        )
        SELECT b.band, COUNT(*) AS n_orders,
               MIN(o.o_totalprice) AS min_price,
               MAX(o.o_totalprice) AS max_price
        FROM orders o JOIN bands b
          ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        GROUP BY b.band
    """,
    covers="custom operator: banded range join (broadcast inequality join)",
)
def range_join_price_bands(spark, t):
    """Range join of a fact column against interval bands. The band table
    is tiny, so Spark plans a broadcast nested-loop — each fact row tests
    3 intervals in-place, no shuffle. (With a large interval table the
    move is bucketizing both sides to convert this into an equi-join.)"""
    bands = spark.createDataFrame(
        [("budget", 0.0, 100000.0), ("standard", 100000.0, 300000.0),
         ("premium", 300000.0, 600000.0)],
        "band string, lo double, hi double",
    )
    o = t["orders"]
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@query(
    "windowed_event_rate",
    oracle="""
        WITH by_min AS (
            SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day, user_id, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT day, user_id, n,
               CAST(SUM(n) OVER (PARTITION BY user_id ORDER BY day
                                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS n_7day
        FROM by_min
    """,
    covers="temporal: pre-aggregate + bounded trailing-frame window (rolling 7-day)",
)
def windowed_event_rate(spark, t):
    """Rolling 7-day event volume per user: aggregate to days first (the
    shuffle shrinks to |users|x|days| rows), then a bounded rows-frame
    window — never a self-join, never unbounded state."""
    by_day = (
        t["events"]
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"), "user_id")
        .agg(F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return by_day.select(
        "day", "user_id", "n", F.sum("n").over(w).cast("long").alias("n_7day")
    )


@query(
    "timeseries_gap_fill",
    oracle="""
        WITH daily AS (
            SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
                   COUNT(*) AS n
            FROM events
            WHERE event_type = 'error' AND CAST(props->>'$.k' AS INTEGER) < 3
            GROUP BY 1
        ),
        bounds AS (
            SELECT CAST(DATE_TRUNC('day', MIN(ts)) AS DATE) AS lo,
                   CAST(DATE_TRUNC('day', MAX(ts)) AS DATE) AS hi
            FROM events
        ),
        spine AS (
            SELECT UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 DAY))::DATE AS day
            FROM bounds
        )
        SELECT spine.day, COALESCE(daily.n, 0) AS n
        FROM spine LEFT JOIN daily ON spine.day = daily.day
    """,
    covers="temporal: date-spine gap fill (dense series from sparse observations)",
)
def timeseries_gap_fill(spark, t):
    """Dense daily rare-error series (error events with k<3 — sparse
    enough that real gaps exist at every test sf): days with no matches
    appear as 0 instead of being absent — the prerequisite for window/rate math
    downstream (a rolling mean over a gappy series is silently wrong).

    The spine is sequence(min_day, max_day) exploded from a 1-row frame —
    O(days) rows generated without a driver loop — then a left join that
    broadcasts the spine side. At 100 TB the daily aggregate is tiny
    regardless of input size, so this shape never becomes the bottleneck.
    """
    ev = t["events"]
    daily = (
        ev.where(
            (F.col("event_type") == "error")
            & (F.get_json_object("props", "$.k").cast("int") < 3)
        )
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("lo"),
        F.date_trunc("day", F.max("ts")).cast("date").alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    return (
        F.broadcast(spine)
        .join(daily, "day", "left")
        .select("day", F.coalesce("n", F.lit(0)).cast("long").alias("n"))
    )

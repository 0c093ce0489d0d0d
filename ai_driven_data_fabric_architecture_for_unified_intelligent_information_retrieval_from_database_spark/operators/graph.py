"""Graph operators over relations (north-star expansion): PageRank on the
part co-purchase graph, unrolled to a fixed iteration count so a plain SQL
oracle can replay it exactly.

Exactness across engines: every rank is an integer count of 1e-12 units
and every step is integer arithmetic (floor division, long sums) — no
float ever enters, so iteration order, partition count, and engine cannot
change a single value. The same trick the micro-unit money sums use,
applied to an iterative algorithm.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query

#: Fixed damping (85/100) and rank scale (1e12 micro-units) — integers only.
_SCALE = 1_000_000_000_000
_ITERS = 3
#: Minimum co-purchase support for an edge — the A-Priori pruning. Without
#: it the edge set is every pair that EVER co-occurred (~1.2 M at sf0.1,
#: ~31 M pair rows at sf10) and the three unrolled iterations grind both
#: engines (Spark 4.7 s at sf0.1, DuckDB 43 s at sf1); the support-2
#: graph is the strong-association subgraph (2-4 k edges at every test
#: SF — the corpus's planted co-purchases), which is also the graph a
#: recommender would actually walk.
_MIN_SUPPORT = 2


def _pagerank_oracle() -> str:
    # Every CTE is MATERIALIZED: DuckDB inlines plain CTEs per reference,
    # and the unrolled iteration references each rank relation twice (the
    # contribution join and the carry-through), so inlining expands the
    # tree EXPONENTIALLY in the iteration count - measured >570 s at sf1
    # vs 43 s materialized. (Spark needs no hint: the DataFrame DAG
    # shares subtrees by construction.)
    base = f"""
        co AS MATERIALIZED (
            SELECT a.l_partkey AS src, b.l_partkey AS dst, COUNT(*) AS n
            FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
            JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING COUNT(*) >= {_MIN_SUPPORT}
        ),
        pairs AS MATERIALIZED (
            SELECT src, dst FROM co
            UNION ALL
            SELECT dst AS src, src AS dst FROM co
        ),
        deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM pairs GROUP BY src),
        n AS MATERIALIZED (SELECT COUNT(*) AS c FROM deg),
        r0 AS MATERIALIZED (SELECT deg.src AS node, {_SCALE} // n.c AS r
               FROM deg CROSS JOIN n)
    """
    prev = "r0"
    for i in range(1, _ITERS + 1):
        base += f""",
        s{i} AS MATERIALIZED (
            SELECT p.dst AS node, SUM({prev}.r // deg.d) AS s
            FROM pairs p
            JOIN {prev} ON p.src = {prev}.node
            JOIN deg ON deg.src = p.src
            GROUP BY p.dst
        ),
        r{i} AS MATERIALIZED (
            SELECT {prev}.node,
                   {_SCALE * 15} // (100 * n.c)
                     + (85 * COALESCE(s{i}.s, 0)) // 100 AS r
            FROM {prev}
            LEFT JOIN s{i} ON {prev}.node = s{i}.node
            CROSS JOIN n
        )
        """
        prev = f"r{i}"
    return f"""
        WITH {base}
        SELECT node AS part_key, CAST(r AS BIGINT) AS rank_micro
        FROM {prev}
        ORDER BY rank_micro DESC, part_key
        LIMIT 20
    """


@query(
    "graph_pagerank_parts",
    oracle=_pagerank_oracle(),
    covers="expansion: iterative graph algorithm (damped PageRank over the "
    "part co-purchase graph, unrolled, exact integer arithmetic)",
)
def graph_pagerank_parts(spark, t):
    """Top-20 parts by damped PageRank (d = 0.85, 3 iterations) over the
    co-purchase graph — edges connect parts appearing in the same order,
    the \"customers also bought\" centrality.

    Unrolled, not looped: a fixed iteration count makes the computation a
    finite relational expression both engines can replay identically, and
    3 hops is the standard \"related items\" depth (a production run
    iterates to convergence exactly like dedup_components does — per-round
    localCheckpoint, scalar convergence probe; the unrolled form is what
    makes the exact oracle possible).

    Exactness: ranks are integer 1e-12 units; every step is floor
    division and long sums (order-independent), so the driver hash
    compare is exact — the float-PageRank alternative diverges across
    engines on summation order alone. Scale shape: the edge expansion is
    the bounded-per-order pair build (<= 7 items/order — never
    corpus-quadratic) rolled up with map-side combine and pruned at
    support >= {_MIN_SUPPORT} (see the constant's note) BEFORE any
    iteration; each iteration is then ONE join + ONE (node, sum) rollup
    over the strong-association subgraph, all keyed on part ids — far
    below fact scale.

    Round-6 shape (r05 verdict: the old form's sf10 cell ran 19.5 s vs
    DuckDB 6.2 s; this one measures 13.4 s sf10 / 1.42 s sf0.1,
    min-of-4 idle — the residual sf10 gap is the pair-count rollup
    itself, 6.3 s to shuffle-and-count 31 M near-unique long keys,
    decomposed in the r06 notes; the same rollup is where DuckDB spends
    its time too):

    - **Packed pair keys**: each candidate pair is one long
      (src * 2^31 + dst, partkeys are 32-bit ints) so the pair-count
      rollup shuffles and hashes 8-byte longs, not (long, long) structs
      — the same scalar-key trick the decontaminate rewrite used.
      A/B at sf10 (tools/pagerank_ab.py): packed baskets 9.1 s vs
      struct baskets 10.7 s vs distinct+self-join 10.5 s for the edge
      build, so the basket form stays (the r05 advice's self-join form
      measured SLOWER — the 60 M-row distinct shuffle plus join re-key
      costs more than the per-order set build it replaces).
    - **Degree folded into the edge list** once (pairs_d carries
      (src, dst, d_src)), and the rank-update LEFT JOIN is gone: in the
      symmetric pruned graph every node has degree >= 1, so every node
      receives a contribution each round and ``contrib`` alone IS the
      next rank relation (the oracle's LEFT JOIN + COALESCE never sees a
      NULL for the same reason; an empty pruned graph yields an empty
      result in both engines). Each iteration is ONE exchange: degree
      and node count ride along in the checkpointed edge relation, and
      the hash(src) partitioning from its build survives the checkpoint,
      so the contribution join and the next round's node == src join are
      both zero-exchange.
    - **AQE off for the post-prune phase only**: the iteration subtree
      runs over the already-materialized, counted, few-MB edge list —
      AQE has nothing to re-plan there and its per-exchange
      materialization barriers measured 2x the whole phase (3.9 s vs
      1.7 s at sf10). The fact-scale edge build keeps AQE on. The
      session conf is toggled in a try/finally window and the subtree is
      executed (localCheckpoint) inside it, so nothing outside this
      builder sees the change.
    """
    # Per-order baskets via collect_set, pairs packed to single longs —
    # ONE exchange (order grain) plus the long-keyed pair-count rollup.
    # The HOF lambdas run interpreted but over <= 7-item baskets
    # (bounded, never corpus-quadratic).
    baskets = t["lineitem"].groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("parts")
    )
    packed_pairs = F.expr(
        "flatten(transform(parts, x -> "
        f"transform(filter(parts, y -> y > x), y -> x * {1 << 31} + y)))"
    )
    co = (
        baskets.select(F.explode(packed_pairs).alias("pk"))
        .groupBy("pk")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= _MIN_SUPPORT)
        .select(
            F.expr(f"pk div {1 << 31}").alias("src"),
            (F.col("pk") % F.lit(1 << 31)).alias("dst"),
        )
    )
    # Eager localCheckpoint (the dedup_components idiom): the unrolled DAG
    # references the edge relation once per iteration, and without a
    # lineage cut the fact-scale pair rollup above re-executes per
    # reference (measured 26.7 s vs 12.0 s at sf10 when the cut was
    # misplaced one node too late). The checkpointed relation is the
    # PRUNED edge list — thousands of rows at small SF, ~360 k at sf10 —
    # so this materializes almost nothing. bench.py times this entry
    # from construction, where the checkpoint (and the whole iteration
    # phase below) executes.
    spark_conf = spark.conf
    co = co.localCheckpoint()
    aqe_before = spark_conf.get("spark.sql.adaptive.enabled")
    try:
        spark_conf.set("spark.sql.adaptive.enabled", "false")
        pairs = co.unionAll(
            co.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        deg = pairs.groupBy("src").agg(F.count("*").alias("d"))
        nn = deg.agg(F.count("*").alias("c"))
        # (src, dst, d_src, |V|): degree and node count folded into the
        # edge relation so no per-iteration join against deg and no
        # driver-side count are needed. |V| is constant per row, so the
        # any_value() reads below are deterministic-by-value.
        pairs_d = (
            pairs.join(deg, "src").crossJoin(F.broadcast(nn)).localCheckpoint()
        )
        # pairs_d is hash(src)-partitioned (the deg join's exchange,
        # preserved through the checkpoint), so the initial rank rollup,
        # each contribution join, and the next round's join on
        # node == src all reuse that partitioning — one exchange per
        # iteration (the (dst, sum) rollup), everything else sorts
        # in place.
        rank = pairs_d.groupBy(F.col("src").alias("node")).agg(
            F.expr(f"{_SCALE} div any_value(c)").alias("r")
        )
        for _ in range(_ITERS):
            contrib = (
                pairs_d.join(rank, pairs_d.src == rank.node)
                .select("dst", F.expr("r div d").alias("con"), "c")
                .groupBy("dst")
                .agg(F.sum("con").alias("s"), F.expr("any_value(c)").alias("c"))
            )
            rank = contrib.select(
                F.col("dst").alias("node"),
                (
                    F.expr(f"{_SCALE * 15} div (100 * c)")
                    + F.expr("(85 * s) div 100")
                ).alias("r"),
            )
        out = (
            rank.select(
                F.col("node").alias("part_key"),
                F.col("r").cast("long").alias("rank_micro"),
            )
            .orderBy(F.desc("rank_micro"), "part_key")
            .limit(20)
        )
        # Execute the iteration subtree inside the AQE-off window; the
        # returned frame is the materialized 20-row result.
        return out.localCheckpoint()
    finally:
        spark_conf.set("spark.sql.adaptive.enabled", aqe_before)

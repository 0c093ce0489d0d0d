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
    the bounded-per-order pair join (<= 7 items/order — never
    corpus-quadratic) rolled up with map-side combine and pruned at
    support >= {_MIN_SUPPORT} (see the constant's note) BEFORE any
    iteration; each iteration is then one join + one (node, sum) rollup
    over the strong-association subgraph, all keyed on part ids — far
    below fact scale."""
    # Per-order baskets via collect_set, pairs generated as a per-row
    # array combination — ONE exchange (order grain) plus the pair-count
    # rollup, where the self-join form pays four (distinct, two re-keys,
    # rollup). The HOF lambdas run interpreted but over <= 7-item baskets
    # (bounded, never corpus-quadratic); measured equal-output and faster
    # at sf0.1 (1.08 vs 1.29 s) and sf10 (11.3 s) for the pair build.
    baskets = t["lineitem"].groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("parts")
    )
    pair_structs = F.expr(
        "flatten(transform(parts, x -> "
        "transform(filter(parts, y -> y > x), y -> struct(x AS src, y AS dst))))"
    )
    co = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .select("p.src", "p.dst")
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= _MIN_SUPPORT)
        .select("src", "dst")
    )
    # Eager localCheckpoint (the dedup_components idiom): the unrolled DAG
    # references the edge relation 4+ times, and without a lineage cut the
    # fact-scale pair rollup above re-executes per reference (measured
    # 3.0 s at sf0.1 / 33 s at sf10 uncut vs the rollup's own one-pass
    # cost after the cut). The checkpointed relation is the PRUNED edge
    # list — a few thousand rows at any SF — so this materializes almost
    # nothing. bench.py times this entry from construction, where the
    # checkpoint executes.
    pairs = co.unionAll(
        co.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    deg = pairs.groupBy("src").agg(F.count("*").alias("d"))
    n = deg.agg(F.count("*").alias("c"))
    rank = (
        deg.crossJoin(F.broadcast(n))
        .select(F.col("src").alias("node"), F.expr(f"{_SCALE} div c").alias("r"))
    )
    for _ in range(_ITERS):
        contrib = (
            pairs.join(rank, pairs.src == rank.node)
            .join(deg, "src")
            .select("dst", F.expr("r div d").alias("con"))
            .groupBy("dst")
            .agg(F.sum("con").alias("s"))
        )
        rank = (
            rank.join(contrib, rank.node == contrib.dst, "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                (
                    F.expr(f"{_SCALE * 15} div (100 * c)")
                    + F.expr("(85 * coalesce(s, 0)) div 100")
                ).alias("r"),
            )
        )
    return (
        rank.select(
            F.col("node").alias("part_key"), F.col("r").cast("long").alias("rank_micro")
        )
        .orderBy(F.desc("rank_micro"), "part_key")
        .limit(20)
    )

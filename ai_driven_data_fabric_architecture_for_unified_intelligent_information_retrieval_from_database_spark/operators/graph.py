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


def _pagerank_oracle() -> str:
    base = f"""
        pairs AS (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
            JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        ),
        deg AS (SELECT src, COUNT(*) AS d FROM pairs GROUP BY src),
        n AS (SELECT COUNT(*) AS c FROM deg),
        r0 AS (SELECT deg.src AS node, {_SCALE} // n.c AS r
               FROM deg CROSS JOIN n)
    """
    prev = "r0"
    for i in range(1, _ITERS + 1):
        base += f""",
        s{i} AS (
            SELECT p.dst AS node, SUM({prev}.r // deg.d) AS s
            FROM pairs p
            JOIN {prev} ON p.src = {prev}.node
            JOIN deg ON deg.src = p.src
            GROUP BY p.dst
        ),
        r{i} AS (
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
    corpus-quadratic); each iteration is one join + one (node, sum)
    rollup, all keyed on part ids; degree and rank relations are
    part-dictionary-sized, far below fact scale."""
    items = t["lineitem"].select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
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

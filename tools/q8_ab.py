#!/usr/bin/env python
"""Round-8 A/B for tpch_q8's shuffle residue (r07 verdict task 7: try the
r05 Q13 recipe — pre-aggregate to join-key grain before the exchange — on
q8's two-dimension-role join).

Forms, all verified to collect identical rows at sf10:
  v0 current        cost-chosen entry (broadcast form at sf10: every dim +
                    the qualifying-orders slice broadcast into the PROMO
                    lineitem scan; single 2-row aggregate exchange)
  v1 preagg_okey    Q13 recipe: PROMO x supplier lineitem rolled up to
                    (l_orderkey, supp_nation) grain BEFORE the qual join,
                    then broadcast-join qual + final agg — tests whether
                    collapsing ~1 row/key pays for its hash build
  v2 preagg_late    roll up to (o_year, supp_nation) right after the qual
                    join (the narrowest possible pre-exchange grain), so
                    the final exchange carries <=14 rows; differs from v0
                    only if Spark's partial agg wasn't already doing this
  v3 shuffle        the entry's past-threshold branch forced (the 100 TB
                    shape), for the record

Measured sf10 min-of-3, same session, forms interleaved per pass
(host-thermal discipline: standalone repeats self-throttle; only
same-session neighbors are comparable):

  v0 1.321s   v1 2.235s   v2 1.411s   v3 2.200s   DuckDB 0.566s

VERDICT (r08): the current form STANDS. The Q13 recipe (v1) is 1.7x
slower here for the same reason it lost on q4: the PROMO slice is
already ~1 row per orderkey (the rollup collapses nothing) while the
(orderkey, supp_nation) hash build touches every slice row; v2's
explicit pre-exchange rollup is within noise of v0 because whole-stage
codegen already folds the partial agg into the join stage (v0's plan IS
v2's plan). The residual 2.3x gap to DuckDB is the serial broadcast
build of the ~1M-row qual slice plus the scan floor — same family as
q4's audited floor, recorded here; the shuffle branch (v3, the 100 TB
shape) costs +0.9 s at sf10, exactly the orderkey/custkey exchanges
the broadcast form avoids.

Usage: python tools/q8_ab.py <sf_dir> [passes]
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
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (
    oracle_sql,
    queries,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
    register_views,
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaled/sf10"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = bench._rechunk(sf_dir)
    bench._warm_page_cache(sf_dir)
    spark = get_spark(
        app_name="q8-ab",
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
    t = register_views(spark, sf_dir)
    t["lineitem"].count()
    ts = lambda s: F.lit(s).cast("timestamp_ntz")  # noqa: E731
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.tpch_extra import (
        _year,
    )

    volume = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    zero = F.lit(0).cast("decimal(18,6)")

    def parts():
        n1 = t["nation"].select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_name").alias("supp_nation"),
        )
        n2 = t["nation"].select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_regionkey").alias("n2_region"),
        )
        r = t["region"].where(F.col("r_name") == "AMERICA")
        o = t["orders"].where(
            (F.col("o_orderdate") >= ts("1996-01-01 00:00:00"))
            & (F.col("o_orderdate") < ts("1998-01-01 00:00:00"))
        )
        p = t["part"].where(F.col("p_type") == "PROMO")
        am_nk = n2.join(
            F.broadcast(r), F.col("n2_region") == F.col("r_regionkey")
        ).select("n2_key")
        c_am = t["customer"].join(
            F.broadcast(am_nk), F.col("c_nationkey") == F.col("n2_key"), "left_semi"
        ).select("c_custkey")
        qual = o.join(
            F.broadcast(c_am), o.o_custkey == F.col("c_custkey"), "left_semi"
        ).select("o_orderkey", "o_orderdate")
        return n1, p, qual

    def share(base):
        return base.groupBy("o_year").agg(
            (
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_3", F.col("volume")
                    ).otherwise(zero)
                ).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )

    def v0():
        return queries()["tpch_q8_market_share"](spark, sf_dir)

    def v1():
        n1, p, qual = parts()
        l = t["lineitem"]
        s = t["supplier"].select("s_suppkey", "s_nationkey")
        rolled = (
            l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
            .join(F.broadcast(s), l.l_suppkey == F.col("s_suppkey"))
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
            .groupBy("l_orderkey", "supp_nation")
            .agg(F.sum(volume).alias("volume"))
        )
        base = rolled.join(
            F.broadcast(qual), F.col("l_orderkey") == qual.o_orderkey
        ).select(
            _year(F.col("o_orderdate")).alias("o_year"), "volume", "supp_nation"
        )
        return share(base)

    def v2():
        n1, p, qual = parts()
        l = t["lineitem"]
        s = t["supplier"].select("s_suppkey", "s_nationkey")
        base = (
            l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
            .join(F.broadcast(s), l.l_suppkey == F.col("s_suppkey"))
            .join(F.broadcast(qual), l.l_orderkey == qual.o_orderkey)
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
            .groupBy(
                _year(F.col("o_orderdate")).alias("o_year"), F.col("supp_nation")
            )
            .agg(F.sum(volume).alias("volume"))
            .select("o_year", "volume", "supp_nation")
        )
        return share(base)

    def v3():
        # The entry's past-threshold shuffle branch, forced by a tiny
        # broadcast threshold in a cloned session (same trick the entry's
        # own plan tests use).
        clone = spark.newSession()
        clone.conf.set("spark.sql.session.timeZone", "UTC")
        clone.conf.set("spark.sql.autoBroadcastJoinThreshold", "1048576")
        return queries()["tpch_q8_market_share"](clone, sf_dir)

    forms = {
        "v0_current": v0,
        "v1_preagg_okey": v1,
        "v2_preagg_late": v2,
        "v3_shuffle": v3,
    }
    ref = None
    for name, mk in forms.items():
        rows = sorted(tuple(r) for r in mk().collect())
        ref = ref or rows
        assert rows == ref, name
    print("all forms agree")
    best: dict[str, float] = {}
    # Interleave forms inside each pass so thermal drift hits all forms
    # equally (memory: standalone repeats self-throttle).
    for _ in range(passes):
        for name, mk in forms.items():
            df = mk()
            s = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - s
            best[name] = min(best.get(name, el), el)
    for name, v in best.items():
        print(f"{name}: {v:.3f}", flush=True)
    con = duckdb.connect()
    for tab in [
        "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    ]:
        p = os.path.join(sf_dir, f"{tab}.parquet")
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {tab} AS SELECT * FROM read_parquet({src})")
    sql = oracle_sql()["tpch_q8_market_share"]
    db = None
    for _ in range(passes):
        s = time.perf_counter()
        con.execute(sql).fetchall()
        el = time.perf_counter() - s
        db = el if db is None else min(db, el)
    print(f"duckdb: {db:.3f}")


if __name__ == "__main__":
    main()

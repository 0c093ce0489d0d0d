#!/usr/bin/env python
"""Round-15 A/B for tpch_q5's mid-band (supplier-first) broadcast form at
sf30 (r14 verdict task 2: attack or re-license the serial
broadcast-build floor — 8.01 s / 8.2x in the r14 sf30 leg).

The mid band probes lineitem with the tiny ASIA-supplier broadcast
first, then probes the multi-M-row qualifying-orders slice ``oc`` with a
COMPOUND key (l_orderkey, s_nationkey) == (o_orderkey, c_nationkey).
A two-column key builds a generic UnsafeHashedRelation; packing both
into ONE long (orderkey * 32 + nationkey — injective, nationkey < 25)
lets Spark build a LongHashedRelation (dense/long-keyed, the fastest
build+probe it has). And because no oc column survives the join (the
rollup groups on s_nationkey from the supplier side), the probe can be a
LEFT SEMI join — the build stores no output payload.

Forms (identical outputs asserted per run):

  v0_shipped        registry form (mid band taken at sf30: suppfirst
                    broadcast, compound-key inner probe)
  v1_packed_semi    suppfirst + packed-long LEFT SEMI oc probe
  v2_packed_inner   suppfirst + packed-long INNER oc probe (isolates
                    semi-vs-packing)
  v3_shuffle        forced shuffle form (the 100 TB branch, counterfactual)
  suppfloor         lx JOIN broadcast(s_asia) alone (the 20% cut every
                    mid-band form pays before the oc probe)
  scanfloor         count over the 3-column lineitem scan
  (duckdb)          whole oracle query, same process, same files

Usage: python tools/q5_ab_r15.py [sf_dir] [passes]
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
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.functions.numerics import (
    micro_units,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (
    oracle_sql,
    queries,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
    register_views,
)


def _q5_parts(t):
    n, r, s, c, o = t["nation"], t["region"], t["supplier"], t["customer"], t["orders"]
    asia_n = n.join(
        F.broadcast(r.where(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey
    ).select("n_nationkey", "n_name")
    s_asia = s.join(
        F.broadcast(asia_n), s.s_nationkey == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey")
    o_win = o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    c_slice = c.join(
        F.broadcast(asia_n.select("n_nationkey")),
        c.c_nationkey == F.col("n_nationkey"),
        "left_semi",
    ).select("c_custkey", "c_nationkey")
    oc = o_win.join(
        F.broadcast(c_slice), o_win.o_custkey == c_slice.c_custkey
    ).select("o_orderkey", "c_nationkey")
    lx = t["lineitem"].select(
        "l_orderkey",
        "l_suppkey",
        micro_units(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_micro"
        ),
    )
    return asia_n, s_asia, oc, lx


def _finish(j, asia_n):
    per_nation = j.groupBy("s_nationkey").agg(F.sum("rev_micro").alias("rt"))
    return per_nation.join(
        F.broadcast(asia_n), F.col("s_nationkey") == asia_n.n_nationkey
    ).select("n_name", (F.col("rt") / F.lit(1e6)).alias("revenue"))


def v1_packed_semi(t):
    asia_n, s_asia, oc, lx = _q5_parts(t)
    j = lx.join(F.broadcast(s_asia), lx.l_suppkey == s_asia.s_suppkey)
    oc_packed = oc.select(
        (F.col("o_orderkey") * 32 + F.col("c_nationkey")).alias("ock")
    )
    j = j.join(
        F.broadcast(oc_packed),
        (j.l_orderkey * 32 + F.col("s_nationkey")) == oc_packed.ock,
        "left_semi",
    )
    return _finish(j, asia_n)


def v2_packed_inner(t):
    asia_n, s_asia, oc, lx = _q5_parts(t)
    j = lx.join(F.broadcast(s_asia), lx.l_suppkey == s_asia.s_suppkey)
    oc_packed = oc.select(
        (F.col("o_orderkey") * 32 + F.col("c_nationkey")).alias("ock")
    )
    j = j.join(
        F.broadcast(oc_packed),
        (j.l_orderkey * 32 + F.col("s_nationkey")) == oc_packed.ock,
    ).drop("ock")
    return _finish(j, asia_n)


def v3_shuffle(t):
    asia_n, s_asia, oc, lx = _q5_parts(t)
    pre = (
        lx.join(F.broadcast(s_asia), lx.l_suppkey == s_asia.s_suppkey)
        .groupBy("l_orderkey", "s_nationkey")
        .agg(F.sum("rev_micro").alias("rev_micro"))
    )
    j = pre.join(
        oc,
        (pre.l_orderkey == oc.o_orderkey) & (pre.s_nationkey == oc.c_nationkey),
    )
    return _finish(j, asia_n)


def suppfloor(t):
    _asia_n, s_asia, _oc, lx = _q5_parts(t)
    j = lx.join(F.broadcast(s_asia), lx.l_suppkey == s_asia.s_suppkey)
    return j.groupBy("s_nationkey").agg(F.sum("rev_micro").alias("rt"))


def scanfloor(t):
    return t["lineitem"].select(
        F.count("l_orderkey"),
        F.count("l_suppkey"),
        F.sum(micro_units(F.col("l_extendedprice") * (1 - F.col("l_discount")))),
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaled/sf30"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = bench._rechunk(sf_dir)
    bench._warm_page_cache(sf_dir)
    spark = get_spark(
        app_name="q5-ab-r15",
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
        "v0_shipped": lambda: qs["tpch_q5_local_supplier_volume"](spark, sf_dir),
        "v1_packed_semi": lambda: v1_packed_semi(t),
        "v2_packed_inner": lambda: v2_packed_inner(t),
        "v3_shuffle": lambda: v3_shuffle(t),
        "suppfloor": lambda: suppfloor(t),
        "scanfloor": lambda: scanfloor(t),
    }
    base = rows(forms["v0_shipped"]())
    for name in ("v1_packed_semi", "v2_packed_inner", "v3_shuffle"):
        assert rows(forms[name]()) == base, f"{name} output differs"
    print("outputs identical across q5 forms", flush=True)

    res = {}
    for p in range(passes):
        for name, fn in forms.items():
            spark.sparkContext.setJobDescription(f"{name} pass {p}")
            df = fn()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            res.setdefault(name, []).append(round(time.perf_counter() - t0, 3))
    for name, vals in res.items():
        print(f"{name}: min {min(vals)} passes {vals}", flush=True)

    con = duckdb.connect()
    for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
                "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{tbl}.parquet")
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet({src})")
    osql = oracle_sql()
    vals = []
    for _ in range(passes):
        t0 = time.perf_counter()
        con.execute(osql["tpch_q5_local_supplier_volume"]).fetchall()
        vals.append(round(time.perf_counter() - t0, 3))
    print(f"duckdb q5: min {min(vals)} passes {vals}")
    print(f"load_avg now: {os.getloadavg()}")


if __name__ == "__main__" and not (
    len(sys.argv) > 1 and sys.argv[1] == "ordersfirst"
):
    main()


def of_v0_ordersfirst(t):
    """The orders-first branch exactly as shipped (for small-SF A/B where
    the registry takes this branch anyway -- handwritten so both forms
    construct identically)."""
    asia_n, s_asia, oc, lx = _q5_parts(t)
    j = lx.join(F.broadcast(oc), lx.l_orderkey == oc.o_orderkey)
    j = j.join(
        F.broadcast(s_asia),
        (j.l_suppkey == s_asia.s_suppkey)
        & (F.col("c_nationkey") == s_asia.s_nationkey),
    )
    return _finish(j, asia_n)


def of_v1_packed_semi(t):
    """Orders-first with the SECOND probe packed+semi: s_nationkey ==
    c_nationkey under the join condition, so grouping on c_nationkey is
    equivalent and s_asia (unique per suppkey) needs no payload."""
    asia_n, s_asia, oc, lx = _q5_parts(t)
    j = lx.join(F.broadcast(oc), lx.l_orderkey == oc.o_orderkey)
    sa_packed = s_asia.select(
        (F.col("s_suppkey") * 32 + F.col("s_nationkey")).alias("sak")
    )
    j = j.join(
        F.broadcast(sa_packed),
        (j.l_suppkey * 32 + F.col("c_nationkey")) == sa_packed.sak,
        "left_semi",
    )
    per_nation = j.groupBy("c_nationkey").agg(F.sum("rev_micro").alias("rt"))
    return per_nation.join(
        F.broadcast(asia_n), F.col("c_nationkey") == asia_n.n_nationkey
    ).select("n_name", (F.col("rt") / F.lit(1e6)).alias("revenue"))


def main_ordersfirst():
    """A/B the orders-first branch at small/mid SF under the BENCH conf
    for that scale (so the measured branch is the branch the bench runs).
    Usage: python tools/q5_ab_r15.py ordersfirst [sf_dir] [passes]"""
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scaled/sf10"
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = bench._rechunk(sf_dir)
    bench._warm_page_cache(sf_dir)

    def _tbl_size(f):
        p = os.path.join(sf_dir, f)
        if os.path.isdir(p):
            return sum(os.path.getsize(os.path.join(p, g)) for g in os.listdir(p))
        return os.path.getsize(p)

    largest = max(
        (_tbl_size(f) for f in os.listdir(sf_dir) if f.endswith(".parquet")),
        default=10 * 1024 * 1024,
    )
    small = largest < 64 * 1024 * 1024
    bcast = min(max(largest // 16, 10 * 1024 * 1024), 64 * 1024 * 1024)
    spark = get_spark(
        app_name="q5-ab-of-r15",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024 * 1024),
            "spark.sql.shuffle.partitions": "8" if small else "32",
            "spark.sql.adaptive.enabled": "false" if small else "true",
            "spark.sql.autoBroadcastJoinThreshold": str(bcast),
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
        "of_v0_shipped_registry": lambda: qs["tpch_q5_local_supplier_volume"](
            spark, sf_dir
        ),
        "of_v0_ordersfirst": lambda: of_v0_ordersfirst(t),
        "of_v1_packed_semi": lambda: of_v1_packed_semi(t),
    }
    base = rows(forms["of_v0_ordersfirst"]())
    assert rows(forms["of_v0_shipped_registry"]()) == base
    assert rows(forms["of_v1_packed_semi"]()) == base
    print("outputs identical across orders-first forms", flush=True)
    res = {}
    for p in range(passes):
        for name, fn in forms.items():
            spark.sparkContext.setJobDescription(f"{name} pass {p}")
            df = fn()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            res.setdefault(name, []).append(round(time.perf_counter() - t0, 3))
    for name, vals in res.items():
        print(f"{name}: min {min(vals)} passes {vals}", flush=True)
    print(f"load_avg now: {os.getloadavg()}")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "ordersfirst":
    main_ordersfirst()
    sys.exit(0)

#!/usr/bin/env python
"""r13 verdict task 2: audit the two sf30-leg evidence-gap stragglers.

(a) sampling_temperature_mix (scale.py; 3.19x/1.04 s at the r13
    controlled sf30 leg, never A/B'd). Candidate forms, value-asserted
    identical:
      - shipped: full-corpus per-source md5-rank window + broadcast
        quota join.
      - prefilter: the scale path — picks are the quota smallest
        (md5, doc_id) per source, and quota ~ 2*sqrt(n) is a vanishing
        fraction, so a uniform-hash prefilter (keep rows whose 32-bit
        md5 prefix is under 16x the per-source keep fraction) shrinks
        the window's sort input ~n/16x before the SAME rank logic runs;
        an in-run assertion verifies every source's survivor count
        covers its quota (P(miss) < 1e-100 at these sizes — Chernoff on
        a 16x-margin binomial; the assert converts the probabilistic
        argument into a hard check).
      - floor: the mandatory per-source exchange + md5 sort alone
        (window rank with no join/filter), the cost every correct form
        pays.
(b) bucketed_join_revenue (scale.py; 5.09x in-leg at sf30 vs its audited
    2.6x profile) — a same-minute re-read of the SHIPPED form vs the
    DuckDB oracle settles load-skew vs real regression. The bucketed
    layout write is untimed construction (the cell's published
    contract); the timed number is the recurring zero-exchange join.

Protocol = tools/straggler_ab_r13.py: rechunked + page-cache-warmed
corpus, min over N interleaved passes, DuckDB oracle timed in the same
session minute.

Usage: python tools/straggler_ab_r14.py <sf_dir> [passes]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import duckdb
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark import (
    get_spark,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (
    oracle_sql,
    queries,
)
from pyspark.sql import Window, functions as F

CELLS = ["sampling_temperature_mix", "bucketed_join_revenue"]


def main():
    print("load_avg_start:", os.getloadavg())
    sf_dir = bench._rechunk(sys.argv[1])
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    bench._warm_page_cache(sf_dir)
    spark = get_spark(
        app_name="straggler-ab-r14",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024 * 1024),
            "spark.sql.shuffle.partitions": str(os.cpu_count() or 32),
            "spark.sql.adaptive.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    d.count()

    qs, osql = queries(), oracle_sql()
    con = duckdb.connect()
    con.execute("SET timezone='UTC'")
    try:
        con.execute("SET max_temp_directory_size='24GiB'")
    except Exception:
        pass
    for tbl in ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{tbl}.parquet")
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet({src})")

    # ---- temperature-mix candidate forms ------------------------------
    def mix_shipped():
        return qs["sampling_temperature_mix"](spark, sf_dir)

    def mix_prefilter():
        q = d.groupBy("source").agg(
            F.floor(F.sqrt(F.count("*").cast("double")) * 2)
            .cast("long")
            .alias("quota"),
            F.count("*").alias("n_src"),
        )
        # keep fraction with 16x margin, clamped to 1
        qf = q.select(
            "source", "quota",
            F.least(
                F.lit(1.0),
                16.0 * F.col("quota") / F.col("n_src"),
            ).alias("cut"),
        )
        md5v = F.md5(F.col("doc_id").cast("string"))
        # uniform in [0,1): first 8 hex chars as a 32-bit integer
        u = F.conv(F.substring(md5v, 1, 8), 16, 10).cast("double") / float(
            1 << 32
        )
        surv = (
            d.select("doc_id", "source", md5v.alias("m5"), u.alias("u"))
            .join(F.broadcast(qf), "source")
            .where(F.col("u") < F.col("cut"))
        )
        w = Window.partitionBy("source").orderBy("m5", "doc_id")
        ranked = surv.select(
            "doc_id", "source", "quota",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        return ranked.where(F.col("rk") <= F.col("quota")).select(
            "doc_id", "source", "rk", "quota"
        )

    def mix_floor():
        w = Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
        return d.select(
            "doc_id", "source",
            F.row_number().over(w).cast("long").alias("rk"),
        )

    # Safety assertion for the prefilter form: every source's survivor
    # count must cover its quota, or the prefilter could drop true picks.
    q = d.groupBy("source").agg(
        F.floor(F.sqrt(F.count("*").cast("double")) * 2).cast("long").alias("quota"),
        F.count("*").alias("n_src"),
    )
    md5v = F.md5(F.col("doc_id").cast("string"))
    u = F.conv(F.substring(md5v, 1, 8), 16, 10).cast("double") / float(1 << 32)
    short = (
        d.select("source", u.alias("u"))
        .join(F.broadcast(q.select(
            "source", "quota",
            F.least(F.lit(1.0), 16.0 * F.col("quota") / F.col("n_src")).alias("cut"),
        )), "source")
        .where(F.col("u") < F.col("cut"))
        .groupBy("source").agg(F.count("*").alias("n_surv"))
        .join(q, "source")
        .where(F.col("n_surv") < F.col("quota"))
        .count()
    )
    assert short == 0, f"{short} sources undershot the prefilter margin"

    # value identity: shipped vs prefilter
    a = sorted(tuple(r) for r in mix_shipped().collect())
    b = sorted(tuple(r) for r in mix_prefilter().collect())
    assert a and a == b, (
        f"temperature-mix forms differ: {len(a)} vs {len(b)} rows"
    )
    print("# temperature-mix forms value-identical,", len(a), "rows")

    # bucketed_join_revenue: construction (layout write) untimed, per the
    # cell's published contract — build once before the timed passes.
    bjr = qs["bucketed_join_revenue"](spark, sf_dir)
    bjr.write.format("noop").mode("overwrite").save()

    families = {
        "tempmix": {
            "shipped": mix_shipped,
            "prefilter": mix_prefilter,
            "floor:rank-window": mix_floor,
        },
        "bjr": {
            "shipped": lambda: qs["bucketed_join_revenue"](spark, sf_dir),
        },
    }
    best: dict[str, float] = {}
    for _ in range(passes):
        for fam, forms in families.items():
            for name, fn in forms.items():
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                best[f"{fam}:{name}"] = min(
                    best.get(f"{fam}:{name}", 1e9), time.perf_counter() - t0
                )
        for cell in CELLS:
            t0 = time.perf_counter()
            con.execute(osql[cell]).fetchall()
            best[f"duckdb:{cell}"] = min(
                best.get(f"duckdb:{cell}", 1e9), time.perf_counter() - t0
            )
    for name, v in sorted(best.items()):
        print(f"{name:38s} {v:.3f}")
    print("load_avg_end:", os.getloadavg())


if __name__ == "__main__":
    main()

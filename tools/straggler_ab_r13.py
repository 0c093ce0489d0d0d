#!/usr/bin/env python
"""Rejection audits for the last never-audited >2x stragglers (r12
verdict task 8): sampling_pack_context_windows (2.8x at sf60, 1.08 s),
text_unigram_surprisal (2.2x at the sf10 idle leg, 3.09 s),
pipeline_curation_funnel (2.2x, 3.34 s).

Protocol = tools/shards_markov_ab.py: rechunked + page-cache-warmed
corpus, candidate forms value-asserted identical within each family,
min over N interleaved passes, DuckDB oracle timed in the same session
for the same-host-minute ratio. Results are pasted into BASELINE.md's
round-13 record with the measured numbers.

Candidate forms per cell:

- pack_context_windows: shipped SIZE(SPLIT(...)) token count vs the
  length-difference count the r12 shards audit shipped for
  sampling_pack_shards (no per-row array allocation), plus the bare
  scan+count floor. The cell's only exchange is the shard_id window
  (8 strata) which also serves the rollup — if the scan floor
  dominates, the adjudication is the pack_shards one.
- unigram_surprisal: shipped (one corpus explode -> tf rollup -> freq
  reuse via AQE stage reuse -> broadcast-or-shuffle vocab join) vs the
  floor = the corpus explode + (doc_id, w) tf rollup ALONE (the one
  mandatory corpus-grain exchange every correct form pays).
- curation_funnel: shipped (explode re-injection, conditional agg,
  subtraction-derived stage 5) vs the floor = one corpus scan building
  the full flags projection + the fp exchange (window min per
  fingerprint) ALONE — the funnel's irreducible work.

Usage: python tools/straggler_ab_r13.py <sf_dir> [passes]
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

CELLS = [
    "sampling_pack_context_windows",
    "text_unigram_surprisal",
    "pipeline_curation_funnel",
]


def main():
    print("load_avg_start:", os.getloadavg())
    sf_dir = bench._rechunk(sys.argv[1])
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    bench._warm_page_cache(sf_dir)
    spark = get_spark(
        app_name="straggler-ab-r13",
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

    len_tok = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    ).cast("long")
    split_tok = F.size(F.split(F.col("text"), " ")).cast("long")

    def pack_windows(tok):
        sized = d.select(
            "doc_id", tok.alias("n_tokens"),
            (F.col("doc_id") % 8).alias("shard_id"),
        )
        w = (
            Window.partitionBy("shard_id").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        placed = sized.select(
            "shard_id", "n_tokens",
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_tok"),
        )
        return placed.groupBy(
            F.col("shard_id").cast("long").alias("shard_id"),
            F.expr("start_tok DIV 2048").alias("window_id"),
        ).agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("window_tokens"),
        )

    def surprisal_floor():
        inst = (
            d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
            .where(F.col("w") != "")
        )
        return inst.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))

    def funnel_floor():
        from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.functions.text import (
            normalized_text,
            quality_score_col,
            words_col,
        )
        from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.pipeline import (
            QUALITY_FLOOR,
        )
        from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.text_analysis import (
            DECONTAM_EVAL_STRIDE,
        )

        ids = F.when(
            F.col("doc_id") % 7 == 0,
            F.array(F.col("doc_id"), -F.col("doc_id") - 1),
        ).otherwise(F.array(F.col("doc_id")))
        corpus = d.select(F.explode(ids).alias("doc_id"), "lang", "text")
        flags = corpus.select(
            "doc_id",
            words_col().alias("ws"),
            F.size(words_col()).cast("long").alias("n_tokens"),
            (F.col("doc_id") % DECONTAM_EVAL_STRIDE == 0).alias("is_eval"),
            (F.col("lang") == "en").alias("lang_ok"),
            (quality_score_col() >= QUALITY_FLOOR).alias("q_ok"),
            F.md5(normalized_text()).alias("fp"),
        )
        s3 = flags.where(
            ~F.col("is_eval") & F.col("lang_ok") & F.col("q_ok")
        )
        keep = Window.partitionBy("fp")
        return (
            s3.withColumn("keep", F.min("doc_id").over(keep))
            .where(F.col("doc_id") == F.col("keep"))
            .groupBy()
            .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("t"))
        )

    families = {
        "packwin": {
            "shipped(split)": lambda: pack_windows(split_tok),
            "lendiff": lambda: pack_windows(len_tok),
            "floor:scan+count": lambda: d.select(len_tok.alias("n")).agg(
                F.sum("n")
            ),
        },
        "surprisal": {
            "shipped": lambda: qs["text_unigram_surprisal"](spark, sf_dir),
            "floor:explode+tf": surprisal_floor,
        },
        "funnel": {
            "shipped": lambda: qs["pipeline_curation_funnel"](spark, sf_dir),
            "floor:flags+fp-window": funnel_floor,
        },
    }
    # value identity within the packwin family (the only one with two
    # full candidate forms)
    a = sorted(tuple(r) for r in pack_windows(split_tok).collect())
    b = sorted(tuple(r) for r in pack_windows(len_tok).collect())
    assert a and a == b, "packwin forms differ"
    print("# packwin forms value-identical,", len(a), "rows")

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

#!/usr/bin/env python
"""Round-15 A/B for pipeline_curation_funnel (r14 verdict task 4): does
an IN-TIMED-WINDOW materialization of the shared flags subtree beat the
shipped materialization-free form (which re-derives flags in each of its
~4 consumers: the stage-0..3 rollup, the fp-window rollup, the
contamination probe, and the eval shingle set)?

Forms (identical outputs asserted; every form's construction+action
timed TOGETHER, so the eager checkpoint's job is inside the timed
window — shipping a winner requires adding the cell to bench.py's
TIMED_CONSTRUCTION in the same commit):

  v0_shipped     registry form, no materialization
  v1_ckpt_flags  eager localCheckpoint of the FULL flags projection
                 (doc_id, ws, n_tokens, is_eval, lang_ok, q_ok, fp) —
                 every consumer then reads the checkpoint; the corpus is
                 scanned once and the split/quality/md5 kernels run once
  v2_ckpt_s4     eager localCheckpoint of the post-window dedup
                 survivors WITH ws — the two expensive window consumers
                 share it; the cheap rollup + eval branches still scan

Usage: python tools/funnel_ckpt_ab_r15.py [sf_dir] [passes]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

import bench
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark import (
    get_spark,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.functions.text import (
    normalized_text,
    quality_score_col,
    words_col,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.pipeline import (
    QUALITY_FLOOR,
    _STAGES,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (
    queries,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.text_analysis import (
    DECONTAM_EVAL_STRIDE,
    DECONTAM_NGRAM,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
    register_views,
)


def _flags(t):
    d = t["documents"]
    ids = F.when(
        F.col("doc_id") % 7 == 0,
        F.array(F.col("doc_id"), -F.col("doc_id") - 1),
    ).otherwise(F.array(F.col("doc_id")))
    corpus = d.select(F.explode(ids).alias("doc_id"), "lang", "text")
    return corpus.select(
        "doc_id",
        words_col().alias("ws"),
        F.size(words_col()).cast("long").alias("n_tokens"),
        (F.col("doc_id") % DECONTAM_EVAL_STRIDE == 0).alias("is_eval"),
        (F.col("lang") == "en").alias("lang_ok"),
        (quality_score_col() >= QUALITY_FLOOR).alias("q_ok"),
        F.md5(normalized_text()).alias("fp"),
    )


def _funnel_from_flags(flags, s4=None):
    """The funnel body given a (possibly materialized) flags relation,
    byte-for-byte the operator's logic."""
    train = ~F.col("is_eval")
    conds = [
        F.lit(True),
        train,
        train & F.col("lang_ok"),
        train & F.col("lang_ok") & F.col("q_ok"),
    ]
    aggs = []
    for i, c in enumerate(conds):
        aggs.append(F.sum(F.when(c, 1).otherwise(0)).alias(f"d{i}"))
        aggs.append(
            F.sum(F.when(c, F.col("n_tokens")).otherwise(0)).alias(f"t{i}")
        )
    stack_args = ", ".join(
        f"{i}L, '{_STAGES[i]}', d{i}, t{i}" for i in range(4)
    )
    funnel03 = flags.agg(*aggs).selectExpr(
        f"stack(4, {stack_args}) AS (stage_ord, stage, n_docs, n_tokens)"
    )
    if s4 is None:
        s3 = flags.where(train & F.col("lang_ok") & F.col("q_ok"))
        keep = F.min("doc_id").over(Window.partitionBy("fp"))
        s4 = (
            s3.withColumn("keep", keep)
            .where(F.col("doc_id") == F.col("keep"))
            .drop("keep")
        )
    n = DECONTAM_NGRAM
    hash_args = ", ".join(f"try_element_at(ws, i + {k})" for k in range(n))
    distinct_hashes = F.expr(
        f"array_distinct(transform(sequence(1, size(ws) - {n - 1}),"
        f" i -> xxhash64({hash_args})))"
    )
    eval_sh = (
        flags.where("is_eval")
        .where(F.size("ws") >= n)
        .select(F.explode(distinct_hashes).alias("sh"))
        .distinct()
    )
    stage4 = s4.agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    )
    contam = (
        s4.where(F.size("ws") >= n)
        .select("doc_id", "n_tokens", F.explode(distinct_hashes).alias("sh"))
        .join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id")
        .agg(F.max("n_tokens").alias("nt"))
        .agg(
            F.count("*").alias("c_docs"),
            F.coalesce(F.sum("nt"), F.lit(0).cast("long")).alias("c_tokens"),
        )
    )
    rows45 = stage4.crossJoin(contam).selectExpr(
        "stack(2, 4L, 'dedup', n_docs, n_tokens,"
        " 5L, 'decontam', n_docs - c_docs, n_tokens - c_tokens)"
        " AS (stage_ord, stage, n_docs, n_tokens)"
    )
    return funnel03.unionAll(rows45).orderBy("stage_ord")


def v1_ckpt_flags(t):
    flags = _flags(t).localCheckpoint()  # eager: job runs NOW (timed)
    return _funnel_from_flags(flags)


def v2_ckpt_s4(t):
    flags = _flags(t)
    train = ~F.col("is_eval")
    s3 = flags.where(train & F.col("lang_ok") & F.col("q_ok"))
    keep = F.min("doc_id").over(Window.partitionBy("fp"))
    s4 = (
        s3.withColumn("keep", keep)
        .where(F.col("doc_id") == F.col("keep"))
        .drop("keep")
        .localCheckpoint()
    )
    return _funnel_from_flags(flags, s4=s4)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaled/sf30"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
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
        app_name="funnel-ckpt-ab-r15",
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
        return [tuple(r) for r in df.collect()]

    forms = {
        "v0_shipped": lambda: qs["pipeline_curation_funnel"](spark, sf_dir),
        "v1_ckpt_flags": lambda: v1_ckpt_flags(t),
        "v2_ckpt_s4": lambda: v2_ckpt_s4(t),
    }
    base = rows(forms["v0_shipped"]())
    for name in ("v1_ckpt_flags", "v2_ckpt_s4"):
        assert rows(forms[name]()) == base, f"{name} differs"
    print("outputs identical across funnel forms", flush=True)

    res = {}
    for p in range(passes):
        for name, fn in forms.items():
            spark.sparkContext.setJobDescription(f"{name} pass {p}")
            t0 = time.perf_counter()  # construction TIMED (ckpt is eager)
            df = fn()
            df.write.format("noop").mode("overwrite").save()
            res.setdefault(name, []).append(round(time.perf_counter() - t0, 3))
    for name, vals in res.items():
        print(f"{name}: min {min(vals)} passes {vals}", flush=True)
    print(f"load_avg now: {os.getloadavg()}")


if __name__ == "__main__":
    main()

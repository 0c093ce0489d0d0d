#!/usr/bin/env python
"""A/B harness for text_repetition_stats forms (round 7).

Three candidate plans over the same documents table:
  a) string-bigram explode + (doc, bg) count + per-doc rollup (r05 form)
  b) xxhash64-bigram explode + (doc, bg) count + per-doc rollup
  c) zero-shuffle per-row form: sort the hashed-bigram array and fold
     run-lengths inside the row — no explode, no shuffle at all.

Usage: python tools/repstats_ab.py <sf_dir> <passes>
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F

from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark import (
    get_spark,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.functions.text import (
    words_col,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
    register_views,
)


def form_explode(docs, hashed):
    if hashed:
        gen = (
            "transform(sequence(1, size(ws) - 1),"
            " i -> xxhash64(try_element_at(ws, i), try_element_at(ws, i + 1)))"
        )
    else:
        gen = (
            "transform(sequence(1, size(ws) - 1),"
            " i -> concat_ws(' ', try_element_at(ws, i), try_element_at(ws, i + 1)))"
        )
    bi = (
        docs.select("doc_id", words_col().alias("ws"))
        .where(F.size("ws") >= 2)
        .select("doc_id", F.explode(F.expr(gen)).alias("bg"))
    )
    per_doc = (
        bi.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.max("c").alias("top_bigram_n"),
            F.count("*").alias("n_distinct_bigrams"),
        )
    )
    return finish(per_doc)


def form_perrow(docs):
    hs = (
        "array_sort(transform(sequence(1, size(ws) - 1),"
        " i -> xxhash64(try_element_at(ws, i), try_element_at(ws, i + 1))))"
    )
    stats = (
        "aggregate(hs,"
        " named_struct('prev', cast(null as bigint), 'cur', cast(0 as bigint),"
        "              'best', cast(0 as bigint), 'nd', cast(0 as bigint)),"
        " (a, x) -> named_struct("
        "   'prev', x,"
        "   'cur', IF(a.prev IS NOT NULL AND x = a.prev, a.cur + 1, cast(1 as bigint)),"
        "   'best', greatest(a.best, IF(a.prev IS NOT NULL AND x = a.prev, a.cur + 1, cast(1 as bigint))),"
        "   'nd', a.nd + IF(a.prev IS NULL OR x != a.prev, 1, 0)))"
    )
    per_doc = (
        docs.select("doc_id", words_col().alias("ws"))
        .where(F.size("ws") >= 2)
        .select("doc_id", F.expr(hs).alias("hs"))
        .select(
            "doc_id",
            F.size("hs").cast("long").alias("n_bigrams"),
            F.expr(stats).alias("st"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.col("st.best").alias("top_bigram_n"),
            F.col("st.nd").alias("n_distinct_bigrams"),
        )
    )
    return finish(per_doc)


def finish(per_doc):
    top_frac = F.col("top_bigram_n").cast("double") / F.col("n_bigrams")
    dup_frac = (
        F.col("n_bigrams") - F.col("n_distinct_bigrams")
    ).cast("double") / F.col("n_bigrams")
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "top_bigram_n",
        top_frac.alias("top_bigram_frac"),
        dup_frac.alias("dup_bigram_frac"),
        ((top_frac > 0.05) | (dup_frac > 0.2)).alias("flagged"),
    )


def main():
    sf_dir = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = bench._rechunk(sf_dir)
    bench._warm_page_cache(sf_dir)

    def tbl_size(f):
        p = os.path.join(sf_dir, f)
        if os.path.isdir(p):
            return sum(os.path.getsize(os.path.join(p, g)) for g in os.listdir(p))
        return os.path.getsize(p)

    largest = max(
        (tbl_size(f) for f in os.listdir(sf_dir) if f.endswith(".parquet")),
        default=10 * 1024 * 1024,
    )
    split = 256 * 1024 * 1024
    small = largest < 64 * 1024 * 1024
    spark = get_spark(
        app_name="repstats-ab",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(split),
            "spark.sql.files.openCostInBytes": str(split),
            "spark.sql.shuffle.partitions": "8" if small else str(os.cpu_count() or 32),
            "spark.sql.adaptive.enabled": "false" if small else "true",
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
        },
    )
    t = register_views(spark, sf_dir)
    docs = t["documents"]
    forms = {
        "a_string_explode": lambda: form_explode(docs, hashed=False),
        "b_hashed_explode": lambda: form_explode(docs, hashed=True),
        "c_perrow_fold": lambda: form_perrow(docs),
    }
    # sanity: all three agree
    base = None
    for name, mk in forms.items():
        rows = sorted(map(tuple, mk().collect()))
        if base is None:
            base = rows
        elif rows != base:
            print(f"MISMATCH in {name}!")
            sys.exit(1)
    print("forms agree:", len(base), "rows")
    for name, mk in forms.items():
        best = None
        for _ in range(passes):
            df = mk()
            start = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - start
            best = el if best is None else min(best, el)
        print(f"{name}: {best:.3f}", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Rejection audits for the two highest never-examined sf10 ratios
(r11 verdict task 6): sampling_pack_shards (12.4x in the loaded r11
sf10 leg) and events_markov_transitions (4.5x).

sampling_pack_shards decomposition (sf10, idle, min-of-3):
- bare text-column scan + token count: 0.34 s (lendiff form; the prior
  SIZE(SPLIT(...)) form paid 0.43 s for an array the count discards —
  now shipped as the length-difference expression)
- full cell (scan -> stratified window -> rollup): 0.86 s
- DuckDB whole query: ~0.11 s
The floor is the text-column scan itself: Spark's parquet text scan
alone is ~3x DuckDB's ENTIRE query. The plan has exactly one bounded
exchange (the (tb, mp) stratum window — never a global sort) and a
dimension-sized rollup; nothing structural remains. Executor-model
constant, adjudicated.

events_markov_transitions candidates (sf10, idle, min-of-3):
- window(shipped): lag over (user_id; ts, event_id) -> rollup   1.32 s
- agg+sort_array: per-user collect_list + sort_array + HOF
  pairwise explode (values identical)                            1.56 s  REJECTED
- floor: ONE exchange of the (user_id, ts, event_id, event_type)
  projection, no window at all                                   0.75 s
- DuckDB whole query                                              0.58 s
The one user_id exchange every correct plan pays ALREADY exceeds
DuckDB's entire query — the funnel_q18/tpch_q18 adjudication shape.
The shipped window is the best Spark form measured.

Usage: python tools/shards_markov_ab.py <sf_dir> [passes]
Re-runs both audits and prints the table above for the given corpus.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark import (
    get_spark,
)
from pyspark.sql import Window, functions as F


def main():
    sf_dir = bench._rechunk(sys.argv[1])
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    bench._warm_page_cache(sf_dir)
    spark = get_spark(
        app_name="shards-markov-ab",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024 * 1024),
            "spark.sql.shuffle.partitions": str(os.cpu_count() or 32),
            "spark.sql.adaptive.enabled": "true",
        },
    )
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    e = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    d.count(), e.count()

    len_tok = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    ).cast("long")
    split_tok = F.size(F.split(F.col("text"), " ")).cast("long")

    def shards_full(tok):
        sized = d.select("doc_id", tok.alias("n_tokens"))
        keyed = sized.select(
            "doc_id", "n_tokens",
            (F.col("n_tokens") / 16).cast("long").alias("tb"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2).alias("mp"),
        )
        stratum = Window.partitionBy("tb", "mp").orderBy("doc_id")
        dealt = keyed.select(
            "n_tokens",
            ((F.row_number().over(stratum) - 1
              + F.ascii(F.substring(F.col("mp"), 1, 1)) * 7
              + F.ascii(F.substring(F.col("mp"), 2, 1)) * 3
              + F.col("tb")) % 8).cast("long").alias("shard_id"),
        )
        return dealt.groupBy("shard_id").agg(
            F.count("*").alias("n_docs"), F.sum("n_tokens").alias("total_tokens")
        )

    def markov_window():
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        seq = e.select("event_type", F.lag("event_type").over(w).alias("from_type"))
        trans = (
            seq.where(F.col("from_type").isNotNull())
            .groupBy("from_type", F.col("event_type").alias("to_type"))
            .agg(F.count("*").alias("n"))
        )
        outs = trans.groupBy("from_type").agg(F.sum("n").alias("n_out"))
        return trans.join(F.broadcast(outs), "from_type").select(
            "from_type", "to_type", "n",
            (F.col("n").cast("double") / F.col("n_out")).alias("prob"),
        )

    def markov_aggsort():
        per = e.groupBy("user_id").agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        pairs = per.select(
            F.explode(
                F.expr(
                    "transform(slice(evs, 2, size(evs)-1), (x, i) ->"
                    " struct(evs[i].event_type AS from_type,"
                    " x.event_type AS to_type))"
                )
            ).alias("p")
        ).select("p.from_type", "p.to_type")
        trans = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
        outs = trans.groupBy("from_type").agg(F.sum("n").alias("n_out"))
        return trans.join(F.broadcast(outs), "from_type").select(
            "from_type", "to_type", "n",
            (F.col("n").cast("double") / F.col("n_out")).alias("prob"),
        )

    forms = {
        "shards:lendiff(shipped)": lambda: shards_full(len_tok),
        "shards:split(old)": lambda: shards_full(split_tok),
        "shards:floor-scan+count": lambda: d.select(len_tok.alias("n")).agg(
            F.sum("n")
        ),
        "markov:window(shipped)": markov_window,
        "markov:agg+sort_array": markov_aggsort,
        "markov:floor-one-exchange": lambda: e.select(
            "user_id", "ts", "event_id", "event_type"
        ).repartition(int(spark.conf.get("spark.sql.shuffle.partitions")), "user_id"),
    }
    assert sorted(tuple(r) for r in shards_full(len_tok).collect()) == sorted(
        tuple(r) for r in shards_full(split_tok).collect()
    )
    assert sorted(tuple(r) for r in markov_window().collect()) == sorted(
        tuple(r) for r in markov_aggsort().collect()
    )
    print("# values identical within each family")
    best: dict[str, float] = {}
    for p in range(passes):
        for name, fn in forms.items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best[name] = min(best.get(name, 1e9), time.perf_counter() - t0)
    for name, v in best.items():
        print(f"{name:28s} {v:.3f}")


if __name__ == "__main__":
    main()

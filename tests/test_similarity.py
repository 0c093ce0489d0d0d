"""Similarity-search semantics: exact top-k ordering, bucketed-ANN
containment, and the decode-stub multimodal plumbing."""

from __future__ import annotations

from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (
    queries,
)
from conftest import SF_ORACLE


def test_bruteforce_topk_sorted_and_sane(spark):
    rows = queries()["similarity_bruteforce_topk"](spark, SF_ORACLE).collect()
    assert len(rows) == 10
    sims = [r.cos_sim for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in sims)


def test_topk_per_query_shape(spark):
    rows = queries()["similarity_topk_per_query"](spark, SF_ORACLE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    assert all(len(v) == 5 for v in by_q.values())
    assert all(r.vec_id != r.q_id for r in rows)


def test_bucketed_ann_subset_of_same_bucket(spark):
    """Bucketed ANN may lose recall vs brute force, but every returned
    candidate must share the query's sign-bucket (correct containment)."""
    import pyspark.sql.functions as F

    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
        register_views,
    )

    emb = register_views(spark, SF_ORACLE)["embeddings"]
    bit = lambda i, w: (F.when(F.element_at("embedding", i) >= 0, 1).otherwise(0) * w)
    buckets = {
        r.vec_id: r.bucket
        for r in emb.select(
            "vec_id", (bit(1, 8) + bit(2, 4) + bit(3, 2) + bit(4, 1)).alias("bucket")
        ).collect()
    }
    rows = queries()["similarity_bucketed_ann"](spark, SF_ORACLE).collect()
    assert rows
    assert all(buckets[r.q_id] == buckets[r.cand_id] for r in rows)


def test_multimodal_decode_stub_deterministic(spark):
    q = queries()["multimodal_decode_features"]
    r1 = sorted(tuple(r) for r in q(spark, SF_ORACLE).collect())
    r2 = sorted(tuple(r) for r in q(spark, SF_ORACLE).collect())
    assert r1 == r2
    assert all(r[2] >= 1 and r[3] >= 1 and r[4] == 3 for r in r1)


def test_multimodal_decode_real_is_stubbed(spark):
    import pytest

    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.multimodal import (
        decode_real,
    )
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
        register_views,
    )

    docs = register_views(spark, SF_ORACLE)["documents"]
    with pytest.raises(NotImplementedError):
        decode_real(docs)


def test_ivf_recall_vs_exact(spark):
    """IVF with nprobe=2 over 20 cells scans 10% of the corpus per query;
    picking cells at random would recover ~10% of the exact top-3. The
    routing must beat that by 3x (measured 0.43 on this corpus — uniform
    random embeddings are near-orthogonal, the adversarial case for IVF;
    clustered real-world embeddings route far better)."""
    from pyspark.sql import Window, functions as F

    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.similarity import (
        cosine_expr,
    )
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
        register_views,
    )

    ivf = {
        (r.q_id, r.cand_id)
        for r in queries()["similarity_ivf_ann"](spark, SF_ORACLE).collect()
    }
    e = register_views(spark, SF_ORACLE)["embeddings"]
    q = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "cand_id")
    exact = {
        (r.q_id, r.cand_id)
        for r in (
            e.crossJoin(F.broadcast(q))
            .where(F.col("vec_id") != F.col("q_id"))
            .select(
                "q_id",
                F.col("vec_id").alias("cand_id"),
                cosine_expr("embedding", "q_emb").alias("cos_sim"),
            )
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
        ).collect()
    }
    assert len(exact) == 30
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.3, f"IVF recall {recall:.2f}"

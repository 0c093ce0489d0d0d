"""Behavioral tests for the scale/sampling operators (operators/scale.py)
beyond the differential oracle suite."""

from __future__ import annotations

from conftest import SF_ORACLE

from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (
    queries,
)


def test_pack_shards_balances_tokens(spark):
    """All 8 shards populated; token totals within 2x of each other (the
    stratified deal's balance contract at 500 docs)."""
    rows = queries()["sampling_pack_shards"](spark, SF_ORACLE).collect()
    assert sorted(r.shard_id for r in rows) == list(range(8))
    totals = [r.total_tokens for r in rows]
    assert max(totals) <= 2 * min(totals), totals

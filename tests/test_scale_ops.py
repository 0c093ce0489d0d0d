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


def test_pii_scrub_redacts_injected_pii(spark):
    """Docs with doc_id % 15 == 0 carry both an injected email and phone;
    the scrub counts each exactly once, and the fingerprint of one such
    doc equals the md5 of the text rebuilt with literal [EMAIL]/[PHONE]
    redactions — proving the replacement actually happened, not just that
    some fingerprint was produced."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    rows = {
        r.doc_id: r
        for r in queries()["text_pii_scrub"](spark, SF_ORACLE).collect()
    }
    for doc_id, r in rows.items():
        assert r.n_emails == (1 if doc_id % 3 == 0 else 0), r
        assert r.n_phones == (1 if doc_id % 5 == 0 else 0), r
        assert r.scrubbed_fp is not None

    tbl = pq.read_table(
        os.path.join(SF_ORACLE, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pydict()
    texts = dict(zip(tbl["doc_id"], tbl["text"]))
    doc_id = next(d for d in sorted(texts) if d % 15 == 0)
    expected = texts[doc_id] + " contact [EMAIL] call [PHONE]"
    assert rows[doc_id].scrubbed_fp == hashlib.md5(expected.encode()).hexdigest()


def test_corpus_digest_tracks_content_not_just_names(spark, tmp_path):
    """Regression for the round-4 review finding: rewriting a corpus in
    place under the same file names must change the layout-cache digest,
    or cached partitioned/bucketed copies silently serve stale data."""
    import shutil
    import time

    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.scale import (
        _corpus_digest,
    )

    src = "/root/testdata/sf0.001/region.parquet"
    dst = str(tmp_path / "region.parquet")
    shutil.copy(src, dst)
    d1 = _corpus_digest(spark.read.parquet(dst))
    time.sleep(0.01)
    shutil.copy(src, dst)  # same name, same bytes, new mtime
    d2 = _corpus_digest(spark.read.parquet(dst))
    assert d1 != d2

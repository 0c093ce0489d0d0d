"""Validation of the non-SQL-expressible dedup paths (MinHash+LSH, SimHash)
against the oracle-checked exact-Jaccard ground truth, plus determinism
(these run rows-only in the driver, so the tests carry the semantics)."""

from __future__ import annotations

import pytest

from conftest import SF_ORACLE

from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (
    queries,
)


@pytest.fixture(scope="module")
def ground_truth_pairs(spark):
    df = queries()["dedup_ngram_jaccard"](spark, SF_ORACLE)
    return {(r.a_id, r.b_id): r.jaccard for r in df.collect()}


def test_ground_truth_nonempty(ground_truth_pairs):
    assert len(ground_truth_pairs) > 0


def test_minhash_recall_is_total(spark, ground_truth_pairs):
    """The registered output is band-candidates filtered by EXACT Jaccard
    >= MINHASH_VERIFY_THRESHOLD, and its driver oracle is plain exact
    Jaccard at that threshold — so the two agree iff banding recall is 1
    on this corpus. Recall is deterministic (fixed corpus, fixed seeds)
    but NOT probabilistically guaranteed — a J=0.75 pair collides in
    expectation with only p~0.78 under 4x4 bands — so this test is the
    local tripwire that fires before the driver compare would if a
    regenerated corpus plants a pair the banding misses (see
    test_minhash_recall_other_corpora for the other driver corpora)."""
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.dedup import (
        MINHASH_VERIFY_THRESHOLD,
    )

    truth = {
        p: j for p, j in ground_truth_pairs.items() if j >= MINHASH_VERIFY_THRESHOLD
    }
    assert truth, "corpus lost its planted near-dups?"
    got = {
        (r.a_id, r.b_id): r.jaccard
        for r in queries()["dedup_minhash_lsh"](spark, SF_ORACLE).collect()
    }
    assert set(got) == set(truth), (
        f"LSH+verify != exact truth: missed={set(truth) - set(got)} "
        f"extra={set(got) - set(truth)}"
    )
    for p, j in truth.items():
        assert abs(got[p] - j) < 1e-12


def test_minhash_deterministic(spark):
    q = queries()["dedup_minhash_lsh"]
    r1 = sorted(tuple(r) for r in q(spark, SF_ORACLE).collect())
    r2 = sorted(tuple(r) for r in q(spark, SF_ORACLE).collect())
    assert r1 == r2


def test_simhash_pairs_are_near_dups(spark, ground_truth_pairs):
    """SimHash hamming<=6 pairs should overwhelmingly be genuine near-dups
    (precision against exact Jaccard >= 0.2 on 3-shingles)."""
    pairs = [
        (r.a_id, r.b_id, r.hamming)
        for r in queries()["dedup_simhash"](spark, SF_ORACLE).collect()
    ]
    assert pairs, "simhash found no candidate pairs"
    hits = sum(1 for a, b, _ in pairs if (a, b) in ground_truth_pairs)
    # every returned pair ordered and unique
    assert all(a < b for a, b, _ in pairs)
    assert len({(a, b) for a, b, _ in pairs}) == len(pairs)
    precision = hits / len(pairs)
    recall = hits / len(ground_truth_pairs)
    assert precision >= 0.5, f"simhash precision {precision:.2f} over {len(pairs)} pairs"
    assert recall >= 0.4, f"simhash recall {recall:.2f}"


def test_exact_dedup_counts(spark):
    """The re-injected sample (doc_id % 7 == 0) must come back as exactly
    those duplicate groups, each with 2 copies keeping the original id."""
    rows = queries()["dedup_exact"](spark, SF_ORACLE).collect()
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    expected = docs.where("doc_id % 7 = 0").count()
    # identical texts across different doc_ids would merge groups; allow <=
    assert 0 < len(rows) <= expected
    assert all(r.n_copies >= 2 for r in rows)


def test_min_label_components_chain_and_cycle(spark):
    """The propagation loop itself, on crafted graphs: a 6-node path (needs
    multiple rounds — exercises the fixpoint iteration, not just round 1),
    a triangle, and an isolated pair, all in one edge list."""
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.dedup import (
        min_label_components,
    )

    edges = spark.createDataFrame(
        # path 1-2-3-4-5-6, triangle 10-11-12, pair 20-21
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
         (10, 11), (11, 12), (10, 12),
         (20, 21)],
        "a_id long, b_id long",
    )
    got = {r.node: r.label for r in min_label_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_min_label_components_round_cap_raises(spark):
    """A path longer than max_rounds must fail loudly, not return a
    half-propagated labeling."""
    import pytest as _pytest

    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.dedup import (
        min_label_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "a_id long, b_id long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        min_label_components(chain, max_rounds=2)


def test_dedup_components_labels_match_pair_graph(spark):
    """Every clustered doc gets the min doc_id of its cluster, and the
    clustered doc set equals the docs appearing in >=1 verified pair —
    over the LSH-verified pair graph the entry actually composes on
    (r10: the quadratic build was replaced by the scale path)."""
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.dedup import (
        lsh_verified_pairs,
    )
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
        register_views,
    )

    t = register_views(spark, SF_ORACLE)
    pairs = [(r.a_id, r.b_id) for r in lsh_verified_pairs(t).collect()]
    comp = {r.doc_id: r.component for r in
            queries()["dedup_components"](spark, SF_ORACLE).collect()}
    in_pairs = {d for p in pairs for d in p}
    assert set(comp) == in_pairs
    for a, b in pairs:
        assert comp[a] == comp[b], f"pair ({a},{b}) split across components"
    assert all(lbl <= d for d, lbl in comp.items())


def test_star_components_matches_min_label_on_crafted_graphs(spark):
    """Same fixpoint as min-label propagation on the crafted mix (path,
    triangle, isolated pair) and on a branching tree."""
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.dedup import (
        min_label_components,
        star_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
         (10, 11), (11, 12), (10, 12),
         (20, 21),
         (30, 31), (30, 32), (31, 33), (32, 34)],
        "a_id long, b_id long",
    )
    want = {r.node: r.label for r in min_label_components(edges).collect()}
    got = {r.node: r.label for r in star_components(edges).collect()}
    assert got == want


def test_star_components_handles_long_chain_where_min_label_cannot(spark):
    """The log-round property, demonstrated: a 64-node path needs 63
    propagation rounds (min-label's 50-round cap raises), while the
    large-star/small-star contraction converges well inside its own
    cap and labels the whole chain with node 0."""
    import pytest as _pytest

    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.dedup import (
        min_label_components,
        star_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "a_id long, b_id long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        min_label_components(chain)
    got = {r.node: r.label for r in star_components(chain, max_rounds=12).collect()}
    assert got == {i: 0 for i in range(64)}


def test_dedup_components_star_equals_frontier_entry(spark):
    """Both registered components entries must emit the identical
    (doc_id, component) relation on the oracle corpus."""
    a = sorted(
        tuple(r)
        for r in queries()["dedup_components"](spark, SF_ORACLE).collect()
    )
    b = sorted(
        tuple(r)
        for r in queries()["dedup_components_star"](spark, SF_ORACLE).collect()
    )
    assert a and a == b


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.1"])
def test_minhash_recall_other_corpora(spark, sf_dir):
    """Same equality tripwire on the other two driver corpora — the oracle
    contract must hold wherever the driver might point it."""
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.dedup import (
        MINHASH_VERIFY_THRESHOLD,
    )

    truth = {
        (r.a_id, r.b_id)
        for r in queries()["dedup_ngram_jaccard"](spark, sf_dir).collect()
        if r.jaccard >= MINHASH_VERIFY_THRESHOLD
    }
    got = {
        (r.a_id, r.b_id)
        for r in queries()["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    assert truth and got == truth, (
        f"missed={truth - got} extra={got - truth}"
    )

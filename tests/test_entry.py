"""Smoke tests for the driver contract (__spark_entry__.py)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"r_name", "c_mktsegment", "revenue", "n_items"} == set(df.columns)


def test_every_oracle_key_has_query():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 40


def test_bench_final_line_always_fits_tail_budget():
    """The driver parses the LAST stdout line from a ~2000-char tail
    capture; r07's artifact was unreadable because the line outgrew it.
    The guard must hold even for a 200-cell suite with long names."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
    import bench

    names = [f"some_quite_long_operator_name_{i:03d}" for i in range(200)]
    evidence = {
        "metric": "headline_suite_wall_clock",
        "value": 123.456,
        "queries": {n: 1.234 for n in names},
        "sf": 0.1,
        "duckdb_reference": {
            "ratio_common": 1.23,
            "ratio_common_symmetric": 1.11,
        },
    }
    line = bench.final_line(evidence, names, "/tmp/evidence.json")
    assert len(line) <= bench.FINAL_LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["n_cells"] == 200
    assert parsed["ratio_common"] == 1.23
    # and a small suite keeps full per-query precision
    small = dict(evidence, queries={"q1": 1.234, "q2": 0.567})
    parsed = json.loads(bench.final_line(small, ["q1", "q2"], None))
    assert parsed["queries"] == {"q1": 1.234, "q2": 0.567}
    # oversized suite AND a failed evidence write (ADVICE r08: the old
    # fallback emitted a null file pointer and lost every per-query
    # value): the line must still fit AND carry the worst cells first
    big = dict(
        evidence,
        queries={n: float(i) for i, n in enumerate(names)},
    )
    line = bench.final_line(big, names, None)
    assert len(line) <= bench.FINAL_LINE_BUDGET
    parsed = json.loads(line)
    kept = parsed["queries"]["_truncated_worst_first"]
    assert kept, "fallback dropped every per-query value"
    # worst-first: the slowest cell must be present, the fastest absent
    assert "some_quite_long_operator_name_199" in kept
    assert "some_quite_long_operator_name_000" not in kept


def test_asymmetric_cells_pinned():
    """The symmetric-ratio exclusion set is governed by the admission rule
    in bench.py (r11 verdict item 7): a new exclusion requires a
    structural reason in the artifact, a BASELINE.md justification, AND an
    update to this pin — so the set can never grow silently between
    rounds."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
    import bench

    assert set(bench.ASYMMETRIC_CELLS) == {
        "cdc_merge_incremental",
        "cdc_merge_apply",
        "streaming_dedup_watermark",
        "streaming_tumbling_hourly",
        "streaming_cdc_upsert_bucketed",
        "streaming_dedup_minhash",
    }
    for name, reason in bench.ASYMMETRIC_CELLS.items():
        assert isinstance(reason, str) and len(reason) > 20, name

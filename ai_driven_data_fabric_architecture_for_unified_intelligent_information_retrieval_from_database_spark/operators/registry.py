"""Registry of named queries: the driver-facing catalog of every implemented
operator (SURVEY.md section 2 plus the LLM-data-pipeline expansion).

Each entry pairs a PySpark builder ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL oracle string DuckDB runs on the same parquet, or
``oracle=None`` for genuinely non-SQL-expressible operators (the driver then
records a weaker rows-only check).

Determinism contract for every registered query (the hash compare demands it):
- any LIMIT is backed by a total order (unique tie-break column);
- float aggregations use the stable decimal-sum helpers (functions/numerics);
- no wall-clock dependence (fixed date literals, not CURRENT_DATE);
- timestamps compared under UTC session timezone.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import register_views

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    #: SURVEY.md section-2 row(s) / capability this entry covers, for the
    #: coverage audit.
    covers: str = ""


REGISTRY: dict[str, RegisteredQuery] = {}

#: Names promoted to the FRONT of :func:`queries` for the current round.
#:
#: External correctness harnesses sample a ~50-entry prefix of the registry
#: per round; this list rotates that window so every entry eventually gets a
#: hard driver-side differential check (the local suite in
#: tests/test_oracle_parity.py covers all oracle-backed entries every run
#: regardless).  Round-window history lives in README.md ("Correctness window
#: rotation").
#:
#: Round 7 window (r06 verdict task 7: the r06 window never rotated, so
#: ~104 entries had not been driver-re-verified since r05 or earlier).
#: Composition per the standing churn-first rule, then the
#: longest-unverified tail:
#: 1. everything round 7 TOUCHED — the repetition-stats per-row rewrite
#:    (values could move only via in-doc 64-bit hash collisions, so the
#:    driver must re-verify), the rebuilt PageRank (guarded pack, cloned
#:    AQE-off session, vectorized support filter), the new incremental
#:    CDC target plus the refactored cdc_merge_apply and
#:    bucketed_join_revenue (shared ensure helper), and the
#:    probe-cache-affected cost-chosen joins (q3/q5/q22/q4/join_star);
#: 2. the 36 entries whose last driver check was r01/r02 (the oldest
#:    tail: nl_* planner queries, scalar-function packs, similarity,
#:    events/temporal, text head).
#: Names not yet registered are skipped harmlessly.
SAMPLE_PRIORITY: list[str] = [
    # --- round-7 churn ---
    "pipeline_curation_funnel",
    "multimodal_decode_ppm_real",
    "layout_zorder_box_read",
    "streaming_static_enrichment",
    "source_schema_evolution",
    "dedup_cluster_representatives",
    "basket_lift_rules",
    "basket_part_pairs",
    "text_repetition_stats",
    "graph_pagerank_parts",
    "cdc_merge_incremental",
    "cdc_merge_apply",
    "bucketed_join_revenue",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q4_order_priority",
    "tpch_q22_global_sales_opportunity",
    "join_star_flagship",
    "streaming_tumbling_hourly",  # newly benched streaming drain
    "streaming_dedup_watermark",
    # --- longest-unverified (last green in r01/r02) ---
    "nl_revenue_by_region",
    "nl_revenue_by_segment",
    "nl_top_customers",
    "nl_orders_by_year",
    "nl_avg_order_value_by_segment",
    "nl_count_suppliers",
    "nl_docs_by_language",
    "nl_longest_documents",
    "nl_events_by_hour",
    "nl_events_by_type",
    "nl_most_active_users",
    "date_functions",
    "agg_variance_stddev",
    "agg_percentiles",
    "string_functions",
    "conditional_null_functions",
    "join_full_outer",
    "tpch_q12_ship_priority_counts",
    "tpch_q16_supplier_relationship_count",
    "tpch_q20_dominant_part_suppliers",
    "similarity_bruteforce_topk",
    "similarity_topk_per_query",
    "similarity_threshold_pairs",
    "similarity_ivf_ann",
    "events_json_extract",
    "events_sliding_window",
    "events_sessionize",
    "events_dedup_latest_state",
    "events_json_schema_parse",
    "asof_join_event_signup",
    "range_join_price_bands",
    "windowed_event_rate",
    "timeseries_gap_fill",
    "text_token_count",
    "text_word_frequency",
    "text_lang_id",
]


def query(name: str, oracle: str | None, covers: str = ""):
    """Decorator: register ``fn(spark, tables) -> DataFrame`` under ``name``.

    The wrapped function receives the dict of table DataFrames; view
    registration (and UTC pinning) happens here so individual operators stay
    declarative.
    """

    def deco(fn: Callable[[SparkSession, dict[str, DataFrame]], DataFrame]) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tables = register_views(spark, sf_dir)
            return fn(spark, tables)

        wrapped.__name__ = f"query_{name}"
        wrapped.__doc__ = fn.__doc__
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = RegisteredQuery(name=name, fn=wrapped, oracle=oracle, covers=covers)
        return wrapped

    return deco


def query_sfdir(name: str, oracle: str | None, covers: str = ""):
    """Like :func:`query`, but the function receives ``(spark, sf_dir)``
    directly — for operators that construct their own source from the data
    directory (the streaming entries build a readStream, not a temp view).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle, covers=covers)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    """Registered queries, this round's :data:`SAMPLE_PRIORITY` window first.

    Harnesses that sample a prefix of this dict see the current rotation
    window (never-yet-driver-verified entries) before everything else; the
    remainder keeps oracle-backed entries before rows-only ones, preserving
    the module registration order of :func:`_ensure_loaded` within each
    group.
    """
    _ensure_loaded()
    prio = {name: i for i, name in enumerate(SAMPLE_PRIORITY)}
    ordered = sorted(
        enumerate(REGISTRY.values()),
        key=lambda p: (
            prio.get(p[1].name, len(prio)),
            p[1].oracle is None,
            p[0],
        ),
    )
    return {rq.name: rq.fn for _, rq in ordered}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: rq.oracle for name, rq in REGISTRY.items() if rq.oracle is not None}


def _ensure_loaded() -> None:
    """Import every operator module for its registration side effects.

    Import order is deliberate: external correctness harnesses that sample a
    prefix of the registration order should see the highest-value operators
    first (TPC-H shapes, dedup, similarity, events/temporal, text), with the
    long tail of fine-grained relational primitives — each already covered by
    the local differential suite in tests/test_oracle_parity.py — last.
    """
    from . import tpch  # noqa: F401
    from . import tpch_extra  # noqa: F401
    from . import tpch_missing  # noqa: F401
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
    from . import events  # noqa: F401
    from . import changes  # noqa: F401
    from . import graph  # noqa: F401
    from . import temporal  # noqa: F401
    from . import text_analysis  # noqa: F401
    from . import pipeline  # noqa: F401
    from . import scale  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import nl  # noqa: F401
    from . import relational  # noqa: F401
    from . import streaming_entries  # noqa: F401

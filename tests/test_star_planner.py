"""Star-schema NL planner: branch selection, engine integration, and the
end-to-end NL path (covered differentially in the oracle-parity suite via
the nl_* registry entries)."""

from __future__ import annotations

import pytest

from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.engine import (
    DataFabricEngine,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.plans.star_planner import (
    plan_star,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
    STAR_TABLES,
    register_views,
)
from conftest import SF_SMOKE

CASES = [
    ("What is the revenue by region?", "revenue_by_region"),
    ("revenue per nation please", "revenue_by_nation"),
    ("Show revenue per market segment", "revenue_by_segment"),
    ("top 5 customers by total spending", "top_customers"),
    ("How many orders were placed per year?", "orders_by_year"),
    ("average order value", "avg_order_value"),
    ("Average order value by market segment", "avg_order_value_by_segment"),
    ("how many parts are in the catalog", "count_part"),
    ("customers without any orders", "customers_without_orders"),
]


@pytest.mark.parametrize("question,branch", CASES)
def test_branch_selection(question, branch):
    p = plan_star(question)
    assert p is not None and p.branch == branch, f"{question!r} -> {p and p.branch}"


def test_top_n_extraction():
    assert "LIMIT 5" in plan_star("top 5 customers").sql
    assert "LIMIT 10" in plan_star("top customers").sql  # default k


def test_no_rule_returns_none():
    assert plan_star("tell me something nice") is None


def test_word_boundary_no_substring_hijack():
    # "department" must not match the `part` table, "border" not `orders`
    assert plan_star("How many employees work in the IT department?") is None
    assert plan_star("how many border cases") is None


def test_employee_questions_always_fall_through():
    assert plan_star("count of employees per customer segment") is None


def test_engine_star_mode_end_to_end(spark):
    register_views(spark, SF_SMOKE)
    eng = DataFabricEngine(
        spark, tables=set(STAR_TABLES), default_table="customer", use_star_rules=True
    )
    out = eng.process("What is the revenue by region?")
    assert out["success"] is True, out.get("error")
    assert out["columns"] == ["region", "revenue"]
    assert out["row_count"] == 5
    # star plans pass the same validator as everything else
    assert "JOIN" in out["sql_query"]


def test_engine_star_mode_falls_back_to_default(spark):
    register_views(spark, SF_SMOKE)
    eng = DataFabricEngine(
        spark, tables=set(STAR_TABLES) | {"employees"}, use_star_rules=True
    )
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
        register_employees,
    )

    register_employees(spark, n=50)
    out = eng.process("Show me all employees in the company")
    assert out["success"] is True
    assert "FROM employees" in out["sql_query"]


def test_star_rule_blocked_when_tables_not_allowlisted(spark):
    register_views(spark, SF_SMOKE)
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
        register_employees,
    )

    register_employees(spark, n=50)
    eng = DataFabricEngine(spark, tables={"employees"}, use_star_rules=True)
    out = eng.process("What is the revenue by region?")
    # star rule needs lineitem/orders/... which are not allowlisted -> falls
    # through to the single-table cascade (default branch) on employees
    assert "FROM employees" in out["sql_query"]


DOC_EVENT_CASES = [
    ("Show document counts by language", "docs_by_language"),
    ("What are the 5 longest documents?", "longest_documents"),
    ("how many documents are in the corpus", "count_documents"),
    ("How many events per hour?", "events_by_hour"),
    ("Give me the event breakdown by type", "events_by_type"),
    ("Who are the 8 most active users?", "most_active_users"),
    # curation-surface routes (r08 verdict item 8): the quality/dedup/token
    # questions must win over the generic per-language / how-many rules
    # that also match their phrasing
    (
        "How many documents per language clear the quality floor?",
        "docs_quality_floor_by_lang",
    ),
    (
        "Which sources have low quality documents?",
        "docs_quality_floor_by_source",
    ),
    (
        "How many exact duplicate documents does each source contain?",
        "docs_duplicates_by_source",
    ),
    ("deduplicate the document corpus", "docs_duplicates_by_source"),
    (
        "What is the average document length in tokens per source?",
        "docs_avg_tokens_by_source",
    ),
]


@pytest.mark.parametrize("question,branch", DOC_EVENT_CASES)
def test_document_event_branches(question, branch):
    p = plan_star(question)
    assert p is not None and p.branch == branch, f"{question!r} -> {p and p.branch}"

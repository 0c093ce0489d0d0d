"""Plan-based SQL validator tests (SURVEY.md section 5.2(3)): SELECT-only
enforcement, table allowlist, fence stripping — including the cases the
reference's substring blocklist (core/ai_query_generator.py:301-307) gets
wrong in both directions."""

from __future__ import annotations

import pytest

from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.plans.validator import (
    SqlValidationError,
    strip_markdown_fences,
    validate_select,
)

ALLOWED = {"employees", "query_logs"}


def test_plain_select_passes(spark):
    v = validate_select(spark, "SELECT name FROM employees LIMIT 10", ALLOWED)
    assert v.tables == {"employees"}


def test_cte_passes(spark):
    v = validate_select(
        spark,
        "WITH t AS (SELECT name FROM employees) SELECT * FROM t",
        ALLOWED,
    )
    assert "employees" in v.tables


def test_markdown_fences_stripped(spark):
    v = validate_select(
        spark, "```sql\nSELECT name FROM employees;\n```", ALLOWED
    )
    assert v.sql == "SELECT name FROM employees"


def test_insert_rejected(spark):
    with pytest.raises(SqlValidationError):
        validate_select(spark, "INSERT INTO employees VALUES (1)", ALLOWED)


def test_drop_rejected(spark):
    with pytest.raises(SqlValidationError):
        validate_select(spark, "DROP TABLE employees", ALLOWED)


def test_non_allowlisted_table_rejected(spark):
    with pytest.raises(SqlValidationError):
        validate_select(spark, "SELECT * FROM secrets", ALLOWED)


def test_join_against_non_allowlisted_rejected(spark):
    with pytest.raises(SqlValidationError):
        validate_select(
            spark,
            "SELECT * FROM employees e JOIN secrets s ON e.id = s.id",
            ALLOWED,
        )


def test_substring_false_positive_now_admitted(spark):
    """The reference rejects any SQL containing 'update' as a substring
    (:301-302) — a column named updated_at is legitimate; we admit it."""
    v = validate_select(
        spark,
        "SELECT name AS updated_at_created_dropped FROM employees",
        ALLOWED,
    )
    assert v.tables == {"employees"}


def test_empty_rejected(spark):
    with pytest.raises(SqlValidationError):
        validate_select(spark, "   ", ALLOWED)


def test_non_select_prefix_rejected(spark):
    with pytest.raises(SqlValidationError):
        validate_select(spark, "EXPLAIN SELECT * FROM employees", ALLOWED)


def test_strip_fences_idempotent():
    assert strip_markdown_fences("SELECT 1") == "SELECT 1"

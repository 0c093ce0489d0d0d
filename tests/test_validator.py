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


def test_subquery_alias_does_not_excuse_table(spark):
    """Bypass regression: a subquery alias named after a non-allowlisted
    table must not legitimize reading that table. FROM (SELECT ...) secret
    never produces UnresolvedRelation [secret] for the alias itself, so the
    inner read of the real `secret` table must be caught."""
    with pytest.raises(SqlValidationError, match="secret"):
        validate_select(
            spark, "SELECT * FROM (SELECT id FROM secret) secret", ALLOWED
        )


def test_subquery_alias_over_allowed_table_passes(spark):
    v = validate_select(
        spark, "SELECT * FROM (SELECT name FROM employees) employees", ALLOWED
    )
    assert v.tables == {"employees"}


def test_cte_name_is_scoped_not_global(spark):
    """A CTE defined inside one subquery must not excuse a same-named real
    table referenced outside that subquery's scope."""
    with pytest.raises(SqlValidationError, match="secret"):
        validate_select(
            spark,
            "SELECT * FROM (WITH secret AS (SELECT 1 AS id) "
            "SELECT * FROM secret) t JOIN secret s ON 1 = 1",
            ALLOWED,
        )


def test_cte_shadowing_allowed_inside_scope(spark):
    """Inside its scope a CTE name shadows the catalog — a CTE named like a
    forbidden table is fine as long as only the CTE is read."""
    v = validate_select(
        spark,
        "WITH secret AS (SELECT name FROM employees) SELECT * FROM secret",
        ALLOWED,
    )
    assert v.tables == {"employees"}


def test_sibling_cte_reference_passes(spark):
    v = validate_select(
        spark,
        "WITH a AS (SELECT id FROM employees), "
        "b AS (SELECT * FROM a) SELECT * FROM b",
        ALLOWED,
    )
    assert v.tables == {"employees"}


def test_with_prefixed_insert_rejected(spark):
    """Starts with WITH (passes the text gate) but parses to an
    InsertIntoStatement — the node allowlist must reject it."""
    with pytest.raises(SqlValidationError, match="non-query"):
        validate_select(
            spark,
            "WITH x AS (SELECT 1 AS a) INSERT INTO employees SELECT * FROM x",
            ALLOWED,
        )


def test_scalar_subquery_relations_checked(spark):
    with pytest.raises(SqlValidationError, match="secret"):
        validate_select(
            spark,
            "SELECT (SELECT MAX(x) FROM secret) m FROM employees",
            ALLOWED,
        )


def test_qualified_table_name_rejected(spark):
    """db.employees must not validate as 'employees' (multipart bypass)."""
    with pytest.raises(SqlValidationError, match="multipart"):
        validate_select(spark, "SELECT * FROM db.employees", ALLOWED)


def test_global_temp_qualified_rejected(spark):
    with pytest.raises(SqlValidationError, match="multipart"):
        validate_select(
            spark, "SELECT * FROM global_temp.employees", ALLOWED
        )


def test_file_source_relation_rejected(spark):
    """parquet.`/path` relations read arbitrary files (runSQLOnFiles);
    they must not be admitted by last-segment matching."""
    with pytest.raises(SqlValidationError):
        validate_select(
            spark, "SELECT * FROM parquet.`/tmp/x,employees`", ALLOWED
        )


def test_fully_qualified_allowlist_entry_passes(spark):
    v = validate_select(
        spark,
        "SELECT * FROM warehouse.employees",
        {"warehouse.employees"},
    )
    assert v.tables == {"warehouse.employees"}


def test_backquoted_non_identifier_rejected(spark):
    with pytest.raises(SqlValidationError):
        validate_select(spark, "SELECT * FROM `emp loyees`", ALLOWED)

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the package; this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators import (
    registry as _registry,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue by region x market
    segment over the five-way star join (broadcast dims, exact decimal
    revenue reduction). Driver checks rows>0."""
    q = _registry.queries()["join_star_flagship"]
    return q(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2 (plus the
    LLM-data-pipeline expansion). Each callable takes (spark, sf_dir) and
    returns a DataFrame with oracle-matching column names."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL per query, runnable by DuckDB on the same parquet
    views. Non-SQL-expressible ops are omitted (driver records rows-only)."""
    return _registry.oracle_sql()

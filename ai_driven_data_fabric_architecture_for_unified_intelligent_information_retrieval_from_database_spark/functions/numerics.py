"""Numeric column helpers with *engine-stable* semantics.

Why these exist: the correctness gate hash-compares Spark results against a
DuckDB oracle. A plain ``SUM(double)`` is order-dependent — Spark's partial
aggregation over 32 partitions and DuckDB's sequential scan associate the
additions differently, and on ~1e9-magnitude sums the two engines can differ
by more than 1e-2, which no display rounding can hide.

The fix is to make the reduction exact: cast each term to ``DECIMAL(18,6)``,
sum in decimal (exact, associative, order-independent), then cast the exact
result back to double (correctly rounded, hence identical). This costs one
widening per row and keeps the aggregation in JVM codegen — it is also
exactly what a money-summing pipeline should do at 100 TB, where
nondeterministic totals across retries are a real operational problem.

Why scale 6: the measures in this domain carry at most 2 decimal digits, and
their 2- and 3-way products at most 6 — so at scale 6 the cast merely
*denotes* the value the double already represents (both engines recover the
same shortest-repr digits) and no rounding decision is ever made. At a
narrower scale the cast must round, and the engines legitimately disagree on
ties (Spark rounds the decimal repr HALF_UP; DuckDB rounds the scaled
double HALF_EVEN) — e.g. 94192.85625 -> .8563 vs .8562 at scale 4.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale/precision for the exact-sum trick: 12 integer digits / 6 fractional.
# Spark widens the sum accumulator to decimal(28,6) automatically, so the
# running total overflows only past 1e22.
_SUM_DECIMAL = "decimal(18,6)"


def stable_sum(col: Column | str, decimal_type: str = _SUM_DECIMAL) -> Column:
    """Order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(decimal_type)).cast("double")


def stable_avg(col: Column | str, decimal_type: str = _SUM_DECIMAL) -> Column:
    """Order-independent mean: exact decimal sum divided by count, in double.

    Both operands are bitwise-identical across engines, so the single double
    division is too.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(decimal_type)).cast("double") / F.count(c)


def sql_stable_sum(expr: str, decimal_type: str = _SUM_DECIMAL) -> str:
    """SQL-text twin of :func:`stable_sum` for oracle queries."""
    return f"CAST(SUM(CAST(({expr}) AS {decimal_type.upper()})) AS DOUBLE)"


def sql_stable_avg(expr: str, decimal_type: str = _SUM_DECIMAL) -> str:
    """SQL-text twin of :func:`stable_avg` for oracle queries."""
    return (
        f"CAST(SUM(CAST(({expr}) AS {decimal_type.upper()})) AS DOUBLE)"
        f" / COUNT(({expr}))"
    )

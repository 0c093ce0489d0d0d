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
    """Registered queries, oracle-backed entries first.

    Harnesses that sample a prefix of this dict get the hash-checkable
    entries before the rows-only ones (LSH recall ops have no SQL oracle by
    nature); within each group the deliberate module registration order of
    :func:`_ensure_loaded` is preserved.
    """
    _ensure_loaded()
    ordered = sorted(
        enumerate(REGISTRY.values()), key=lambda p: (p[1].oracle is None, p[0])
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
    from . import temporal  # noqa: F401
    from . import text_analysis  # noqa: F401
    from . import scale  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import nl  # noqa: F401
    from . import relational  # noqa: F401
    from . import streaming_entries  # noqa: F401

"""The engine lifecycle: ``process(query)`` — cache probe, NL->SQL planning,
validation, Spark execution, serialization, logging — reproducing the
reference's end-to-end path (``core/views.py:14-63`` +
``core/ai_query_generator.py:379-445``) with Spark as the executor.

Response shape matches ``core/ai_query_generator.py:410-417`` +
``core/views.py:48``: ``{success, original_query, sql_query, data, columns,
row_count, cached}`` (plus ``error`` on failure).

Deviations (SURVEY.md 7.2): schema introspection is cached catalog metadata
instead of per-request ``information_schema`` queries; BOTH planner paths are
validated (the reference trusts its fallback unvalidated, ``:391-407``);
validation is plan-based, not substring-based.
"""

from __future__ import annotations

import hashlib
import time
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .functions.serialization import serialize_rows
from .plans.planner import Planner
from .plans.validator import SqlValidationError, validate_select
from .sources.catalog import inspect_table

#: Reference cache policy (datafabric/settings.py:93-103, core/views.py:26-42).
CACHE_TTL_SECONDS = 300
CACHE_MAX_ENTRIES = 1000

#: Hard cap on rows materialized at the driver per query. The deterministic
#: cascade always emits a LIMIT, but the LLM path executes *validated
#: arbitrary SELECTs* and the validator (correctly) does not require one —
#: without a cap, a validated ``SELECT * FROM lineitem`` is an unbounded
#: driver collect. Engine-side twin of the reference's prompt rule 9
#: ("limit results to reasonable numbers",
#: core/ai_query_generator.py:110).
MAX_RESULT_ROWS = 10_000


@dataclass
class QueryLogEntry:
    """Schema mirror of the reference's query_logs sink (core/models.py:58-72)."""

    original_query: str
    generated_sql: str
    success: bool
    error_message: str | None
    execution_time: float
    result_count: int
    cached: bool
    timestamp: float = field(default_factory=time.time)


class TTLCache:
    """md5-keyed, TTL'd, success-only result cache with LRU-ish culling —
    the LocMemCache semantics the reference configures (MAX_ENTRIES=1000)."""

    def __init__(self, ttl: float = CACHE_TTL_SECONDS, max_entries: int = CACHE_MAX_ENTRIES):
        self.ttl = ttl
        self.max_entries = max_entries
        self._store: OrderedDict[str, tuple[float, Any]] = OrderedDict()

    @staticmethod
    def key_for(query: str) -> str:
        return "ai_query_" + hashlib.md5(query.encode()).hexdigest()

    def get(self, key: str, now: float | None = None) -> Any | None:
        now = time.time() if now is None else now
        hit = self._store.get(key)
        if hit is None:
            return None
        expires, value = hit
        if now >= expires:
            del self._store[key]
            return None
        self._store.move_to_end(key)
        return value

    def set(self, key: str, value: Any, now: float | None = None) -> None:
        now = time.time() if now is None else now
        if len(self._store) >= self.max_entries:
            # Cull a third, oldest-first (CULL_FREQUENCY=3 semantics).
            for _ in range(max(1, self.max_entries // 3)):
                if not self._store:
                    break
                self._store.popitem(last=False)
        self._store[key] = (now + self.ttl, value)


class DataFabricEngine:
    """Library-first engine facade over a SparkSession.

    ``tables``: allowlist of queryable temp views (the validator enforces
    it, generalizing the reference's single-table rule to multi-table).
    """

    def __init__(
        self,
        spark: SparkSession,
        tables: set[str] | None = None,
        default_table: str = "employees",
        llm_provider=None,
        log_sink_path: str | None = None,
        use_star_rules: bool = True,
        max_result_rows: int = MAX_RESULT_ROWS,
    ):
        self.spark = spark
        self.tables = set(tables) if tables else {default_table}
        self.default_table = default_table
        if llm_provider is None:
            # Reference posture (core/ai_query_generator.py:128-131): the
            # LLM path turns on iff an API key is configured; otherwise the
            # deterministic cascade handles everything.
            from .plans.llm_provider import from_env

            llm_provider = from_env(table=default_table)
        elif llm_provider is False:
            # Explicit off: never read the environment, never make network
            # calls — distinct from None="from env", so offline/test runs
            # can't be flipped live by a leaked OPENROUTER_API_KEY.
            llm_provider = None
        self.planner = Planner(table=default_table, llm_provider=llm_provider,
                               schema_text=self._schema_text(default_table))
        self.cache = TTLCache()
        self.query_log: list[QueryLogEntry] = []
        self.log_sink_path = log_sink_path
        #: north-star expansion: try the multi-table star-schema rule set
        #: before the single-table cascade (plans/star_planner.py). On by
        #: default — inert unless the star tables are in the allowlist, and
        #: employee questions always fall through to the reference cascade.
        self.use_star_rules = use_star_rules
        self.max_result_rows = max_result_rows

    # -- schema context (replaces per-request introspection, SURVEY 7.2) ----
    def _schema_text(self, table: str) -> str:
        try:
            df = self.spark.table(table)
        except Exception:
            return ""
        lines = [f"Database Schema for '{table}' table:"]
        for f_ in df.schema.fields:
            lines.append(f"- {f_.name} ({f_.dataType.simpleString().upper()})")
        return "\n".join(lines)

    # -- main lifecycle (core/views.py:14-63 + generator :379-445) ----------
    def process(self, user_query: str) -> dict[str, Any]:
        user_query = (user_query or "").strip()
        if not user_query:
            return {"success": False, "error": "Query cannot be empty"}

        cache_key = TTLCache.key_for(user_query)
        cached = self.cache.get(cache_key)
        if cached is not None:
            out = dict(cached)
            out["cached"] = True
            self._log(user_query, out.get("sql_query") or "", True, None, 0.0,
                      out.get("row_count", 0), cached=True)
            return out

        start = time.time()
        sql_query: str | None = None
        try:
            # Precedence mirrors the reference lifecycle (:379-393): the
            # configured LLM path first, then deterministic rules — star
            # rules (multi-table, allowlist-gated) ahead of the
            # single-table cascade, which always answers.
            planned = self.planner.plan_llm(user_query)
            if planned is None and self.use_star_rules:
                from .plans.star_planner import plan_star

                star = plan_star(user_query)
                if star is not None and not (set(star.tables) - self.tables):
                    planned = star
            if planned is None:
                planned = self.planner.plan_cascade(user_query)
            sql_query = planned.sql
            if getattr(planned, "operator", None):
                # Operator-routed star plan: the Spark-side answer is a
                # library operator (LSH near-dup, ANN — algorithms SQL
                # cannot express scalably); planned.sql holds the
                # question's reference SQL semantics, reported for
                # transparency (and run differentially as the oracle by
                # the driver gate). SQL validation does not apply — no
                # SQL executes; the operator reads only the plan's
                # allowlisted tables, which the gate above checked.
                from .operators.nl import run_nl_operator

                df = run_nl_operator(
                    self.spark,
                    {n: self.spark.table(n) for n in planned.tables},
                    planned.operator,
                    planned.operator_args,
                )
                exec_result = self._execute_df(df)
            else:
                validated = validate_select(self.spark, sql_query, self.tables)
                exec_result = self._execute(validated.sql)
            response: dict[str, Any] = {
                "success": exec_result["success"],
                "original_query": user_query,
                "sql_query": sql_query,
                "data": exec_result["data"],
                "columns": exec_result["columns"],
                "row_count": exec_result["row_count"],
                "truncated": exec_result.get("truncated", False),
            }
            if not exec_result["success"]:
                response["error"] = exec_result.get("error", "Unknown error")
            total = time.time() - start
            self._log(user_query, sql_query, exec_result["success"],
                      exec_result.get("error"), total, exec_result["row_count"])
            if response["success"]:
                self.cache.set(cache_key, response)
            response = dict(response)
            response["cached"] = False
            return response
        except SqlValidationError as exc:
            total = time.time() - start
            self._log(user_query, sql_query or "", False, str(exc), total, 0)
            return {
                "success": False,
                "error": f"Query processing failed: {exc}",
                "original_query": user_query,
                "sql_query": sql_query,
                "data": [],
                "columns": [],
                "row_count": 0,
                "cached": False,
            }
        except Exception as exc:  # mirrors the catch-all envelope :432-445
            total = time.time() - start
            self._log(user_query, sql_query or "", False, str(exc), total, 0)
            return {
                "success": False,
                "error": f"Query processing failed: {exc}",
                "original_query": user_query,
                "sql_query": sql_query,
                "data": [],
                "columns": [],
                "row_count": 0,
                "cached": False,
            }

    def _execute(self, sql: str) -> dict[str, Any]:
        """Execute validated SQL via Catalyst; serialize with the compat
        coercions. The collect is HARD-bounded at ``max_result_rows`` via
        ``limit(cap + 1)`` — the deterministic cascade emits its own
        LIMITs, but the LLM path runs validated arbitrary SELECTs, and an
        unbounded collect there OOMs the driver at scale. One sentinel row
        past the cap distinguishes "exactly cap rows" from truncation,
        reported via the ``truncated`` flag."""
        try:
            return self._execute_df(self.spark.sql(sql))
        except Exception as exc:
            return {
                "success": False,
                "error": str(exc),
                "data": [],
                "columns": [],
                "row_count": 0,
                "execution_time": 0,
            }

    def _execute_df(self, df) -> dict[str, Any]:
        """Collect + serialize a planned DataFrame under the result-row cap
        (shared by the SQL path and the operator-routed NL path)."""
        try:
            start = time.time()
            cap = self.max_result_rows
            columns = df.columns
            rows = [tuple(r) for r in df.limit(cap + 1).collect()]
            truncated = len(rows) > cap
            if truncated:
                rows = rows[:cap]
            data = serialize_rows(columns, rows)
            return {
                "success": True,
                "data": data,
                "columns": columns,
                "row_count": len(data),
                "truncated": truncated,
                "execution_time": time.time() - start,
            }
        except Exception as exc:
            return {
                "success": False,
                "error": str(exc),
                "data": [],
                "columns": [],
                "row_count": 0,
                "execution_time": 0,
            }

    # -- logging sink (core/ai_query_generator.py:364-377) ------------------
    def _log(self, q, sql, success, err, secs, n, cached=False) -> None:
        entry = QueryLogEntry(
            original_query=q, generated_sql=sql or "", success=success,
            error_message=err, execution_time=secs, result_count=n, cached=cached,
        )
        self.query_log.append(entry)
        if self.log_sink_path:
            try:
                row = [(entry.original_query, entry.generated_sql, entry.success,
                        entry.error_message, entry.execution_time,
                        entry.result_count, entry.cached)]
                (self.spark.createDataFrame(
                    row,
                    "original_query string, generated_sql string, success boolean, "
                    "error_message string, execution_time double, result_count int, "
                    "cached boolean",
                ).withColumn("timestamp", F.current_timestamp())
                 .write.mode("append").parquet(self.log_sink_path))
            except Exception:
                pass  # log failures are swallowed, like the reference :376-377

    # -- metadata endpoints (core/views.py:65-121) ---------------------------
    def examples(self) -> dict[str, Any]:
        return {"success": True, "examples": EXAMPLE_QUERIES}

    def health(self) -> dict[str, Any]:
        return {
            "status": "healthy",
            "service": "DataFabric Spark Query Engine",
            "version": "1.0.0",
        }

    def info(self) -> dict[str, Any]:
        return {
            "name": "DataFabric Spark Query Engine",
            "version": "1.0.0",
            "description": (
                "Convert natural language queries to Spark SQL and execute "
                "them on the session catalog"
            ),
            "supported_queries": [
                "Employee listings and filtering",
                "Department-based queries",
                "Salary-based filtering",
                "Date-based filtering (joining dates)",
                "Aggregation queries (count, average)",
                "Sorting and limiting results",
            ],
        }

    def inspect(self, table: str, sample_size: int = 5) -> dict[str, Any]:
        return inspect_table(self.spark, table, sample_size)

    def explain(self, user_query: str) -> dict[str, Any]:
        """Planning transparency: the SQL the NL path would run, which rule
        produced it, and Spark's physical plan — without executing. The
        introspection counterpart of :meth:`process` (the reference exposes
        only the final SQL in its response; at 100 TB you want to read the
        plan before paying for the query)."""
        user_query = (user_query or "").strip()
        if not user_query:
            return {"success": False, "error": "Query cannot be empty"}
        try:
            planned = self.planner.plan_llm(user_query)
            if planned is None and self.use_star_rules:
                from .plans.star_planner import plan_star

                star = plan_star(user_query)
                if star is not None and not (set(star.tables) - self.tables):
                    planned = star
            if planned is None:
                planned = self.planner.plan_cascade(user_query)
            if getattr(planned, "operator", None):
                from .operators.nl import run_nl_operator

                df = run_nl_operator(
                    self.spark,
                    {n: self.spark.table(n) for n in planned.tables},
                    planned.operator,
                    planned.operator_args,
                )
            else:
                validated = validate_select(self.spark, planned.sql, self.tables)
                df = self.spark.sql(validated.sql)
            physical = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            return {
                "success": True,
                "original_query": user_query,
                "sql_query": planned.sql,
                "branch": getattr(planned, "branch", None),
                "physical_plan": physical,
            }
        except Exception as exc:
            return {"success": False, "error": str(exc)}


#: The reference's canonical 15-question corpus (core/views.py:68-84) — the
#: de-facto acceptance set for the planner.
EXAMPLE_QUERIES = [
    "Show me all employees in the company",
    "Give me the list of all employees who joined last year",
    "How many employees work in the IT department?",
    "Show me employees with salary greater than 50000",
    "List all employees who joined this year",
    "Find employees in the Sales department",
    "Show me the highest paid employees",
    "Count of employees in each department",
    "Employees who joined in 2023",
    "Show me all employees with their salaries sorted by name",
    "Find all software engineers",
    "Show me employees earning between 40000 and 80000",
    "List employees who have been with company for more than 5 years",
    "Show me the average salary by department",
    "Find employees with Gmail addresses",
]

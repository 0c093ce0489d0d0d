"""N4 provider adapter tests: the OpenAI-compatible client's model
fallback / error handling, and the full LLM -> fence-strip -> validate ->
execute path through engine.process with a fake transport (no network)."""

from __future__ import annotations

import json

import pytest

from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.engine import (
    DataFabricEngine,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.plans import (
    llm_provider as lp,
)
from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
    register_employees,
)


def _ok_body(content: str) -> str:
    return json.dumps({"choices": [{"message": {"content": content}}]})


def _provider(transport) -> lp.OpenAICompatibleProvider:
    return lp.OpenAICompatibleProvider(api_key="test-key", transport=transport)


def test_returns_fence_stripped_sql():
    calls = []

    def transport(url, headers, payload, timeout):
        calls.append((url, payload["model"], timeout))
        return 200, _ok_body("```sql\nSELECT name FROM employees LIMIT 5;\n```")

    sql = _provider(transport)("show names", "schema: employees(name)")
    assert sql == "SELECT name FROM employees LIMIT 5;"
    assert len(calls) == 1
    assert calls[0][0].endswith("/chat/completions")
    assert calls[0][2] == 30.0  # reference timeout (:158)


def test_model_fallback_on_http_error_then_success():
    seen = []

    def transport(url, headers, payload, timeout):
        seen.append(payload["model"])
        if len(seen) < 3:
            return 429, "rate limited"
        return 200, _ok_body("SELECT 1 AS one FROM employees")

    sql = _provider(transport)("q", "s")
    assert sql == "SELECT 1 AS one FROM employees"
    assert len(seen) == 3  # tried all three models in order (:140-145)
    assert seen == list(lp._DEFAULT_MODELS)


def test_transport_exception_falls_through_to_next_model():
    seen = []

    def transport(url, headers, payload, timeout):
        seen.append(payload["model"])
        if len(seen) == 1:
            raise TimeoutError("boom")
        return 200, _ok_body("SELECT name FROM employees")

    assert _provider(transport)("q", "s") == "SELECT name FROM employees"
    assert len(seen) == 2


def test_all_models_fail_returns_none():
    assert _provider(lambda *a: (500, "err"))("q", "s") is None


def test_empty_content_returns_none():
    assert _provider(lambda *a: (200, _ok_body("   ")))("q", "s") is None


def test_from_env_off_without_key(monkeypatch):
    monkeypatch.delenv("OPENROUTER_API_KEY", raising=False)
    assert lp.from_env() is None


def test_from_env_reads_key_and_base_url(monkeypatch):
    monkeypatch.setenv("OPENROUTER_API_KEY", "k123")
    monkeypatch.setenv("LLM_BASE_URL", "http://localhost:8000/v1")
    p = lp.from_env()
    assert p is not None and p.api_key == "k123"
    assert p.base_url == "http://localhost:8000/v1"


def test_system_prompt_carries_schema():
    prompt = lp.build_system_prompt("TABLE employees (name STRING)", "employees")
    assert "TABLE employees (name STRING)" in prompt
    assert "ONLY SELECT" in prompt


# -- end-to-end through the engine (N4 -> N5 -> N6) -------------------------


@pytest.fixture(scope="module")
def employees(spark):
    register_employees(spark, n=200)


def test_engine_executes_llm_generated_sql(spark, employees):
    def transport(url, headers, payload, timeout):
        return 200, _ok_body(
            "```sql\nSELECT COUNT(*) AS n_it FROM employees "
            "WHERE department = 'IT'\n```"
        )

    eng = DataFabricEngine(spark, tables={"employees"}, llm_provider=_provider(transport))
    r = eng.process("zzz gibberish the cascade cannot parse 77f")
    assert r["success"] and len(r["data"]) == 1
    assert int(r["data"][0]["n_it"]) > 0


def test_engine_blocks_llm_ddl_and_falls_back(spark, employees):
    """A provider emitting DDL must be stopped by plan validation; the
    engine still answers via the deterministic cascade (reference fallback
    posture :379-393)."""
    eng = DataFabricEngine(
        spark,
        tables={"employees"},
        llm_provider=_provider(lambda *a: (200, _ok_body("DROP TABLE employees"))),
    )
    r = eng.process("show all employees")
    # the engine may either fall back to the cascade or fail closed - it
    # must never execute the DDL; schema intact either way
    assert spark.table("employees").count() == 200


def test_engine_blocks_llm_allowlist_escape(spark, employees):
    eng = DataFabricEngine(
        spark,
        tables={"employees"},
        llm_provider=_provider(
            lambda *a: (200, _ok_body("SELECT * FROM (SELECT 1 AS x FROM secret) secret"))
        ),
    )
    r = eng.process("zzz gibberish unmatchable 77g")
    assert not r["success"] or "secret" not in json.dumps(r.get("data", [])).lower()

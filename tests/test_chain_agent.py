"""NL->SQL chain + agent loop with a stubbed provider (the LLM stays
out of the test loop — SURVEY.md §5)."""

from __future__ import annotations

import asyncio

import pytest

from data_platform_copilot_spark.chain import (
    StubProvider,
    agent_answer,
    make_plan,
    nl_to_sql,
    similar_fields,
)
from data_platform_copilot_spark.chain.dbt import (
    ensure_model_name,
    extract_blocks,
    generate_dbt_model,
    sanitize_model_name,
    write_files_atomic,
)
from data_platform_copilot_spark.metrics import LocalRegistry

DOCS = """| n_name | string |
| o_totalprice | double |
| c_acctbal | double |
"""


def run(coro):
    return asyncio.get_event_loop().run_until_complete(coro)


class TestRetrievalAndPlan:
    def test_similar_fields_overlap_and_ties(self):
        docs = "alpha beta\nbeta gamma\nalpha beta gamma\nzeta"
        got = similar_fields("alpha beta gamma", docs, topk=2)
        assert got[0] == "alpha beta gamma"
        assert got[1] in ("alpha beta", "beta gamma")

    def test_similar_fields_distributed_matches(self, spark):
        docs = "alpha beta\nbeta gamma\nalpha beta gamma\nzeta"
        from data_platform_copilot_spark.chain.plan import (
            similar_fields_distributed,
        )
        local = similar_fields("alpha beta gamma", docs, topk=3)
        dist = similar_fields_distributed(spark, "alpha beta gamma", docs,
                                          topk=3)
        assert set(local) == set(dist)

    def test_make_plan_time_heuristic(self):
        plan = make_plan("sum o_totalprice by n_name for 1997", DOCS)
        assert "time filter" in plan.lower()
        assert "n_name" in plan

    def test_make_plan_no_fields_no_time(self):
        plan = make_plan("list everything", "")
        assert "time filter" not in plan.lower()


class TestChain:
    def test_nl_to_sql_uses_schema_docs(self):
        stub = StubProvider()
        run(nl_to_sql(stub, "any question", DOCS))
        system, user = stub.calls[0]
        assert "n_name" in system and "Spark SQL" in system
        assert user.startswith("Q: any question")


class TestAgent:
    def test_happy_path(self, spark, sf_dir):
        from data_platform_copilot_spark.sources import register_testdata
        register_testdata(spark, sf_dir, ("region",))
        stub = StubProvider(
            fallback="```sql\nSELECT r_name FROM region\n```")
        res = run(agent_answer(spark, stub, "list regions", DOCS))
        assert res.chosen_sql == "SELECT r_name FROM region"
        assert len(res.rows) == 5
        assert res.telemetry["retries"] == 0

    def test_unsafe_then_refined(self, spark, sf_dir):
        from data_platform_copilot_spark.sources import register_testdata
        register_testdata(spark, sf_dir, ("region",))
        stub = StubProvider(
            canned={"unsafe SQL": "```sql\nSELECT r_name FROM region\n```"},
            fallback="```sql\nDROP TABLE region\n```")
        res = run(agent_answer(spark, stub, "drop it", DOCS))
        assert res.chosen_sql == "SELECT r_name FROM region"
        assert res.telemetry["retries"] >= 1

    def test_empty_result_refines_broader(self, spark, sf_dir):
        from data_platform_copilot_spark.sources import register_testdata
        register_testdata(spark, sf_dir, ("region",))
        stub = StubProvider(
            canned={"broader filters":
                    "```sql\nSELECT r_name FROM region\n```"},
            fallback="```sql\nSELECT r_name FROM region WHERE r_name = 'NOPE'\n```")
        res = run(agent_answer(spark, stub, "find nothing", DOCS))
        assert res.chosen_sql == "SELECT r_name FROM region"
        assert len(res.rows) == 5


class TestDbt:
    def test_generate_and_write(self, tmp_path):
        md = ("```sql\nSELECT 1 AS one\n```\n"
              "```yaml\nversion: 2\nmodels:\n  - name: placeholder\n"
              "    columns:\n      - name: one\n        tests:\n"
              "          - not_null\n          - unique\n```")
        stub = StubProvider(fallback=md)
        name, sql, yml = run(generate_dbt_model(
            stub, "how many?", "My Model 1"))
        assert name == "my_model_1"
        assert sql == "SELECT 1 AS one"
        assert "- name: my_model_1" in yml

        out = write_files_atomic(
            tmp_path, {f"models/{name}.sql": sql,
                       f"models/{name}.yml": yml})
        assert (tmp_path / f"models/{name}.sql").read_text() == sql
        assert len(out) == 2

    def test_sanitize(self):
        assert sanitize_model_name("9 Lives!") == "m_9_lives"
        assert sanitize_model_name("") == "model"

    def test_extract_blocks_requires_both(self):
        with pytest.raises(ValueError):
            extract_blocks("```sql\nSELECT 1\n```")

    def test_ensure_model_name_injects(self):
        yml = "version: 2\nmodels:\n  - name: wrong\n"
        assert "- name: right" in ensure_model_name(yml, "right")


class TestMetrics:
    def test_counters_and_p95(self):
        reg = LocalRegistry()
        reg.inc("req", labels={"route": "chat"})
        reg.inc("req", labels={"route": "chat"})
        for v in [10.0, 20.0, 30.0, 40.0, 100.0]:
            reg.observe_ms("lat_ms", v)
        out = reg.export()
        assert 'req{route="chat"} 2.0' in out
        assert "lat_ms_sum 200.0" in out
        assert "lat_ms_count 5" in out
        assert "lat_ms_p95 40.0" in out  # sorted[int(0.95*5)-1] = idx 3

    def test_histogram_memory_is_bounded(self):
        """_sum/_count stay exact running totals while the per-series
        sample buffer is a fixed window (a long-running server's
        request-latency histogram must not grow with total request
        count); p95 comes from the most recent window."""
        from data_platform_copilot_spark.metrics import (
            _HIST_WINDOW, LocalRegistry)

        reg = LocalRegistry()
        n = _HIST_WINDOW + 500
        for i in range(n):
            reg.observe_ms("lat_ms", float(i))
        out = reg.export()
        assert f"lat_ms_count {n}" in out            # exact, not windowed
        assert f"lat_ms_sum {float(sum(range(n)))}" in out
        assert len(reg._hists["lat_ms"]) == _HIST_WINDOW  # bounded
        # p95 over the window (last _HIST_WINDOW values: 500..n-1)
        window = list(range(500, n))
        p95 = float(sorted(window)[int(0.95 * len(window)) - 1])
        assert f"lat_ms_p95 {p95}" in out

    def test_external_exporter_merge(self):
        """A32 parity (reference src/metrics.py:54-68): a registered
        external exporter's payload leads the export, local series
        follow; empty or raising exporters degrade to local-only."""
        reg = LocalRegistry()
        reg.inc("local_req")
        reg.set_external_exporter(
            lambda: "http_requests_total{handler=\"/x\"} 3.0\n")
        out = reg.export()
        assert out.startswith('http_requests_total{handler="/x"} 3.0\n')
        assert "local_req 1.0" in out
        assert out.index("http_requests_total") < out.index("local_req")
        reg.set_external_exporter(lambda: "   ")
        assert reg.export() == "local_req 1.0\n"
        def _boom():
            raise RuntimeError("exporter down")
        reg.set_external_exporter(_boom)
        assert reg.export() == "local_req 1.0\n"


class TestProviderFactory:
    def test_stub_dispatch(self):
        from data_platform_copilot_spark.chain import make_provider
        from data_platform_copilot_spark.config import LLMConfig
        assert type(make_provider(LLMConfig(provider="stub"))).__name__ == \
            "StubProvider"

    def test_http_dispatch_gated_on_httpx(self):
        # The three HTTP providers share one wire class; base URL / key
        # come from the config. httpx isn't in this container, so
        # instantiation must fail fast (import-gated), never at request
        # time.
        import pytest
        from data_platform_copilot_spark.chain import make_provider
        from data_platform_copilot_spark.config import LLMConfig
        try:
            import httpx  # noqa: F401
        except ImportError:
            for prov in ("openai", "openrouter", "ollama"):
                with pytest.raises(ImportError):
                    make_provider(LLMConfig(provider=prov, openai_api_key="k",
                                            openrouter_api_key="k"))
        else:
            p = make_provider(LLMConfig(provider="ollama"))
            assert p.base_url.endswith("/v1")

    def test_per_provider_timeouts(self, monkeypatch):
        # reference gives each transport its own budget: 30 s openai,
        # 45 s openrouter, 60 s local ollama (src/provider.py:36,65,86).
        # httpx may be absent in this container, so satisfy the
        # construction-time import gate with a placeholder module —
        # the assertion is about the dispatch wiring, not the wire.
        import sys
        import types

        from data_platform_copilot_spark.chain import make_provider
        from data_platform_copilot_spark.config import LLMConfig
        monkeypatch.setitem(sys.modules, "httpx",
                            sys.modules.get("httpx",
                                            types.ModuleType("httpx")))
        want = {"openai": 30.0, "openrouter": 45.0, "ollama": 60.0}
        for prov, t in want.items():
            p = make_provider(LLMConfig(provider=prov, openai_api_key="k",
                                        openrouter_api_key="k"))
            assert p.timeout_s == t, prov

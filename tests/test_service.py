"""Service layer end-to-end — the reference's query.http manual corpus
re-expressed as automated scenarios (SURVEY.md §5)."""

from __future__ import annotations

import asyncio

import pytest

from data_platform_copilot_spark.chain import StubProvider
from data_platform_copilot_spark.service import CopilotService


def run(coro):
    return asyncio.get_event_loop().run_until_complete(coro)


@pytest.fixture()
def service(spark, sf_dir, tmp_path):
    from data_platform_copilot_spark.sources import register_testdata
    register_testdata(spark, sf_dir)
    stub = StubProvider(
        canned={
            "revenue": ("```sql\nSELECT n_name AS nation, "
                        "round(sum(o_totalprice), 2) AS revenue\n"
                        "FROM orders JOIN customer ON o_custkey = c_custkey\n"
                        "JOIN nation ON c_nationkey = n_nationkey\n"
                        "GROUP BY 1 ORDER BY revenue DESC LIMIT 5\n```"),
            "drop": "```sql\nSELECT * FROM customers; DROP TABLE customers\n```",
        },
        fallback="```sql\nSELECT r_name FROM region\n```")
    svc = CopilotService(spark, stub, str(tmp_path / "control"))
    svc.bootstrap()
    return svc


class TestMiscSurface:
    def test_health_description_metrics(self, service):
        assert service.health()["status"] == "ok"
        assert "copilot" in service.description()["description"]
        assert isinstance(service.metrics(), str)

    def test_schema_docs_cached_and_refreshable(self, service):
        a = service.schema()["markdown"]
        assert "## lineitem" in a
        assert service.schema_docs() is a  # cached object
        assert service.schema_docs(refresh=True) is not a


class TestChat:
    def test_happy_path(self, service):
        out = run(service.chat("total revenue by nation"))
        assert out["rows"] and out["rows"][0]["nation"].startswith("NATION_")
        assert "Scan parquet" in out["plan"] or "BroadcastHashJoin" in out["plan"]

    def test_injection_rejected_http400(self, service):
        # reference query.http:57-63 adversarial case
        out = run(service.chat("please drop the customers table"))
        assert out.get("status") == 400
        assert "Forbidden" in out["error"] or "SELECT" in out["error"]

    def test_agent_loop(self, service):
        out = run(service.chat_agent("list regions"))
        assert out["chosen_sql"] == "SELECT r_name FROM region"
        assert len(out["rows"]) == 5
        assert out["telemetry"]["retries"] == 0


class TestDq:
    def test_profile(self, service):
        out = service.dq_profile("events", where="value > 0", limit=500)
        assert out["profile"]["value"]["count"] == 500
        assert len(out["rows"]) == 20

    def test_check_all_rule_types(self, service):
        out = service.dq_check("events", rules=[
            {"type": "not_null", "column": "user_id"},
            {"type": "unique", "column": "event_id"},
            {"type": "range", "column": "value", "min": 0, "max": 1e9},
            {"type": "anomaly_zscore", "column": "value", "sigma": 8.0},
        ])
        assert out["passed"] is True
        assert "4/4 rules passed" in out["markdown_report"]
        assert len(out["sample_rows"]) == 50


class TestDbt:
    def test_generate_preview_write(self, service, tmp_path):
        md = ("```sql\nSELECT r_regionkey AS id, r_name AS region FROM region\n```\n"
              "```yaml\nversion: 2\nmodels:\n  - name: x\n    columns:\n"
              "      - name: id\n        tests: [not_null, unique]\n```")
        service.provider.canned["region model"] = md
        gen = run(service.dbt_generate("region model", "Region Dim"))
        assert gen["model_name"] == "region_dim"
        assert "- name: region_dim" in gen["schema_yml"]

        prev = service.dbt_preview(gen["sql"], limit_override=3)
        assert len(prev["rows"]) == 3

        out = service.dbt_write(tmp_path, gen["model_name"], gen["sql"],
                                gen["schema_yml"])
        assert (tmp_path / "models/region_dim.sql").exists()
        assert len(out) == 2

    def test_preview_rejects_ddl(self, service):
        out = service.dbt_preview("DROP TABLE region")
        assert out["status"] == 400


class TestCatalogRoutes:
    def test_namespace_table_flow(self, service, spark, tmp_path):
        ns = service.namespace_create("Svc NS")
        assert any(r["id"] == ns["id"] for r in service.namespace_list())
        reg = service.table_register(ns["id"], "People")
        csv = tmp_path / "p.csv"
        csv.write_text("a,b\n1,x\n2,y\n")
        loaded = service.table_upload(reg["id"], str(csv))
        assert loaded["is_loaded"] in (True, 1)
        assert spark.table("svc_ns.people").count() == 2
        service.namespace_delete(ns["id"])
        assert not any(r["id"] == ns["id"] for r in service.namespace_list())


class TestDemoSeed:
    def test_seed_events_and_profile(self, service):
        """Reference query.http:164-169: seed 150k events, then
        DQ-profile the seeded table."""
        out = service.demo_seed_events(rows=150_000)
        assert out == {"table": "events", "rows": 150_000, "seeded": True}
        prof = service.dq_profile("events")["profile"]
        assert prof["event_id"]["nulls"] == 0
        assert set(prof) == {"event_id", "user_id", "event_type", "amount",
                             "event_ts", "country", "device", "source"}
        types = {t["value"] for t in prof["event_type"]["top_values"]}
        assert types <= {"view", "click", "purchase", "signup", "refund"}
        # deterministic: reseeding yields the identical table
        service.demo_seed_events(rows=1000)
        a = service.spark.table("events").orderBy("event_id").collect()
        service.demo_seed_events(rows=1000)
        b = service.spark.table("events").orderBy("event_id").collect()
        assert a == b

    def test_seed_rejects_nonpositive(self, service):
        with pytest.raises(ValueError):
            service.demo_seed_events(rows=0)

    def test_seed_invalidates_schema_docs(self, service):
        docs_before = service.schema_docs()
        service.demo_seed_events(rows=100)
        assert service._schema_docs_cache is None
        assert docs_before  # cache had been populated before the seed


class TestViewRoutes:
    def test_bootstrap_creates_demo_view(self, service):
        names = [v["name"] for v in service.view_list()]
        assert "v_revenue_by_country" in names
        assert service.spark.table("v_revenue_by_country").count() == 25

    def test_create_and_delete_roundtrip(self, service):
        out = service.view_create("v_region_names",
                                  "SELECT r_name FROM region")
        assert out["name"] == "v_region_names"
        assert "## v_region_names" in service.schema_docs()
        got = service.view_delete("v_region_names")
        assert got["dropped"]
        assert "## v_region_names" not in service.schema_docs(refresh=True)

    def test_http_surface_has_view_routes(self, service):
        import importlib.util
        if importlib.util.find_spec("fastapi") is None:
            import pytest as _pytest
            _pytest.skip("fastapi not installed")
        from data_platform_copilot_spark.service import create_fastapi_app
        app = create_fastapi_app(service)
        paths = {r.path for r in app.routes}
        assert {"/views", "/views/{name}"} <= paths

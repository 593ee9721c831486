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


class _FakeHttp:
    """Scripted (method, url-fragment) -> (status, body) transport
    (same shape as tests/test_multimodal_integrations.py)."""

    def __init__(self, script):
        self.script = script
        self.calls = []

    async def __call__(self, method, url, json=None, headers=None):
        self.calls.append((method, url, json))
        for (m, frag), resp in self.script:
            if m == method and frag in url:
                return resp
        return 404, {}


class TestDbtPrRoute:
    """reference src/route/chat.py:254-275 + query.http:103-110."""

    def _github(self, script):
        from data_platform_copilot_spark.integrations import GitHubClient
        fake = _FakeHttp(script)
        return GitHubClient(fake, "o/r", "tok"), fake

    def test_compose_branch_files_pr(self, service):
        gh, fake = self._github([
            (("GET", "/git/ref/heads/main"),
             (200, {"object": {"sha": "abc123"}})),
            (("POST", "/git/refs"), (201, {})),
            (("GET", "/contents/models/region_dim.sql"), (404, {})),
            (("PUT", "/contents/models/region_dim.sql"), (201, {})),
            (("GET", "/contents/models/region_dim.yml"), (404, {})),
            (("PUT", "/contents/models/region_dim.yml"), (201, {})),
            (("POST", "/pulls"),
             (201, {"number": 7, "html_url": "https://gh/pr/7"})),
        ])
        service.github = gh
        out = run(service.dbt_pr(
            "Add region_dim", "feat/region-dim",
            {"models/region_dim.sql": "SELECT 1",
             "models/region_dim.yml": "version: 2"}))
        assert out["pr_url"] == "https://gh/pr/7"
        assert set(out["files_committed"]) == {
            "models/region_dim.sql", "models/region_dim.yml"}
        # contents are base64-encoded for the GitHub contents API
        import base64
        put = next(c for c in fake.calls if c[0] == "PUT")
        assert base64.b64decode(put[2]["content"]) == b"SELECT 1"
        # PR opened against the requested base
        pr_call = next(c for c in fake.calls if "/pulls" in c[1])
        assert pr_call[2]["base"] == "main"

    def test_github_error_maps_to_400(self, service):
        gh, _ = self._github([
            (("GET", "/git/ref/heads/main"), (500, {})),
        ])
        service.github = gh
        out = run(service.dbt_pr("t", "b", {"f": "x"}))
        assert out["status"] == 400 and "ref lookup failed" in out["error"]

    def test_unconfigured_maps_to_400(self, service):
        assert run(service.dbt_pr("t", "b", {}))["status"] == 400


class TestOrchestrateRoutes:
    """reference src/route/chat.py:373-384 + query.http:171-181."""

    def test_run_and_status(self, service):
        from data_platform_copilot_spark.integrations import (
            OrchestratorClient)
        fake = _FakeHttp([
            (("POST", "/deployments/filter"),
             (200, {"deployments": [{"id": "dep-1"}]})),
            (("POST", "/deployments/dep-1/create_flow_run"),
             (201, {"id": "run-9"})),
            (("GET", "/flow_runs/run-9"),
             (200, {"state": {"type": "COMPLETED"}})),
        ])
        service.orchestrator = OrchestratorClient(fake, "http://pf/api")
        out = run(service.orchestrate_run("daily_sales", {"days_back": 1}))
        assert out == {"run_id": "run-9"}
        st = run(service.orchestrate_status("run-9"))
        assert st == {"run_id": "run-9", "state": "COMPLETED"}

    def test_unknown_flow_maps_to_400(self, service):
        from data_platform_copilot_spark.integrations import (
            OrchestratorClient)
        service.orchestrator = OrchestratorClient(
            _FakeHttp([(("POST", "/deployments/filter"),
                        (200, {"deployments": []}))]), "http://pf/api")
        out = run(service.orchestrate_run("nope"))
        assert out["status"] == 400

    def test_unconfigured_maps_to_400(self, service):
        assert run(service.orchestrate_run("f"))["status"] == 400
        assert run(service.orchestrate_status("r"))["status"] == 400


class TestTableRoutes:
    """reference src/route/namespace_table.py:55-144 — intended
    behavior for get/delete (the reference handlers return/delete the
    namespace; pinned bugs, SURVEY.md §7)."""

    def test_list_get_rename_delete(self, service, spark, tmp_path):
        ns = service.namespace_create("Tbl NS")
        assert service.table_list(ns["id"]) == {
            "message": "No tables created", "tables": []}
        reg = service.table_register(ns["id"], "People")
        listed = service.table_list(ns["id"])
        assert listed["message"] == "OK"
        assert [t["id"] for t in listed["tables"]] == [reg["id"]]

        got = service.table_get(reg["id"])
        assert got["table_name"] == "people" and not got["is_loaded"]

        renamed = service.table_rename(reg["id"], "Persons")
        assert renamed["name"] == "Persons"
        assert renamed["table_name"] == "people"  # physical name stable

        csv = tmp_path / "p.csv"
        csv.write_text("a,b\n1,x\n")
        service.table_upload(reg["id"], str(csv))
        assert spark.table("tbl_ns.people").count() == 1

        service.table_delete(reg["id"])
        assert service.table_list(ns["id"])["tables"] == []
        assert not spark.catalog.tableExists("tbl_ns.people")
        assert service._schema_docs_cache is None
        service.namespace_delete(ns["id"])  # drop the physical schema

    def test_get_missing_raises(self, service):
        from data_platform_copilot_spark.catalog.tables import TableError
        with pytest.raises(TableError):
            service.table_get(10_000)


class TestNamespaceRoutes:
    """reference src/route/namespace.py:57-74 + /demo-upload:99-140."""

    def test_get_and_rename(self, service):
        ns = service.namespace_create("Ren NS")
        assert service.namespace_get(ns["id"])["schema_name"] == "ren_ns"
        out = service.namespace_rename(ns["id"], "Renamed NS")
        assert out["name"] == "Renamed NS"
        assert out["schema_name"] == "ren_ns"  # physical name stable
        service.namespace_delete(ns["id"])

    def test_demo_upload(self, service, spark, tmp_path):
        (tmp_path / "cities.csv").write_text("name,pop\nOslo,700000\n")
        (tmp_path / "teams.csv").write_text("team\nA\nB\n")
        # the route takes NO client path: it ingests only the
        # server-configured directory (r8 advice — a caller-supplied
        # path would expose arbitrary host CSVs over HTTP)
        service.demo_data_dir = str(tmp_path)
        out = service.namespace_demo_upload()
        try:
            assert out["message"] == "OK" and out["files_processed"] == 2
            assert out["namespace"]["schema_name"] == "demo"
            assert {t["table_name"] for t in out["tables"]} == {
                "cities", "teams"}
            assert spark.table("demo.cities").count() == 1
            assert spark.table("demo.teams").count() == 2
            assert service._schema_docs_cache is None
        finally:
            # the warehouse outlives the tmp-scoped control tables:
            # drop the physical schema so reruns never hit
            # LOCATION_ALREADY_EXISTS on the managed-table path
            service.namespace_delete(out["namespace"]["id"])

    def test_demo_upload_missing_dir_404(self, service):
        service.demo_data_dir = "/nonexistent/dir"
        out = service.namespace_demo_upload()
        assert out["status"] == 404

    def test_demo_upload_ignores_client_paths(self, service):
        # the handler signature itself rejects a directory argument —
        # the fixed-server-path contract is structural, not validated
        with pytest.raises(TypeError):
            service.namespace_demo_upload("/etc")


def test_http_latency_middleware_times_every_route(service):
    """reference src/main.py:43-50 parity: each request lands in the
    http_request_ms histogram labeled by route template, exported
    via /metrics with _sum/_count/_p95."""
    import importlib.util
    if (importlib.util.find_spec("fastapi") is None
            or importlib.util.find_spec("httpx") is None):
        pytest.skip("fastapi/httpx not installed")
    from fastapi.testclient import TestClient

    from data_platform_copilot_spark.metrics import REGISTRY
    from data_platform_copilot_spark.service import create_fastapi_app

    REGISTRY.reset()
    client = TestClient(create_fastapi_app(service))
    assert client.get("/health").status_code == 200
    assert client.get("/description").status_code == 200
    assert client.get("/health").status_code == 200
    exported = client.get("/metrics").text
    h = 'http_request_ms{route="/health",status="200"}'
    d = 'http_request_ms{route="/description",status="200"}'
    assert f"{h}_count 2" in exported
    assert f"{h}_sum " in exported and f"{h}_p95 " in exported
    assert f"{d}_count 1" in exported


def test_http_surface_has_new_route_groups(service):
    import importlib.util
    if importlib.util.find_spec("fastapi") is None:
        pytest.skip("fastapi not installed")
    from data_platform_copilot_spark.service import create_fastapi_app
    app = create_fastapi_app(service)
    paths = {r.path for r in app.routes}
    assert {"/dbt/pr", "/orchestrate/run", "/orchestrate/status/{run_id}",
            "/namespace/{id_}", "/namespace/demo-upload",
            "/namespace/{namespace_id}/table",
            "/table/{table_id}"} <= paths

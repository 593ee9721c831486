"""Catalog/metadata layer (SURVEY.md §2 A14-A19)."""

from __future__ import annotations

import pytest

from data_platform_copilot_spark.catalog import (
    NamespaceManager,
    TableManager,
    build_markdown,
    normalize_schema_name,
)
from data_platform_copilot_spark.catalog.naming import normalize_question
from data_platform_copilot_spark.catalog.namespaces import NamespaceError
from data_platform_copilot_spark.catalog.tables import TableError


class TestNaming:
    @pytest.mark.parametrize("raw,expected", [
        ("My Sales Data!", "my_sales_data"),
        ("Продажи 2024", "prodazhi_2024"),
        ("42 things", "n42_things"),
        ("???", "schema_default"),
        ("", "schema_default"),
        ("Café-Orders", "cafe_orders"),
        ("a" * 100, "a" * 63),
        ("x__y___z", "x_y_z"),
    ])
    def test_normalize_schema_name(self, raw, expected):
        assert normalize_schema_name(raw) == expected

    def test_normalize_question(self):
        assert normalize_question("  продажи   за 2024 года ") == \
            "продажи за 2024 year"


@pytest.fixture()
def managers(spark, tmp_path):
    ns = NamespaceManager(spark, str(tmp_path / "control"))
    return ns, TableManager(spark, ns)


class TestNamespaces:
    def test_lifecycle(self, spark, managers):
        ns, _ = managers
        row = ns.create("Test NS Alpha")
        assert row["schema_name"] == "test_ns_alpha"
        assert any(d.name == "test_ns_alpha"
                   for d in spark.catalog.listDatabases())
        assert ns.get(row["id"])["name"] == "Test NS Alpha"

        renamed = ns.rename(row["id"], "Renamed")
        assert renamed["name"] == "Renamed"
        assert renamed["schema_name"] == "test_ns_alpha"  # physical stable

        ns.delete(row["id"])
        assert not any(d.name == "test_ns_alpha"
                       for d in spark.catalog.listDatabases())
        with pytest.raises(NamespaceError):
            ns.get(row["id"])

    def test_duplicate_rejected(self, managers):
        ns, _ = managers
        row = ns.create("Dup Target")
        try:
            with pytest.raises(NamespaceError):
                ns.create("dup target")  # same normalized name
        finally:
            ns.delete(row["id"])


class TestTables:
    def test_two_phase_csv_ingest(self, spark, managers, tmp_path):
        ns, tm = managers
        nsrow = ns.create("Ingest NS")
        csv = tmp_path / "people.csv"
        csv.write_text("id,name,score\n1,ann,9.5\n2,bo,7.25\n")
        try:
            meta = tm.register(nsrow["id"], "People")
            assert bool(meta["is_loaded"]) is False

            loaded = tm.upload_csv(meta["id"], csv)
            assert bool(loaded["is_loaded"]) is True
            df = spark.table("ingest_ns.people")
            assert df.count() == 2
            assert set(df.columns) == {"id", "name", "score"}

            # re-upload rejected (reference namespace_table.py:96-97)
            with pytest.raises(TableError):
                tm.upload_csv(meta["id"], csv)

            tm.delete(meta["id"])
            assert not spark.catalog.tableExists("ingest_ns.people")
        finally:
            ns.delete(nsrow["id"])

    @pytest.mark.parametrize("fname,content,msg", [
        ("bad.txt", "x", "only .csv"),
        ("empty.csv", "", "empty"),
    ])
    def test_upload_validation(self, managers, tmp_path, fname, content, msg):
        ns, tm = managers
        nsrow = ns.create("Val NS")
        p = tmp_path / fname
        p.write_text(content)
        try:
            meta = tm.register(nsrow["id"], "t1")
            with pytest.raises(TableError, match=msg):
                tm.upload_csv(meta["id"], p)
        finally:
            ns.delete(nsrow["id"])

    def test_demo_bulk_ingest(self, spark, managers, tmp_path):
        ns, tm = managers
        nsrow = ns.create("Bulk NS")
        (tmp_path / "a.csv").write_text("x\n1\n")
        (tmp_path / "b.csv").write_text("y\n2\n")
        try:
            rows = tm.demo_bulk_ingest(nsrow["id"], tmp_path)
            assert len(rows) == 2
            assert all(bool(r["is_loaded"]) for r in rows)
            assert spark.table("bulk_ns.a").count() == 1
        finally:
            ns.delete(nsrow["id"])


class TestSchemaDocs:
    def test_markdown_contains_tables_and_descriptions(self, spark, sf_dir):
        from data_platform_copilot_spark.sources import register_testdata
        register_testdata(spark, sf_dir)
        md = build_markdown(spark)
        assert "## events" in md and "## lineitem" in md
        assert "| event_type | string |" in md
        assert "view / click / purchase" in md  # events descriptions


class TestViews:
    def test_create_select_drop(self, spark, sf_dir):
        from data_platform_copilot_spark.catalog import ViewManager
        from data_platform_copilot_spark.sources import register_testdata
        register_testdata(spark, sf_dir, ("region",))
        vm = ViewManager(spark)
        out = vm.create("v_regions", "SELECT r_name FROM region")
        assert out["name"] == "v_regions"
        assert spark.table("v_regions").count() == 5
        assert [v["name"] for v in vm.list()] == ["v_regions"]
        assert vm.definition("v_regions") == "SELECT r_name FROM region"
        assert vm.drop("v_regions")
        assert vm.list() == []

    def test_rejects_non_select_and_bad_names(self, spark):
        import pytest as _pytest

        from data_platform_copilot_spark.catalog import ViewManager
        from data_platform_copilot_spark.gateway import IncorrectQuestionError
        vm = ViewManager(spark)
        with _pytest.raises(IncorrectQuestionError):
            vm.create("v_bad", "DROP TABLE region")
        with _pytest.raises(IncorrectQuestionError):
            vm.create("bad name!", "SELECT 1")
        with _pytest.raises(IncorrectQuestionError):
            vm.create("v_multi", "SELECT 1; SELECT 2")

    def test_demo_view_bootstrap_and_schema_docs(self, spark, sf_dir):
        from data_platform_copilot_spark.catalog import (
            ViewManager, build_markdown, create_demo_views)
        from data_platform_copilot_spark.sources import register_testdata
        register_testdata(spark, sf_dir)
        vm = ViewManager(spark)
        created = create_demo_views(vm)
        assert created == ["v_revenue_by_country"]
        df = spark.table("v_revenue_by_country")
        assert set(df.columns) == {"country", "revenue"}
        assert df.count() == 25
        md = build_markdown(spark)
        assert "## v_revenue_by_country" in md
        assert "| country | string |" in md

    def test_view_optimizes_through(self, spark, sf_dir):
        """Catalyst must inline the view: a filtered select over the
        view pushes the filter into the scan, not post-aggregation of
        everything (column pruning visible in ReadSchema)."""
        from data_platform_copilot_spark.catalog import (
            ViewManager, create_demo_views)
        from data_platform_copilot_spark.sources import register_testdata
        register_testdata(spark, sf_dir)
        create_demo_views(ViewManager(spark))
        plan = (spark.table("v_revenue_by_country")
                ._jdf.queryExecution().executedPlan().toString())
        assert "o_orderdate" not in plan  # unused column pruned away


def test_jsonl_two_phase_ingest(spark, tmp_path, managers):
    """register -> upload_jsonl materializes a queryable table with
    inferred schema; bad extension and empty files are rejected."""
    ns_mgr, tbl_mgr = managers
    # physical warehouse location is session-global: clear leftovers
    # from prior runs before (and after) materializing
    spark.sql("DROP DATABASE IF EXISTS jsonl_demo CASCADE")
    ns = ns_mgr.create("jsonl demo")
    meta = tbl_mgr.register(int(ns["id"]), "events_j")
    p = tmp_path / "events.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    out = tbl_mgr.upload_jsonl(int(meta["id"]), p)
    assert bool(out["is_loaded"])
    got = spark.table(f"{ns['schema_name']}.events_j") \
        .orderBy("a").collect()
    assert [(r["a"], r["b"]) for r in got] == [(1, "x"), (2, "y")]
    # wrong extension rejected
    import pytest as _pt
    from data_platform_copilot_spark.catalog.tables import TableError
    meta2 = tbl_mgr.register(int(ns["id"]), "events_j2")
    bad = tmp_path / "nope.txt"
    bad.write_text("{}")
    with _pt.raises(TableError):
        tbl_mgr.upload_jsonl(int(meta2["id"]), bad)
    spark.sql("DROP DATABASE IF EXISTS jsonl_demo CASCADE")


def test_jsonl_mixed_corrupt_records(spark, tmp_path, managers):
    """PERMISSIVE-mode ingest with SOME bad lines: clean rows load,
    corrupt lines are dropped (never saved as a _corrupt_record
    column in the warehouse table) and their count is surfaced."""
    ns_mgr, tbl_mgr = managers
    spark.sql("DROP DATABASE IF EXISTS jsonl_corrupt CASCADE")
    ns = ns_mgr.create("jsonl corrupt")
    meta = tbl_mgr.register(int(ns["id"]), "events_c")
    p = tmp_path / "mixed.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n'
                 'not json at all\n'
                 '{"a": 2, "b": "y"}\n'
                 '{"a": 3, "b": broken\n')
    out = tbl_mgr.upload_jsonl(int(meta["id"]), p)
    assert out["n_corrupt_records"] == 2
    tbl = spark.table(f"{ns['schema_name']}.events_c")
    assert "_corrupt_record" not in tbl.columns
    got = tbl.orderBy("a").collect()
    assert [(r["a"], r["b"]) for r in got] == [(1, "x"), (2, "y")]
    spark.sql("DROP DATABASE IF EXISTS jsonl_corrupt CASCADE")

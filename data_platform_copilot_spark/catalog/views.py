"""Warehouse views: user-facing CREATE OR REPLACE VIEW surface.

Reference parity: the demo warehouse documents a view
(``v_revenue_by_country``, reference db/schema_docs.md:43-48) created
by a bootstrap script the reference repo references but does not ship
(README.md:89 -> db/init_duckdb.py). This module supplies the missing
user surface on Spark: SELECT-only view definitions validated by the
SQL gateway (same classifier the chat path uses), registered in the
session catalog so ``spark.table``/``spark.sql`` and the schema-docs
renderer see them like any table.

Views are logical — a ``CREATE OR REPLACE TEMP VIEW`` stores only the
parsed plan, so Catalyst inlines the definition into every consumer
query and optimizes THROUGH it (filter pushdown into the view's scan,
etc.). At 100 TB a view costs nothing at rest; the alternative
(materialized tables) is a sink decision, not a catalog one.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from ..gateway import IncorrectQuestionError, is_safe, validate_sql

_VIEW_NAME_RE = re.compile(r"^[a-z_][a-z0-9_]{0,62}$")


class ViewManager:
    """CREATE / list / drop views in the session catalog."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._definitions: dict[str, str] = {}

    def create(self, name: str, select_sql: str) -> dict[str, str]:
        """CREATE OR REPLACE VIEW ``name`` AS ``select_sql``.

        The definition must pass the gateway's SELECT-only validation
        (the view body runs with the caller's privileges on every
        read, so it gets the same gate as ad-hoc SQL); the name is
        identifier-checked, never interpolated from raw input.
        """
        if not _VIEW_NAME_RE.match(name or ""):
            raise IncorrectQuestionError(
                f"invalid view name {name!r}: lowercase identifier, "
                "<= 63 chars")
        safe, why = is_safe(select_sql)  # multi-statement / comment gate
        if not safe:
            raise IncorrectQuestionError(why)
        body = validate_sql(select_sql)
        self.spark.sql(f"CREATE OR REPLACE TEMP VIEW {name} AS {body}")
        self._definitions[name] = body
        return {"name": name, "definition": body}

    def list(self) -> list[dict[str, str]]:
        return [{"name": n, "definition": d}
                for n, d in sorted(self._definitions.items())]

    def definition(self, name: str) -> str | None:
        return self._definitions.get(name)

    def drop(self, name: str) -> bool:
        dropped = self.spark.catalog.dropTempView(name)
        self._definitions.pop(name, None)
        return dropped


# The reference's documented demo view, re-based onto the TPC-H-ish
# demo warehouse (country <- nation; revenue <- o_totalprice).
# round(x*100)/100 instead of round(x, 2): scale-first rounding is the
# engine-portable form (see queries/core.rnd) so the view's output
# value-matches a DuckDB oracle bit-for-bit.
V_REVENUE_BY_COUNTRY = """
SELECT n_name AS country,
       round(sum(o_totalprice) * 100) / 100 AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""".strip()


def create_demo_views(views: ViewManager) -> list[str]:
    """Bootstrap the documented demo view when its base tables exist
    (reference db/schema_docs.md:43-48); no-op otherwise."""
    catalog = {t.name for t in views.spark.catalog.listTables()}
    created = []
    if {"orders", "customer", "nation"} <= catalog:
        views.create("v_revenue_by_country", V_REVENUE_BY_COUNTRY)
        created.append("v_revenue_by_country")
    return created

"""Dump the formatted physical plan of every query to PLANS.md —
the `.explain("formatted")` review artifact (scan pushdown, join
strategy, aggregate phases) per query.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from data_platform_copilot_spark.queries import QUERIES
    from data_platform_copilot_spark.session import get_spark

    spark = get_spark("plan-dump", shuffle_partitions=8)
    plans: dict[str, str] = {}
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plans[name] = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # pragma: no cover
            plans[name] = f"ERROR: {exc}"

    out = ["# PLANS — formatted physical plans per query",
           "", f"Generated against `{sf_dir}`.", "",
           "## Plan-shape audit (keyed exchanges / broadcasts / "
           "scans / Python stages per query)", "",
           "| query | keyed exchanges | broadcasts | parquet scans | "
           "Arrow (Python) stages | top-k pushdown |", "|---|---|---|---|---|---|"]
    for name, plan in plans.items():
        topk = ("TakeOrderedAndProject" in plan
                or "WindowGroupLimit" in plan)
        out.append(
            f"| {name} | {plan.count('hashpartitioning')} "
            f"| {plan.count('BroadcastExchange')} "
            f"| {plan.count('Scan parquet')} "
            f"| {plan.count('ArrowEvalPython') + plan.count('MapInPandas') + plan.count('FlatMapGroupsInPandas') + plan.count('FlatMapCoGroupsInPandas')} "
            f"| {'yes' if topk else '—'} |")
    out.append("")
    for name, plan in plans.items():
        out += [f"## {name}", "", "```", plan.rstrip(), "```", ""]
    Path("PLANS.md").write_text("\n".join(out), encoding="utf-8")
    print(f"wrote PLANS.md ({len(QUERIES)} queries)")


if __name__ == "__main__":
    main()

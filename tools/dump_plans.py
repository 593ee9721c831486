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
    out = ["# PLANS — formatted physical plans per query",
           "", f"Generated against `{sf_dir}`.", ""]
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # pragma: no cover
            plan = f"ERROR: {exc}"
        out += [f"## {name}", "", "```", plan.rstrip(), "```", ""]
    Path("PLANS.md").write_text("\n".join(out), encoding="utf-8")
    print(f"wrote PLANS.md ({len(QUERIES)} queries)")


if __name__ == "__main__":
    main()

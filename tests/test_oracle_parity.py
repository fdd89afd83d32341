"""Differential tests: every registered query vs its DuckDB oracle at the
smallest scale factor — the local replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

from duckdb_postgis_spark import registry
from tests.oracle_harness import compare_query

registry.load_all()
ORACLE_CASES = sorted(registry.ORACLES)
ROWS_ONLY_CASES = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, sf_dir, name):
    compare_query(spark, name, registry.QUERIES[name], registry.ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_runs(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.columns


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert e.queries()
    assert set(e.oracle_sql()) <= set(e.queries())

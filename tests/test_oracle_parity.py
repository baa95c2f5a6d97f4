"""Runs every queries() entry against its oracle_sql() via DuckDB —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle import compare

QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    fn = entry_mod.queries()[name]
    df = fn(spark, sf_dir)
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    issues = compare(df, sql, sf_dir)
    assert not issues, f"{name}: " + "; ".join(issues[:6])


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None

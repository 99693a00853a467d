"""The t2 gate, locally: every registry query with an oracle must
hash-match DuckDB on sf0.01 (the driver's exact comparison scale)."""

from __future__ import annotations

import pytest

from cdc_pipeline_with_kafka_spark import queries as q

from .conftest import SF_CORRECT
from .oracle import compare, duckdb_con

ORACLE_QUERIES = sorted(name for name, (_fn, sql) in q.REGISTRY.items() if sql)
ROWS_ONLY_QUERIES = sorted(name for name, (_fn, sql) in q.REGISTRY.items() if not sql)


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_CORRECT)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, con, name):
    fn, sql = q.REGISTRY[name]
    ok, msg = compare(fn(spark, SF_CORRECT), con, q.resolve_sql(name, sql))
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    fn, _ = q.REGISTRY[name]
    df = fn(spark, SF_CORRECT)
    assert df.count() >= 0  # runs without error, stable schema
    assert len(df.schema.fields) > 0

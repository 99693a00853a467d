"""Strict (9-decimal, effectively exact for round-6 outputs) row-by-row
Spark-vs-DuckDB parity for every similarity gate at sf0.001 AND sf0.01.

The round-2 driver gate failed sim_cosine_topk / sim_embedding_neardup_lsh
on 1-ulp float32-vs-float64 boundary flips that the default ndigits=4
parity test could not see; this suite pins the invariant at the gate's
own rounding policy so a reintroduced un-cast oracle (or a scorer
operation-order drift) fails in pytest before the driver runs.
"""

from __future__ import annotations

import pytest

from cdc_pipeline_with_kafka_spark import queries as q

from .conftest import SF_CORRECT, SF_SMOKE
from .oracle import compare, duckdb_con

SIM_GATES = [
    "sim_cosine_topk",
    "sim_embedding_neardup_lsh",
]


@pytest.fixture(scope="module", params=[SF_SMOKE, SF_CORRECT], ids=["sf0.001", "sf0.01"])
def sf_and_con(request):
    con = duckdb_con(request.param)
    yield request.param, con
    con.close()


@pytest.mark.parametrize("name", SIM_GATES)
def test_sim_gate_exact(spark, sf_and_con, name):
    sf_dir, con = sf_and_con
    fn, sql = q.REGISTRY[name]
    assert sql is not None, f"{name} lost its oracle"
    ok, msg = compare(fn(spark, sf_dir), con, q.resolve_sql(name, sql), ndigits=9)
    assert ok, f"{name} @ {sf_dir}: {msg}"


@pytest.mark.parametrize("name", ["semdedup", "sim_ann_suite"])
def test_sim_gate_exact_at_oracle_scale(spark, name):
    """9-decimal parity — only at the driver's oracle scale: these
    gates carry pinned-model VALUES built from _ORACLE_SF_DIR
    (semdedup's trained centroids; sim_ann_suite's r6 'bm25'/'rrf'
    pinned-Python scores), so the cross-sf parametrization above
    doesn't apply.  The SF-agnostic 'lsh'/'ivf' branches still get
    cross-sf coverage through their shared oracle SQL in the driver
    gate and the recall pytest."""
    con = duckdb_con(SF_CORRECT)
    try:
        fn, sql = q.REGISTRY[name]
        ok, msg = compare(fn(spark, SF_CORRECT), con, q.resolve_sql(name, sql), ndigits=9)
        assert ok, f"{name} @ {SF_CORRECT}: {msg}"
    finally:
        con.close()

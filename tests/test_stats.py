"""Unit semantics for operators/stats.py — hypothesis-testing tier
(the sf0.01 oracle parity rides the 'ks'/'chi2' classify_suite and
'bnfd'/'ols*' a_stats_suite branches)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cdc_pipeline_with_kafka_spark.operators import stats as S


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# ------------------------------------------------------------ ks_drift

def test_ks_identical_distributions_zero(spark):
    rows = [(v, s) for v in [1, 2, 3, 4] for s in ["a", "b"]]
    out = S.ks_drift(_df(spark, rows, "v int, s string"),
                     "v", "s", "a", "b").collect()[0]
    assert out["d_ppm"] == 0
    assert out["n_a"] == 4 and out["n_b"] == 4


def test_ks_disjoint_distributions_full(spark):
    rows = [(1, "a"), (2, "a"), (10, "b"), (11, "b")]
    out = S.ks_drift(_df(spark, rows, "v int, s string"),
                     "v", "s", "a", "b").collect()[0]
    assert out["d_ppm"] == 1_000_000
    # sup attained at the last a-value (smallest argmax)
    assert out["at_value"] == 2


def test_ks_hand_example(spark):
    # a: {1,2,3}, b: {2,3,3}; D at v=1: |1/3-0|=1/3 → 333333 ppm
    rows = [(1, "a"), (2, "a"), (3, "a"), (2, "b"), (3, "b"), (3, "b")]
    out = S.ks_drift(_df(spark, rows, "v int, s string"),
                     "v", "s", "a", "b").collect()[0]
    assert out["d_ppm"] == 333_333 and out["at_value"] == 1


def test_ks_ignores_other_sides_and_nulls(spark):
    rows = [(1, "a"), (2, "b"), (None, "a"), (5, "c")]
    out = S.ks_drift(_df(spark, rows, "v int, s string"),
                     "v", "s", "a", "b").collect()[0]
    assert out["n_a"] == 1 and out["n_b"] == 1


# ---------------------------------------------------- chi2_association

def test_chi2_perfect_association(spark):
    rows = [(c, c.upper()) for c in "xxyyzz"]
    out = S.chi2_association(_df(spark, rows, "a string, b string"),
                             "a", "b").collect()[0]
    # perfect 3x3 diagonal: chi2 = n·min(r-1,c-1) exactly → V = 1
    assert out["n"] == 6 and out["dof"] == 4
    assert int(out["chi2_ppm"]) == 12_000_000
    assert out["cramers_v_ppm"] == 1_000_000


def test_chi2_independence_zero(spark):
    rows = [(a, b) for a in "xy" for b in "pq" for _ in range(3)]
    out = S.chi2_association(_df(spark, rows, "a string, b string"),
                             "a", "b").collect()[0]
    assert int(out["chi2_ppm"]) == 0 and out["cramers_v_ppm"] == 0


def test_chi2_nulls_counted_not_dropped(spark):
    rows = [("x", "p"), ("x", None), (None, "q"), ("y", "q")]
    out = S.chi2_association(_df(spark, rows, "a string, b string"),
                             "a", "b").collect()[0]
    assert out["n"] == 2 and out["n_excluded"] == 2
    assert out["n"] + out["n_excluded"] == 4  # totality


# ------------------------------------------------------ benford_report

def test_benford_zero_filled_and_exact_ppm(spark):
    # 30 values starting with 1, 12 with 2 — digits 3..9 must appear
    rows = [(float(100 + i),) for i in range(30)] + [(2.5,)] * 12
    out = {r["digit"]: r for r in S.benford_report(
        _df(spark, rows, "v double"), "v").collect()}
    assert sorted(out) == list(range(1, 10))
    assert out[1]["cnt"] == 30 and out[2]["cnt"] == 12
    assert out[3]["cnt"] == 0 and out[3]["obs_ppm"] == 0
    assert out[1]["obs_ppm"] == 30 * 1_000_000 // 42
    # expected shares are the fixed table and sum to exactly 1e6
    assert sum(r["exp_ppm"] for r in out.values()) == 1_000_000
    assert out[1]["dev_ppm"] == out[1]["obs_ppm"] - 301_030


def test_benford_negative_and_subcent_values(spark):
    # -123.45 → 12345 → digit 1; 0.004 → round(0.4)=0 → dropped
    rows = [(-123.45,), (0.004,), (None,)]
    out = {r["digit"]: r for r in S.benford_report(
        _df(spark, rows, "v double"), "v").collect()}
    assert out[1]["cnt"] == 1 and out[1]["n"] == 1


def test_benford_grouped(spark):
    rows = [("g1", 10.0), ("g1", 20.0), ("g2", 90.0)]
    out = S.benford_report(_df(spark, rows, "g string, v double"),
                           "v", ["g"]).collect()
    assert len(out) == 18  # 2 groups × 9 digits, zero-filled
    g2 = {r["digit"]: r for r in out if r["g"] == "g2"}
    assert g2[9]["cnt"] == 1 and g2[9]["obs_ppm"] == 1_000_000


# -------------------------------------------------------- ols_by_group

def test_ols_exact_line(spark):
    rows = [("g", float(x), 2.0 * x + 1.0) for x in range(10)]
    out = S.ols_by_group(_df(spark, rows, "g string, x double, y double"),
                         "x", "y", ["g"]).collect()[0]
    assert out["n"] == 10
    assert out["slope"] == pytest.approx(2.0, abs=1e-9)
    assert out["intercept"] == pytest.approx(1.0, abs=1e-9)
    assert out["r2"] == pytest.approx(1.0, abs=1e-12)


def test_ols_degenerate_x_is_null(spark):
    rows = [("g", 1.0, 5.0), ("g", 1.0, 7.0)]
    out = S.ols_by_group(_df(spark, rows, "g string, x double, y double"),
                         "x", "y", ["g"]).collect()[0]
    assert out["slope"] is None and out["r2"] is None


def test_ols_pairwise_complete_and_args(spark):
    rows = [("g", 1.0, 1.0), ("g", 2.0, None), ("g", 3.0, 3.0)]
    df = _df(spark, rows, "g string, x double, y double")
    assert S.ols_by_group(df, "x", "y", ["g"]).collect()[0]["n"] == 2
    with pytest.raises(ValueError):
        S.ols_by_group(df, "x", "y", [])
    with pytest.raises(ValueError):
        S.ols_by_group(df, "x", "y", ["g"], micro=0)


def test_ols_plan_single_hashaggregate_no_window(spark):
    rows = [("g", float(x), float(x)) for x in range(5)]
    df = S.ols_by_group(_df(spark, rows, "g string, x double, y double"),
                        "x", "y", ["g"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "SortAggregate" not in plan  # decimal sums stay hash-able

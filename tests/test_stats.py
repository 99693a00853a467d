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


# --------------------------------------------------------- km_survival

def test_km_hand_computed_with_censoring(spark):
    # classic: events at t=1 (d=1, n=5), t=3 (d=1, n=3); censor at 2, 4;
    # one unit still alive at 5 (censored)
    rows = [(1, 1), (2, 0), (3, 1), (4, 0), (5, 0)]
    out = {r["t"]: r for r in S.km_survival(
        _df(spark, rows, "t int, e int"), "t", "e").collect()}
    assert sorted(out) == [1, 3]
    assert out[1]["n_risk"] == 5 and out[1]["d"] == 1
    assert out[1]["surv_ppm"] == 800_000          # 1e6·4/5
    assert out[3]["n_risk"] == 3
    assert out[3]["surv_ppm"] == 800_000 * 2 // 3  # 533333

def test_km_ties_and_censor_at_event_time(spark):
    # d=2 and c=1 at the same t: censored unit still at risk at t
    rows = [(2, 1), (2, 1), (2, 0), (9, 0)]
    out = S.km_survival(_df(spark, rows, "t int, e int"),
                        "t", "e").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_risk"] == 4 and r["d"] == 2 and r["c_censored"] == 1
    assert r["surv_ppm"] == 500_000

def test_km_grouped_independent_curves(spark):
    rows = [("a", 1, 1), ("a", 2, 1), ("b", 1, 1)]
    out = S.km_survival(_df(spark, rows, "g string, t int, e int"),
                        "t", "e", ["g"]).collect()
    by = {(r["g"], r["t"]): r["surv_ppm"] for r in out}
    assert by[("a", 1)] == 500_000 and by[("a", 2)] == 0
    assert by[("b", 1)] == 0

def test_km_integer_recurrence_floors_per_step(spark):
    # 3 units, events at 1 and 2: s(1)=666666 (floor), s(2)=333333
    rows = [(1, 1), (2, 1), (3, 0)]
    out = {r["t"]: r["surv_ppm"] for r in S.km_survival(
        _df(spark, rows, "t int, e int"), "t", "e").collect()}
    assert out[1] == 666_666
    assert out[2] == 666_666 * 1 // 2  # 333333, floored from the floor


# ------------------------------------------------------- abtest_report

def test_abtest_lifts_and_z(spark):
    rows = ([("c", True)] * 10 + [("c", False)] * 90
            + [("t", True)] * 20 + [("t", False)] * 80)
    out = {r["variant"]: r for r in S.abtest_report(
        _df(spark, rows, "variant string, s boolean"),
        "variant", "s", "c").collect()}
    assert out["c"]["is_control"] and out["c"]["lift_ppm"] is None
    t = out["t"]
    assert t["n"] == 100 and t["n_success"] == 20
    assert t["cr_ppm"] == 200_000 and t["lift_ppm"] == 100_000
    assert t["rel_lift_ppm"] == 1_000_000  # +100%
    # z = 0.1 / sqrt(0.15·0.85·0.02)
    import math
    assert t["z"] == pytest.approx(
        0.1 / math.sqrt(0.15 * 0.85 * 0.02), abs=1e-12)

def test_abtest_negative_lift_sign_safe(spark):
    rows = ([("c", True)] * 20 + [("c", False)] * 80
            + [("t", True)] * 10 + [("t", False)] * 90)
    t = {r["variant"]: r for r in S.abtest_report(
        _df(spark, rows, "variant string, s boolean"),
        "variant", "s", "c").collect()}["t"]
    assert t["lift_ppm"] == -100_000
    assert t["rel_lift_ppm"] == -500_000  # −50%, floored on |·|

def test_abtest_null_success_counted_excluded(spark):
    rows = [("c", True), ("c", None), ("t", False), ("t", None)]
    out = {r["variant"]: r for r in S.abtest_report(
        _df(spark, rows, "variant string, s boolean"),
        "variant", "s", "c").collect()}
    assert out["c"]["n"] == 1 and out["c"]["n_excluded"] == 1
    assert out["t"]["n"] == 1 and out["t"]["n_excluded"] == 1


# ---------------------------------------- mutual_information_report

def test_mi_deterministic_feature(spark):
    # feature == label → MI = H(label); nmi = 1
    rows = [(l, l) for l in ["x", "y", "z", "x"]]
    out = S.mutual_information_report(
        _df(spark, rows, "f string, lab string"), ["f"], "lab"
    ).collect()[0]
    assert out["mi_micro"] == out["h_label_micro"] > 0
    assert out["nmi_ppm"] == 1_000_000

def test_mi_independent_feature_zero(spark):
    rows = [(f, l) for f in "ab" for l in "pq"]
    out = S.mutual_information_report(
        _df(spark, rows, "f string, lab string"), ["f"], "lab"
    ).collect()[0]
    assert out["mi_micro"] == 0 and out["nmi_ppm"] == 0

def test_mi_core_replay_and_null_category(spark):
    from cdc_pipeline_with_kafka_spark.operators.stats import mi_core
    rows = [("a", "x"), ("a", "x"), (None, "y"), (None, "x")]
    out = S.mutual_information_report(
        _df(spark, rows, "f string, lab string"), ["f"], "lab"
    ).collect()[0]
    # NULL feature value is a real category
    assert out["card_feature"] == 2 and out["n"] == 4
    core = mi_core([("a", "x", 2), (None, "y", 1), (None, "x", 1)])
    assert out["mi_micro"] == core[0]

def test_mi_cell_guard_raises(spark):
    rows = [(str(i), str(i % 2)) for i in range(50)]
    with pytest.raises(ValueError, match="cells"):
        S.mutual_information_report(
            _df(spark, rows, "f string, lab string"), ["f"], "lab",
            max_cells=10)
    with pytest.raises(ValueError):
        S.mutual_information_report(
            _df(spark, rows, "f string, lab string"), [], "lab")


# ------------------------------------------------------------- ks_core

def test_ks_core_matches_ks_drift(spark):
    import random
    rng = random.Random(7)
    rows = [(rng.randint(0, 30), rng.choice(["a", "b"]))
            for _ in range(400)]
    got = S.ks_drift(_df(spark, rows, "v int, s string"),
                     "v", "s", "a", "b").collect()[0]
    ca, cb = {}, {}
    for v, s in rows:
        (ca if s == "a" else cb)[v] = (ca if s == "a" else cb).get(v, 0) + 1
    d_ppm, n_a, n_b, at_v = S.ks_core(ca, cb)
    assert (got["d_ppm"], got["n_a"], got["n_b"], got["at_value"]) == \
        (d_ppm, n_a, n_b, at_v)

def test_ks_core_empty_side():
    assert S.ks_core({}, {1: 2}) == (0, 0, 2, None)


# --------------------------------------------------- theil_sen_by_group

def test_theil_sen_resists_outliers(spark):
    # perfect line y=2x+1 with two wild outliers — OLS moves, TS doesn't
    rows = [("g", float(x), 2.0 * x + 1.0) for x in range(20)]
    rows[3] = ("g", 3.0, 500.0)
    rows[11] = ("g", 11.0, -400.0)
    df = _df(spark, rows, "g string, x double, y double")
    ts = S.theil_sen_by_group(df, "x", "y", ["g"]).collect()[0]
    ols = S.ols_by_group(df, "x", "y", ["g"]).collect()[0]
    assert ts["slope"] == pytest.approx(2.0, abs=1e-6)
    assert ts["intercept"] == pytest.approx(1.0, abs=1e-6)
    assert abs(ols["slope"] - 2.0) > 0.5  # OLS got dragged
    assert ts["n_points"] == 20 and ts["n_pairs"] == 190

def test_theil_sen_vertical_pairs_excluded_and_degenerate(spark):
    rows = [("g", 1.0, 5.0), ("g", 1.0, 9.0), ("g", 2.0, 7.0)]
    out = S.theil_sen_by_group(
        _df(spark, rows, "g string, x double, y double"),
        "x", "y", ["g"]).collect()[0]
    # only the two x=1→x=2 pairs count (slopes 2 and -2)
    assert out["n_pairs"] == 2
    rows2 = [("h", 1.0, 5.0), ("h", 1.0, 9.0)]
    out2 = S.theil_sen_by_group(
        _df(spark, rows2, "g string, x double, y double"),
        "x", "y", ["g"]).collect()[0]
    assert out2["slope"] is None and out2["n_pairs"] == 0

def test_theil_sen_max_points_guard(spark):
    rows = [("g", float(i), 1.0) for i in range(30)]
    df = _df(spark, rows, "g string, x double, y double")
    with pytest.raises(Exception, match="theil_sen_by_group"):
        S.theil_sen_by_group(df, "x", "y", ["g"], max_points=10).collect()

def test_ks_drift_distinct_guard(spark):
    rows = [(v, "a" if v % 2 else "b") for v in range(50)]
    df = _df(spark, rows, "v int, s string")
    with pytest.raises(ValueError, match="quantize"):
        S.ks_drift(df, "v", "s", "a", "b",
                   max_distinct_values=10).collect()
    # under the bound: same result as unguarded
    got = S.ks_drift(df, "v", "s", "a", "b",
                     max_distinct_values=100).collect()[0]
    want = S.ks_drift(df, "v", "s", "a", "b").collect()[0]
    assert tuple(got) == tuple(want)

def test_abtest_missing_control_raises(spark):
    rows = [("t", True), ("t", False)]
    with pytest.raises(ValueError, match="control"):
        S.abtest_report(_df(spark, rows, "variant string, s boolean"),
                        "variant", "s", "zzz")

def test_ks_drift_auto_quantizes_continuous_by_default(spark):
    """A high-cardinality DOUBLE column is bounded BY DEFAULT: values
    quantize onto the equal-width grid before the distinct-value
    window, so composing with max_distinct_values proves the frame
    was capped; the raw-value path is an explicit opt-out."""
    rows = [(i / 997.0, "a") for i in range(3000)]
    rows += [((i + 500) / 997.0, "b") for i in range(3000)]
    df = _df(spark, rows, "v double, s string")
    # default path quantizes: an 8-cell grid passes an 8-value guard
    got8 = S.ks_drift(df, "v", "s", "a", "b",
                      max_distinct_values=8,
                      auto_quantize_cells=8).collect()[0]
    assert got8["n_a"] == 3000 and got8["n_b"] == 3000
    # opt-out keeps raw values: the same guard now trips
    with pytest.raises(ValueError, match="quantize"):
        S.ks_drift(df, "v", "s", "a", "b",
                   max_distinct_values=8,
                   auto_quantize_cells=None).collect()
    # grid finer than the value spacing reproduces the exact D
    exact = S.ks_drift(df, "v", "s", "a", "b",
                       auto_quantize_cells=None).collect()[0]
    grid = S.ks_drift(df, "v", "s", "a", "b").collect()[0]  # default
    assert grid["d_ppm"] == exact["d_ppm"]
    # 8 cells lower-bound exact D by at most one cell of CDF mass
    assert got8["d_ppm"] <= exact["d_ppm"]
    assert exact["d_ppm"] - got8["d_ppm"] <= 1_000_000 // 8 + 1
    # integer columns never quantize (their grain IS the statistic)
    irows = [(v, "a" if v % 2 else "b") for v in range(50)]
    idf = _df(spark, irows, "v int, s string")
    a = S.ks_drift(idf, "v", "s", "a", "b").collect()[0]
    b = S.ks_drift(idf, "v", "s", "a", "b",
                   auto_quantize_cells=None).collect()[0]
    assert tuple(a) == tuple(b)
    with pytest.raises(ValueError, match="auto_quantize_cells"):
        S.ks_drift(df, "v", "s", "a", "b", auto_quantize_cells=1).collect()


def test_ks_drift_nan_rows_dropped_and_grid_still_engages(spark):
    """A single NaN must not poison min/max and silently disable the
    auto-quantize grid (Spark max returns NaN): NaN rows are dropped
    like NULLs on both paths, and with the grid engaged the distinct
    guard sees ≤ cells values, not the raw cardinality."""
    rows = (
        [(i / 7.0, "a") for i in range(300)]
        + [(i / 11.0, "b") for i in range(300)]
        + [(float("nan"), "a"), (float("nan"), "b")]
    )
    df = _df(spark, rows, "v double, s string")
    # pre-fix this raised: NaN max disabled the grid and ~580 raw
    # distinct values hit the max_distinct_values guard
    row = S.ks_drift(
        df, "v", "s", "a", "b",
        auto_quantize_cells=50, max_distinct_values=50,
    ).collect()[0]
    assert row["n_a"] == 300 and row["n_b"] == 300  # NaN ≙ NULL
    clean = _df(
        spark, [r for r in rows if r[0] == r[0]], "v double, s string"
    )
    want = S.ks_drift(
        clean, "v", "s", "a", "b", auto_quantize_cells=50
    ).collect()[0]
    assert row == want
    # exact opt-out path drops NaN identically (paths agree on NaN)
    exact = S.ks_drift(
        df, "v", "s", "a", "b", auto_quantize_cells=None
    ).collect()[0]
    assert exact["n_a"] == 300 and exact["n_b"] == 300


def test_ks_drift_infinite_range_raises_on_grid(spark):
    """±Inf makes the equal-width grid degenerate (width=inf ⇒ every
    finite value lands in cell 0): the quantize path raises loudly;
    the exact opt-out path still orders ±Inf correctly."""
    rows = [(1.0, "a"), (2.0, "b"), (float("inf"), "b")]
    df = _df(spark, rows, "v double, s string")
    with pytest.raises(ValueError, match="not finite"):
        S.ks_drift(df, "v", "s", "a", "b")
    out = S.ks_drift(
        df, "v", "s", "a", "b", auto_quantize_cells=None
    ).collect()[0]
    assert out["n_a"] == 1 and out["n_b"] == 2
    assert out["at_value"] == 1.0 and out["d_ppm"] == 1_000_000

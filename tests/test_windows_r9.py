"""sequence_ngrams / rolling_features / coverage_gaps — r9 windows
additions."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cdc_pipeline_with_kafka_spark.operators import windows as W


def test_sequence_ngrams_trigrams_and_conditional(spark):
    rows = [("u1", i, s) for i, s in
            enumerate("view click buy view click view".split())] + \
           [("u2", i, s) for i, s in
            enumerate("view click buy".split())]
    df = spark.createDataFrame(rows, "u string, i long, s string")
    out = {(r["step_1"], r["step_2"], r["step_3"]): r
           for r in W.sequence_ngrams(df, ["u"], ["i"], "s", n=3).collect()}
    # (view, click, buy) appears in both users; (view, click, view) once
    assert out[("view", "click", "buy")]["cnt"] == 2
    assert out[("view", "click", "view")]["cnt"] == 1
    # conditional on prefix (view, click): 2/3 and 1/3 exactly
    assert out[("view", "click", "buy")]["p_ppm"] == 666_666
    assert out[("view", "click", "view")]["p_ppm"] == 333_333
    # grams never cross keys: u2 has exactly one trigram
    total = sum(r["cnt"] for r in out.values())
    assert total == 4 + 1  # u1: 4 trigrams, u2: 1


def test_sequence_ngrams_guard(spark):
    df = spark.createDataFrame([("u", 1, "a")], "u string, i long, s string")
    with pytest.raises(ValueError):
        W.sequence_ngrams(df, ["u"], ["i"], "s", n=1)


def test_rolling_features_lags_and_exact_mean(spark):
    rows = [("k", i, float(v)) for i, v in
            enumerate([10, 20, 30, 40, 50])]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    out = {r["i"]: r for r in W.rolling_features(
        df, ["k"], "i", "v", lags=(1, 2), roll_window=3).collect()}
    assert out[0]["lag_1"] is None and out[0]["roll_n"] == 0
    assert out[0]["roll_mean_micro"] is None
    assert out[3]["lag_1"] == 30.0 and out[3]["lag_2"] == 20.0
    # trailing frame EXCLUDES current: rows 0,1,2 → mean 20
    assert out[3]["roll_n"] == 3
    assert out[3]["roll_min"] == 10.0 and out[3]["roll_max"] == 30.0
    assert out[3]["roll_mean_micro"] == 20_000_000
    # frame slides: row 4 sees 20,30,40
    assert out[4]["roll_mean_micro"] == 30_000_000
    with pytest.raises(ValueError):
        W.rolling_features(df, ["k"], "i", "v", lags=())


def test_coverage_gaps_overlaps_never_false_gap(spark):
    mk = lambda s, e: (f"2024-01-01 {s}:00", f"2024-01-01 {e}:00")  # noqa
    rows = [("s1", *mk("00:00", "01:00")),
            ("s1", *mk("00:30", "02:00")),   # overlaps — no gap
            ("s1", *mk("03:00", "04:00")),   # 1h gap after 02:00
            ("s1", *mk("03:10", "03:20")),   # contained — no gap
            ("s1", *mk("04:00", "05:00")),   # touching — no gap
            ("s2", *mk("00:00", "01:00"))]
    df = spark.createDataFrame(rows, "k string, s string, e string") \
        .select("k", F.col("s").cast("timestamp_ntz").alias("s"),
                F.col("e").cast("timestamp_ntz").alias("e"))
    out = W.coverage_gaps(df, ["k"], "s", "e", "5 minutes").collect()
    assert len(out) == 1
    g = out[0]
    assert g["k"] == "s1" and g["gap_us"] == 3_600_000_000
    assert str(g["gap_start"]).startswith("2024-01-01 02:00")
    # min_gap filters: a 60-min threshold hides the 1h-equal gap? no —
    # strictly greater: 1h gap > 60 minutes is FALSE (equal), hidden
    assert W.coverage_gaps(df, ["k"], "s", "e", "1 hour").count() == 0
    with pytest.raises(ValueError, match="min_gap"):
        W.coverage_gaps(df, ["k"], "s", "e", "fortnight")


def test_funnel_paths_counts_and_truncation(spark):
    rows = [("u1", i, s) for i, s in enumerate(["v", "c", "b"])] + \
           [("u2", i, s) for i, s in enumerate(["v", "c", "b"])] + \
           [("u3", i, s) for i, s in enumerate(["v", "x"])] + \
           [("u4", i, s) for i, s in enumerate(list("vcbzz") + ["q"])]
    df = spark.createDataFrame(rows, "u string, i long, s string")
    out = {r["path"]: r for r in W.funnel_paths(
        df, ["u"], ["i"], "s", max_len=3).collect()}
    # u4 truncates to v>c>b at max_len=3 and merges with u1/u2
    assert out["v>c>b"]["cnt"] == 3
    assert out["v>x"]["cnt"] == 1 and out["v>x"]["depth"] == 2
    assert out["v>c>b"]["share_ppm"] == 750_000
    with pytest.raises(ValueError):
        W.funnel_paths(df, ["u"], ["i"], "s", max_len=0)


def test_small_files_report_advice(spark, tmp_path):
    from cdc_pipeline_with_kafka_spark.operators.skew import (
        small_files_report,
    )
    p = str(tmp_path / "frag")
    spark.range(1000).repartition(10).write.parquet(p)
    rep = small_files_report(spark, p, target_bytes=10 * 1024 * 1024)
    assert rep["n_files"] == 10
    assert rep["n_small"] == 10 and rep["small_share_ppm"] == 1_000_000
    assert rep["advice"].startswith("compact")
    assert rep["rows"] == {}  # metadata-only by default: no data scan
    # row counts are an explicit opt-in (full scan, documented)
    rep_rows = small_files_report(
        spark, p, target_bytes=10 * 1024 * 1024, include_row_counts=True
    )
    assert sum(rep_rows["rows"].values()) == 1000
    assert len(rep_rows["rows"]) == 10
    # generous target → healthy
    rep2 = small_files_report(spark, p, target_bytes=1)
    assert rep2["advice"] == "healthy"


def test_sequence_ngrams_min_count_keeps_true_prefix_mass(spark):
    # prefix (a,b) continues to c ×3 and to d ×1; pruning d must NOT
    # inflate c's conditional to 100%
    rows = []
    for u, tail in [("u1", "c"), ("u2", "c"), ("u3", "c"), ("u4", "d")]:
        rows += [(u, 0, "a"), (u, 1, "b"), (u, 2, tail)]
    df = spark.createDataFrame(rows, "u string, i long, s string")
    out = {r["step_3"]: r for r in W.sequence_ngrams(
        df, ["u"], ["i"], "s", n=3, min_count=2).collect()}
    assert "d" not in out            # pruned from the OUTPUT
    assert out["c"]["p_ppm"] == 750_000  # but not from the denominator


def test_multi_touch_attribution_models_vs_bruteforce(spark):
    """All four credit models vs a pure-Python replay on a randomized
    event log: exact pairs, positions, and ppm credits; the
    Σcredit = 1e6 × conversions invariant; unattributed conversions
    kept as NULL-touch rows."""
    import datetime
    import random

    from cdc_pipeline_with_kafka_spark.operators.windows import (
        multi_touch_attribution,
    )

    rng = random.Random(11)
    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for u in range(25):
        t = 0
        for _ in range(rng.randint(1, 12)):
            t += rng.randint(1, 200) * 60
            rows.append((
                u, base + datetime.timedelta(seconds=t), eid,
                rng.choice(["view", "view", "click", "purchase", "error"]),
            ))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_id int, event_type string"
    )
    lb = datetime.timedelta(minutes=300)
    by_u: dict[int, list] = {}
    for u, ts, i, ty in rows:
        by_u.setdefault(u, []).append((ts, i, ty))

    def brute(model):
        out = []
        for u, evs in by_u.items():
            for ts, i, ty in evs:
                if ty != "purchase":
                    continue
                touches = sorted(
                    (t2, i2) for (t2, i2, ty2) in evs
                    if ty2 in ("view", "click") and ts - lb <= t2 < ts
                )
                n = len(touches)
                if n == 0:
                    out.append((u, i, None, 0, 0, 1_000_000))
                    continue
                for p, (_, i2) in enumerate(touches, 1):
                    if model == "first":
                        c = 1_000_000 if p == 1 else 0
                    elif model == "last":
                        c = 1_000_000 if p == n else 0
                    elif model == "linear":
                        b = 1_000_000 // n
                        c = b + (1_000_000 - n * b if p == n else 0)
                    elif n == 1:
                        c = 1_000_000
                    elif n == 2:
                        c = 500_000
                    elif p in (1, n):
                        c = 400_000
                    else:
                        b = 200_000 // (n - 2)
                        c = b + (200_000 - (n - 2) * b if p == n - 1 else 0)
                    out.append((u, i, i2, n, p, c))
        return sorted(out)

    for model in ("first", "last", "linear", "u"):
        got = sorted(
            (r.user_id, r.conv_id, r.touch_id, r.n_touches, r.position,
             r.credit_ppm)
            for r in multi_touch_attribution(
                df, ["user_id"], "ts", "event_id", "event_type",
                "purchase", ["view", "click"], 300, model,
            ).collect()
        )
        assert got == brute(model), model
        convs = len({(g[0], g[1]) for g in got})
        assert sum(g[5] for g in got) == 1_000_000 * convs


def test_multi_touch_attribution_window_edges_and_guards(spark):
    """Strict precedence (same-instant touch excluded), inclusive
    lookback start, out-of-window-only conversions STILL emit their
    unattributed row (the time bound lives in the join condition),
    and argument guards."""
    import pytest as _pt

    from cdc_pipeline_with_kafka_spark.operators.windows import (
        multi_touch_attribution,
    )

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 1, "view"),    # exactly -60 min: in
            (1, "2024-01-01 10:30:00", 2, "click"),   # in
            (1, "2024-01-01 11:00:00", 3, "purchase"),  # same instant: conv
            (1, "2024-01-01 11:00:00", 4, "view"),    # same instant: OUT
            (2, "2024-01-01 05:00:00", 5, "view"),    # > lookback: OUT
            (2, "2024-01-01 11:00:00", 6, "purchase"),  # unattributed
        ],
        "user_id int, ts string, event_id int, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sorted(
        (r.conv_id, r.touch_id, r.n_touches, r.position, r.credit_ppm)
        for r in multi_touch_attribution(
            df, ["user_id"], "ts", "event_id", "event_type",
            "purchase", ["view", "click"], 60, "linear",
        ).collect()
    )
    assert out == [(3, 1, 2, 1, 500_000), (3, 2, 2, 2, 500_000),
                   (6, None, 0, 0, 1_000_000)]
    with _pt.raises(ValueError, match="lookback"):
        multi_touch_attribution(
            df, ["user_id"], "ts", "event_id", "event_type",
            "purchase", ["view"], 0)
    with _pt.raises(ValueError, match="model"):
        multi_touch_attribution(
            df, ["user_id"], "ts", "event_id", "event_type",
            "purchase", ["view"], 60, model="shapley")
    with _pt.raises(ValueError, match="touch_types"):
        multi_touch_attribution(
            df, ["user_id"], "ts", "event_id", "event_type",
            "purchase", [], 60)


def test_small_files_report_skips_hidden_dirs(spark, tmp_path):
    """Files INSIDE hidden/temporary directories (_temporary/... from
    an aborted write, .compact_tmp contents) are invisible to a Spark
    scan and must be invisible to the audit too — the hidden check
    applies to every path component under the root, not just the
    leaf name."""
    import os

    from cdc_pipeline_with_kafka_spark.operators.skew import (
        small_files_report,
    )

    p = str(tmp_path / "ds")
    spark.range(100).repartition(4).write.parquet(p)
    junk_dirs = [
        os.path.join(p, "_temporary", "0"),
        os.path.join(p, ".compact_tmp"),
    ]
    for d in junk_dirs:
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "part-junk.parquet"), "wb") as fh:
            fh.write(b"x" * 4096)
    rep = small_files_report(spark, p, target_bytes=1)
    assert rep["n_files"] == 4  # junk not counted
    assert rep["advice"] == "healthy"


def test_a_seq_and_daily_fusions_match_operators(spark):
    """r13 fusion parity: the a_stats 'trans'+'sq3'+'path' stacked
    aggregate (_a_seq_rows) and the 'lagf'+'mode' shared-grain pair
    (_a_daily_rows) must emit row-for-row what the un-fused operator
    constructions emitted — same suite_case/k/v_str/v_num multiset —
    on the smoke corpus (the oracle gate re-checks at sf0.01)."""
    from cdc_pipeline_with_kafka_spark import queries as q
    from cdc_pipeline_with_kafka_spark.operators import sketch as K

    sf = "/root/testdata/sf0.001"
    ev = q._t(spark, sf, "events")

    def rows(df):
        return sorted(map(tuple, df.collect()))

    fused = rows(q._a_seq_rows(spark, sf))
    legacy = rows(
        q._suite_rows(
            W.transition_counts(ev, ["user_id"], ["ts", "event_id"],
                                "event_type"),
            "trans",
            F.concat_ws("|", F.col("from_state"), F.col("to_state")),
            v_str=F.col("cnt").cast("string"),
            v_num=F.col("p_ppm").cast("double"),
        ).unionAll(q._suite_rows(
            W.sequence_ngrams(ev, ["user_id"], ["ts", "event_id"],
                              "event_type", n=3),
            "sq3",
            F.concat_ws("|", "step_1", "step_2", "step_3"),
            v_str=F.col("cnt").cast("string"),
            v_num=F.col("p_ppm").cast("double"),
        )).unionAll(q._suite_rows(
            W.funnel_paths(ev, ["user_id"], ["ts", "event_id"],
                           "event_type", max_len=4),
            "path",
            F.col("path"),
            v_str=F.concat_ws("|", F.col("depth").cast("string"),
                              F.col("cnt").cast("string")),
            v_num=F.col("share_ppm").cast("double"),
        ))
    )
    assert fused == legacy and len(fused) > 0

    lagf, mode = q._a_daily_rows(spark, sf)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    legacy_lagf = q._suite_rows(
        W.rolling_features(daily, ["event_type"], "day", "cnt",
                           lags=(1, 2), roll_window=7, micro=1),
        "lagf",
        F.concat_ws("|", F.col("event_type"),
                    F.date_format("day", "yyyy-MM-dd")),
        v_str=F.concat_ws(
            "|",
            F.coalesce(F.col("lag_1").cast("string"), F.lit("-")),
            F.coalesce(F.col("lag_2").cast("string"), F.lit("-")),
            F.col("roll_n").cast("string"),
            F.coalesce(F.col("roll_min").cast("string"), F.lit("-")),
            F.coalesce(F.col("roll_max").cast("string"), F.lit("-")),
        ),
        v_num=F.col("roll_mean_micro").cast("double"),
    )
    legacy_mode = q._suite_rows(
        K.mode_by_group(
            ev.withColumn("day", F.date_trunc("day", "ts")),
            "event_type", ["day"], k=3,
        ),
        "mode",
        F.concat_ws("|", F.date_format("day", "yyyy-MM-dd HH:mm:ss"),
                    F.col("rank").cast("string")),
        v_str=F.concat_ws("|", F.col("value"), F.col("cnt").cast("string")),
        v_num=F.col("share_ppm").cast("double"),
    )
    assert rows(lagf) == rows(legacy_lagf) and lagf.count() > 0
    assert rows(mode) == rows(legacy_mode) and mode.count() > 0

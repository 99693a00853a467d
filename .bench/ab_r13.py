# r13 interleaved A/Bs.  PREREQUISITE: run inside a REPL that has
# already executed `exec(open('.bench/harness.py').read())` (provides
# spark, q, F, SF, time_df, time_branch, time_noop, hashdf, plan).
# Usage: exec(open('.bench/ab_r13.py').read())
#
# Covers:
#   1. a_stats 'trans'+'sq3'+'path' fusion and 'lagf'+'mode' shared
#      grain (queries._a_seq_rows / _a_daily_rows) vs the legacy
#      operator-built children — hash equality + interleaved timing.
#   2. multimodal vote-key packing (audio_align_pairs /
#      image_overlap_pairs) — multimodal_pipeline branches hk-p/kpp.
#   3. spread() id-like hash — corr branch + CDC parse path.
#   4. breaking_word_stats_factored broadcast-hint removal — a12.
import time as _time

from pyspark.sql import Window
from cdc_pipeline_with_kafka_spark.operators import windows as W
from cdc_pipeline_with_kafka_spark.operators import sketch as K


def _legacy_seq_rows():
    ev = q._t(spark, SF, "events")
    trans = q._suite_rows(
        W.transition_counts(ev, ["user_id"], ["ts", "event_id"], "event_type"),
        "trans",
        F.concat_ws("|", F.col("from_state"), F.col("to_state")),
        v_str=F.col("cnt").cast("string"),
        v_num=F.col("p_ppm").cast("double"),
    )
    sq3 = q._suite_rows(
        W.sequence_ngrams(ev, ["user_id"], ["ts", "event_id"], "event_type", n=3),
        "sq3",
        F.concat_ws("|", "step_1", "step_2", "step_3"),
        v_str=F.col("cnt").cast("string"),
        v_num=F.col("p_ppm").cast("double"),
    )
    path = q._suite_rows(
        W.funnel_paths(ev, ["user_id"], ["ts", "event_id"], "event_type", max_len=4),
        "path",
        F.col("path"),
        v_str=F.concat_ws("|", F.col("depth").cast("string"),
                          F.col("cnt").cast("string")),
        v_num=F.col("share_ppm").cast("double"),
    )
    return trans.unionAll(sq3).unionAll(path)


def _legacy_daily_rows():
    ev = q._t(spark, SF, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    lagf = q._suite_rows(
        W.rolling_features(daily, ["event_type"], "day", "cnt",
                           lags=(1, 2), roll_window=7, micro=1),
        "lagf",
        F.concat_ws("|", F.col("event_type"), F.date_format("day", "yyyy-MM-dd")),
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
    mode = q._suite_rows(
        K.mode_by_group(
            q._t(spark, SF, "events").withColumn("day", F.date_trunc("day", "ts")),
            "event_type", ["day"], k=3,
        ),
        "mode",
        F.concat_ws("|", F.date_format("day", "yyyy-MM-dd HH:mm:ss"),
                    F.col("rank").cast("string")),
        v_str=F.concat_ws("|", F.col("value"), F.col("cnt").cast("string")),
        v_num=F.col("share_ppm").cast("double"),
    )
    return lagf.unionAll(mode)


def ab_fusions(rounds=3):
    new_seq = q._a_seq_rows(spark, SF)
    old_seq = _legacy_seq_rows()
    ls = q._a_daily_rows(spark, SF)
    new_daily = ls[0].unionAll(ls[1])
    old_daily = _legacy_daily_rows()
    print("seq  hash old:", hashdf(old_seq), "new:", hashdf(new_seq))
    print("daily hash old:", hashdf(old_daily), "new:", hashdf(new_daily))
    for _ in range(rounds):
        print("seq   old:", time_noop(old_seq), "new:", time_noop(new_seq))
    for _ in range(rounds):
        print("daily old:", time_noop(old_daily), "new:", time_noop(new_daily))


def ab_a_stats_suite(rounds=3):
    df = q.a_stats_suite(spark, SF)
    for _ in range(rounds):
        print("a_stats_suite steady:", time_df(df))


def ab_multimodal(rounds=3):
    df = q.multimodal_pipeline(spark, SF)
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    print("multimodal SortAggregate nodes:", p.count("SortAggregate"))
    for _ in range(rounds):
        print("multimodal steady:", time_df(df),
              "hkp:", time_branch(df, "hkp"), "kpp:", time_branch(df, "kpp"))


def ab_a12(rounds=3):
    df = q.a12_breaking_words(spark, SF)
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    print("a12 Exchange:", p.count("Exchange"), "BHJ:",
          p.count("BroadcastHashJoin"), "SMJ:", p.count("SortMergeJoin"))
    for _ in range(rounds):
        print("a12 steady:", time_df(df))


print("ab_r13 loaded: ab_fusions() ab_a_stats_suite() ab_multimodal() ab_a12()")

"""Trend analytics (SURVEY.md §2.5 W1-W8): velocity, z-score anomaly,
direction, compound score, top-k ranking, rank-change, timeline.

The reference computes these with O(candidates × 200) Redis point
reads per request (advanced_trend_analyzer.py:93-236).  Here each is a
set-oriented transform over an (hour-bucket × keyword) aggregate
table: one shuffle partitioned by keyword, then pure window functions
— the formulation that scales to 100 TB (partition by keyword hash,
168-row bounded frames, no driver loops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import scoring

# Thresholds from advanced_trend_analyzer.py:43-49.
BREAKOUT_VELOCITY_1H = 10.0
BREAKOUT_ZSCORE = 2.0
ANOMALY_THRESHOLD = 0.8
MIN_HISTORY_POINTS = 24  # z-score needs ≥24 hourly points


def velocity(
    counts: DataFrame,
    key_col: str = "keyword",
    bucket_col: str = "bucket",
    count_col: str = "cnt",
    window_hours: int = 1,
) -> DataFrame:
    """W1: adjacent-window velocity
    (advanced_trend_analyzer.py:148-169).

    velocity = (current − previous) / window_hours; a keyword with no
    previous window scores current×2.0 (the reference's "brand new"
    boost).  `lag` over (keyword, bucket) replaces the two Redis reads.
    """
    w = Window.partitionBy(key_col).orderBy(bucket_col)
    prev = F.lag(count_col).over(w)
    vel = F.when(prev.isNull(), F.col(count_col) * F.lit(2.0)).otherwise(
        (F.col(count_col) - prev) / F.lit(float(window_hours))
    )
    return counts.withColumn("velocity", vel)


def zscore_anomaly(
    counts: DataFrame,
    key_col: str = "keyword",
    bucket_col: str = "bucket",
    count_col: str = "cnt",
    history: int = 168,
    min_points: int = MIN_HISTORY_POINTS,
) -> DataFrame:
    """W2: z-score vs the trailing 7-day hourly history
    (advanced_trend_analyzer.py:171-197).

    z = (current − mean(history)) / std(history) over the previous
    `history` buckets (excluding current); anomaly = min(|z|/3, 1);
    requires ≥ min_points of history else 0.  Population std (the
    reference uses statistics.pstdev semantics via manual mean/std).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(-history, -1)
    )
    hist_mean = F.avg(count_col).over(w)
    hist_std = F.stddev_pop(count_col).over(w)
    hist_n = F.count(count_col).over(w)
    z = F.when(
        (hist_n >= min_points) & (hist_std > 0),
        (F.col(count_col) - hist_mean) / hist_std,
    ).otherwise(F.lit(0.0))
    out = counts.withColumn("zscore", z)
    return out.withColumn("anomaly", scoring.anomaly_score(F.col("zscore")))


def trend_direction(df: DataFrame, v1h: str = "velocity_1h", v6h: str = "velocity_6h") -> DataFrame:
    """W3: rising / falling / stable classifier
    (advanced_trend_analyzer.py:199-206)."""
    direction = (
        F.when((F.col(v1h) > 2) & (F.col(v6h) > 1), F.lit("rising"))
        .when((F.col(v1h) < -1) & (F.col(v6h) < -0.5), F.lit("falling"))
        .otherwise(F.lit("stable"))
    )
    return df.withColumn("direction", direction)


def compound_scored(
    df: DataFrame,
    count_1h: str = "cnt_1h",
    velocity_col: str = "velocity_1h",
    zscore_col: str = "zscore",
    count_6h: str = "cnt_6h",
    count_24h: str = "cnt_24h",
) -> DataFrame:
    """W4: normalized weighted compound score 0-100
    (advanced_trend_analyzer.py:208-236)."""
    return df.withColumn(
        "compound_score",
        scoring.compound_score(
            scoring.freq_score(F.col(count_1h)),
            scoring.velocity_score(F.col(velocity_col)),
            scoring.anomaly_score(F.col(zscore_col)),
            scoring.momentum_score(F.col(count_6h), F.col(count_24h)),
        ),
    )


def trending_ranking(df: DataFrame, limit: int, score_col: str = "compound_score",
                     key_col: str = "keyword") -> DataFrame:
    """W5: order by compound score desc, take top-k
    (advanced_trend_analyzer.py:288-312).  TakeOrderedAndProject —
    no global sort materialization."""
    return df.orderBy(F.col(score_col).desc(), F.col(key_col).asc()).limit(limit)


def rank_change(
    counts: DataFrame,
    snapshot_col: str = "bucket",
    key_col: str = "keyword",
    count_col: str = "cnt",
    fast_delta: int = 3,
) -> DataFrame:
    """W6: rank-change indicators between consecutive snapshots
    (realtime_keyword_aggregator.py:358-383).

    rank within each snapshot, lag to the previous snapshot's rank per
    keyword, then the reference's when-ladder:
    new / rising-fast / rising / falling-fast / falling / stable (±3).
    """
    rank_w = Window.partitionBy(snapshot_col).orderBy(
        F.col(count_col).desc(), F.col(key_col).asc()
    )
    ranked = counts.withColumn("rnk", F.row_number().over(rank_w))
    lag_w = Window.partitionBy(key_col).orderBy(snapshot_col)
    with_prev = ranked.withColumn("prev_rnk", F.lag("rnk").over(lag_w))
    delta = F.col("prev_rnk") - F.col("rnk")  # positive = moved up
    indicator = (
        F.when(F.col("prev_rnk").isNull(), F.lit("new"))
        .when(delta > fast_delta, F.lit("rising-fast"))
        .when(delta > 0, F.lit("rising"))
        .when(delta < -fast_delta, F.lit("falling-fast"))
        .when(delta < 0, F.lit("falling"))
        .otherwise(F.lit("stable"))
    )
    return with_prev.withColumn("indicator", indicator)


def timeline(
    counts: DataFrame,
    key_value: str,
    start_ts: str,
    end_ts: str,
    key_col: str = "keyword",
    bucket_col: str = "bucket",
    count_col: str = "cnt",
    step: str = "1 minute",
) -> DataFrame:
    """W8: dense per-minute series for one key over a range, missing
    minutes as 0 (advanced_trend_analyzer.py:314-329).

    The dense calendar comes from sequence+explode (a single tiny
    partition) left-joined against the sparse aggregate — never a
    per-minute query loop."""
    spark = counts.sparkSession
    calendar = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start_ts).cast("timestamp_ntz"),
                F.lit(end_ts).cast("timestamp_ntz"),
                F.expr(f"INTERVAL {step}"),
            )
        ).alias(bucket_col)
    )
    sparse = counts.filter(F.col(key_col) == key_value).select(bucket_col, count_col)
    return (
        calendar.join(sparse, bucket_col, "left")
        .select(
            F.col(bucket_col),
            F.coalesce(F.col(count_col), F.lit(0)).alias(count_col),
        )
        .orderBy(bucket_col)
    )


def multi_window_counts(
    hourly: DataFrame,
    as_of,
    key_col: str = "keyword",
    bucket_col: str = "bucket",
    count_col: str = "cnt",
    include_prev: bool = False,
) -> DataFrame:
    """A3 read side: counts over the trailing 1h/6h/24h/168h windows
    ending at `as_of`, per keyword — conditional aggregation in ONE
    pass over the hourly table (the reference does 4×24 zset reads
    per keyword, advanced_trend_analyzer.py:127-146).

    include_prev adds the ADJACENT-previous 1h and 6h window counts
    (for W1 velocity) in the same pass — still one scan, one shuffle.
    """
    as_of_ts = F.lit(as_of).cast("timestamp_ntz")

    def between(hours_back_start: int, hours_back_end: int):
        return (
            F.col(bucket_col) > as_of_ts - F.expr(f"INTERVAL {hours_back_start} HOURS")
        ) & (F.col(bucket_col) <= as_of_ts - F.expr(f"INTERVAL {hours_back_end} HOURS"))

    aggs = [
        F.sum(F.when(between(1, 0), F.col(count_col)).otherwise(0)).alias("cnt_1h"),
        F.sum(F.when(between(6, 0), F.col(count_col)).otherwise(0)).alias("cnt_6h"),
        F.sum(F.when(between(24, 0), F.col(count_col)).otherwise(0)).alias("cnt_24h"),
        F.sum(F.col(count_col)).alias("cnt_168h"),
    ]
    if include_prev:
        aggs += [
            F.sum(F.when(between(2, 1), F.col(count_col)).otherwise(0)).alias("prev_1h"),
            F.sum(F.when(between(12, 6), F.col(count_col)).otherwise(0)).alias("prev_6h"),
        ]
    return hourly.filter(between(168, 0)).groupBy(key_col).agg(*aggs)


def window_velocity(current: F.Column, previous: F.Column, hours: int) -> F.Column:
    """W1 velocity rule on window counts: (cur − prev)/hours, with the
    reference's brand-new boost cur×2.0 when there is no previous
    activity (advanced_trend_analyzer.py:148-169 returns the boost when
    the previous window count is 0)."""
    return F.when(previous == 0, current * 2.0).otherwise(
        (current - previous) / F.lit(float(hours))
    )


def cusum_changepoints(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    h_micro: int,
    k_micro: int = 0,
    mu_micro: int | None = None,
) -> DataFrame:
    """Two-sided CUSUM level-shift detection per key (Page 1954) —
    the sequential changepoint test zscore_anomaly can't give: a
    z-score flags single spikes against a rolling window, CUSUM
    accumulates SMALL persistent shifts until they cross `h` (the
    classic "metric quietly degraded 10%" detector for daily counts,
    error rates, CDC lag series).

    Exactness contract: values work in integer micros
    (``x_micro = value·1e6``).  The recursion
    ``s⁺_t = max(0, s⁺_{t−1} + x_t − μ − k)`` is NOT a window sum,
    but its closed form is: with prefix ``P_t = Σ_{j≤t}(x_j − μ − k)``
    and ``P_0 = 0``, ``s⁺_t = P_t − min(0, min_{j≤t} P_j)`` — one
    running sum + one running min, both plain window functions on
    every engine, all long arithmetic.  The downward side runs the
    same identity on ``μ − k − x``.  μ defaults to the per-key series
    mean, SIGN-SAFE exact integral division
    (``sign(Σx)·(|Σx| div n)`` — divide only the non-negative
    magnitude, so Spark's truncating ``div`` and a floor-division
    engine like DuckDB's ``//`` replay identically even when the
    series sum is negative; pass `mu_micro` to pin a reference level
    instead — the in-control mean from a calibration window, the
    usual SPC practice).

    Output: input rows + (mu_micro, s_plus_micro, s_minus_micro,
    flag_up, flag_down); flags fire where the statistic EXCEEDS
    h_micro.  Bound: |x|·1e6 must stay < 2^63/n per key.

    Shape: one keys-sized mean table (broadcast back), one
    key-partitioned window sort shared by both running aggregates —
    a single shuffle on the key, same layout a downstream per-key
    consumer needs."""
    if h_micro <= 0:
        raise ValueError("h_micro must be > 0")
    if k_micro < 0:
        raise ValueError("k_micro must be >= 0")
    keys = [F.col(c) for c in key_cols]
    x = (F.col(value_col).cast("long") * F.lit(1_000_000)).alias("_x")
    base = df.withColumn("_x", x)
    if mu_micro is None:
        mu = base.groupBy(*key_cols).agg(
            F.expr(
                "CASE WHEN sum(_x) >= 0 THEN sum(_x) div count(_x) "
                "ELSE -((-sum(_x)) div count(_x)) END"
            ).cast("long").alias("mu_micro")
        )
        base = base.join(F.broadcast(mu), key_cols)
    else:
        base = base.withColumn("mu_micro", F.lit(int(mu_micro)))
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    up = (F.col("_x") - F.col("mu_micro") - F.lit(int(k_micro)))
    dn = (F.col("mu_micro") - F.lit(int(k_micro)) - F.col("_x"))
    stepped = base.withColumn("_pu", F.sum(up).over(w)).withColumn(
        "_pd", F.sum(dn).over(w)
    )
    s_plus = F.col("_pu") - F.least(F.lit(0), F.min("_pu").over(w))
    s_minus = F.col("_pd") - F.least(F.lit(0), F.min("_pd").over(w))
    return (
        stepped.withColumn("s_plus_micro", s_plus.cast("long"))
        .withColumn("s_minus_micro", s_minus.cast("long"))
        .withColumn("flag_up", F.col("s_plus_micro") > F.lit(int(h_micro)))
        .withColumn("flag_down", F.col("s_minus_micro") > F.lit(int(h_micro)))
        .drop("_x", "_pu", "_pd")
    )


def seasonal_anomaly(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    min_points: int = 3,
    micro: int = 1_000_000,
) -> DataFrame:
    """Same-slot seasonal anomaly score: each observation is compared
    to the OTHER observations of its (key, day-of-week, hour-of-day)
    slot — the daily/weekly-rhythm-aware complement of
    `zscore_anomaly` (trailing window: flags level changes) and
    `cusum_changepoints` (persistent small shifts): Monday-9am traffic
    is judged against other Monday-9ams, so a quiet weekend never
    drags the baseline of a busy weekday.

    Leave-one-out: the point under test is EXCLUDED from its own
    baseline (mean/variance from slot sums minus the point), so a
    single extreme value cannot mask itself.  Slots are pure integer
    arithmetic on epoch microseconds (day index mod 7, hour mod 24 —
    no calendar/locale seam; dow 0 = Thursday, the 1970-01-01 epoch
    anchor).

    Exactness: values quantize to integer micros (one explicit seam);
    per-slot Σx and Σx² are exact DECIMAL(38,0) sums; mean/var/z are
    fixed IEEE expressions over those exact integers — bit-for-bit on
    any engine (the corr_matrix contract).  z = 0 when the slot has
    < min_points peers or zero peer variance.

    Plan shape: ONE window partitioned by (key, slot) — no order, no
    sort spill — over rows carrying an 8-byte quantized value; no
    second scan, no join.

    Output: input rows + (slot_dow, slot_hour, n_slot, z) with z the
    leave-one-out standard score.
    """
    if micro < 1:
        raise ValueError("micro must be >= 1")
    us = f"unix_micros(CAST({ts_col} AS TIMESTAMP))"
    qx = F.expr(f"CAST(round({value_col} * {micro}, 0) AS BIGINT)")
    dow = F.expr(f"CAST(({us} div 86400000000) % 7 AS INT)")
    hour = F.expr(f"CAST(({us} div 3600000000) % 24 AS INT)")
    base = df.withColumn("slot_dow", dow).withColumn(
        "slot_hour", hour
    ).withColumn("_qx", qx)
    w = Window.partitionBy(*key_cols, "slot_dow", "slot_hour")
    dec = "decimal(38,0)"
    g = F.col("_qx").cast(dec)
    sized = base.withColumn("_s", F.sum(g).over(w)) \
        .withColumn("_q", F.sum(g * F.col("_qx")).over(w)) \
        .withColumn("_n", F.count("_qx").over(w))
    # leave-one-out moments — fixed IEEE expression over exact sums,
    # mirrored verbatim by the oracle
    d = (F.col("_n") - 1).cast("double")
    x = F.col("_qx").cast("double")
    m = (F.col("_s").cast("double") - x) / d
    var = (F.col("_q").cast("double") - x * x) / d - m * m
    z = F.when(
        F.col("_qx").isNull(), F.lit(None).cast("double")
    ).when(
        (F.col("_n") - 1 >= min_points) & (var > 0),
        (x - m) / F.sqrt(var),
    ).otherwise(F.lit(0.0))
    return sized.withColumn("n_slot", F.col("_n")).withColumn(
        "z", z
    ).drop("_qx", "_s", "_q", "_n")


def ewma(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alpha_ppm: int = 200_000,
    state: DataFrame | None = None,
) -> DataFrame:
    """Exponentially weighted moving average per key — the SPC
    smoother next to `cusum_changepoints` (Roberts 1959; the EWMA
    control-chart statistic), as an EXACT integer recursion with no
    IEEE seam anywhere:

        x_micro = round(value·1e6);  s_1 = x_1
        s_t = trunc((α·x_t + (1e6 − α)·s_{t−1}) / 1e6),  α = alpha_ppm

    Division TRUNCATES toward zero — the semantics Spark's ``div``
    and DuckDB's integer ``//`` share — implemented sign-safely in
    the kernel (negate, floor-divide the magnitude, negate back), so
    negative series replay identically on every engine (the cusum
    sign-trap class, closed by construction).  resid_micro = x_t − s_{t−1} (0 at
    the first point) is the one-step-ahead residual the control
    chart thresholds.

    A sequential recursion is NOT a window function (the
    s_{t−1} coefficient (1−α) compounds), so this is the engine's
    documented Arrow seam: one `applyInPandas` per key group with a
    Python big-int loop — exact at any magnitude, and the ONLY
    non-columnar hot path in the trends module.  Rows with NULL
    values are excluded (they have no place in a recursion; profile
    them upstream).  Bound: |value|·1e6 must fit BIGINT.

    Shape: one key-partitioned shuffle (the applyInPandas exchange);
    each group sorts its own rows by `order_cols` inside the kernel.
    100 TB: state per key is one running integer — group size is the
    SERIES length, so shard long series by (key, coarse window) and
    CHAIN the last s across shards via `state`: a frame of
    ``key_cols + ewma_micro`` (at most one row per key — exactly the
    shape `make_ewma_sink` persists per batch) seeds each key's
    recursion as its s_0, so the first sharded row gets a true
    residual (x_1 − s_0) instead of a cold start, and a two-shard
    chained run is BIT-EQUAL to the one-shot kernel (pytest-pinned).
    Keys absent from `state` start cold; the state join is keys-sized
    and Catalyst picks its strategy."""
    if not 0 < alpha_ppm <= 1_000_000:
        raise ValueError("alpha_ppm must be in (0, 1e6]")
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    import pandas as pd

    keys = list(key_cols)
    order = list(order_cols)
    a = int(alpha_ppm)
    base = df.filter(F.col(value_col).isNotNull()).withColumn(
        "_xm",
        F.expr(f"CAST(round({value_col} * 1000000, 0) AS BIGINT)"),
    )
    if state is not None:
        missing = {*keys, "ewma_micro"} - set(state.columns)
        if missing:
            raise ValueError(f"state frame lacks columns {sorted(missing)}")
        seed = state.select(
            *keys, F.col("ewma_micro").cast("bigint").alias("_s0")
        )
        base = base.join(seed, keys, "left_outer")
    else:
        base = base.withColumn("_s0", F.lit(None).cast("bigint"))
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in base.schema.fields
    )
    out_schema = f"{fields}, ewma_micro bigint, resid_micro bigint"

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        s0 = pdf["_s0"].iloc[0]
        s = None if pd.isna(s0) else int(s0)
        sm, rm = [], []
        for x in pdf["_xm"]:
            xi = int(x)
            if s is None:
                rm.append(0)
                s = xi
            else:
                rm.append(xi - s)
                num = a * xi + (1_000_000 - a) * s
                s = (
                    num // 1_000_000 if num >= 0
                    else -((-num) // 1_000_000)
                )
            sm.append(s)
        pdf["ewma_micro"] = pd.Series(sm, dtype="int64")
        pdf["resid_micro"] = pd.Series(rm, dtype="int64")
        return pdf

    return base.groupBy(*keys).applyInPandas(kernel, out_schema) \
        .drop("_xm", "_s0")


def holt_smoothing(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alpha_ppm: int = 200_000,
    beta_ppm: int = 100_000,
    state: DataFrame | None = None,
) -> DataFrame:
    """Holt linear-trend (double exponential) smoothing per key —
    `ewma`'s sibling for series with drift (Holt 1957): level AND
    trend states, same exact integer-micro recursion contract
    (sign-safe truncating division, no IEEE seam, engine-replayable
    by a recursive CTE):

        s_1 = x_1,  b_1 = 0
        s_t = trunc((α·x_t + (1e6−α)·(s_{t−1} + b_{t−1})) / 1e6)
        b_t = trunc((β·(s_t − s_{t−1}) + (1e6−β)·b_{t−1}) / 1e6)

    Output adds (level_micro, trend_micro, forecast_micro) —
    forecast = s_t + b_t, the one-step-ahead prediction whose
    residual against x_{t+1} is the drift-aware anomaly signal
    (`ewma`'s residual lags under trend; this one doesn't).  b_1 = 0
    is the documented initialization (warm-up bias decays at rate
    1−β; pin a calibration window upstream if the first points
    matter).  NULL values excluded; |value|·1e6 must fit BIGINT.

    Shape: identical to `ewma` — one key-partitioned applyInPandas,
    two running integers of state per key.  `state` chains shards the
    same way: a frame of ``key_cols + level_micro + trend_micro`` (at
    most one row per key — the columns this operator itself outputs,
    so shard N+1 seeds from shard N's last row) resumes each key's
    (s, b) recursion exactly; chained ≡ one-shot is pytest-pinned."""
    if not 0 < alpha_ppm <= 1_000_000:
        raise ValueError("alpha_ppm must be in (0, 1e6]")
    if not 0 <= beta_ppm <= 1_000_000:
        raise ValueError("beta_ppm must be in [0, 1e6]")
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    import pandas as pd

    keys, order = list(key_cols), list(order_cols)
    a, bt = int(alpha_ppm), int(beta_ppm)

    def tdiv(num: int) -> int:
        return num // 1_000_000 if num >= 0 else -((-num) // 1_000_000)

    base = df.filter(F.col(value_col).isNotNull()).withColumn(
        "_xm",
        F.expr(f"CAST(round({value_col} * 1000000, 0) AS BIGINT)"),
    )
    if state is not None:
        missing = {*keys, "level_micro", "trend_micro"} - set(state.columns)
        if missing:
            raise ValueError(f"state frame lacks columns {sorted(missing)}")
        seed = state.select(
            *keys,
            F.col("level_micro").cast("bigint").alias("_l0"),
            F.col("trend_micro").cast("bigint").alias("_b0"),
        )
        base = base.join(seed, keys, "left_outer")
    else:
        base = base.withColumn("_l0", F.lit(None).cast("bigint")) \
            .withColumn("_b0", F.lit(None).cast("bigint"))
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in base.schema.fields
    )
    out_schema = (
        f"{fields}, level_micro bigint, trend_micro bigint, "
        "forecast_micro bigint"
    )

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        l0 = pdf["_l0"].iloc[0]
        if pd.isna(l0):
            s = b = None
        else:
            s, b = int(l0), int(pdf["_b0"].iloc[0])
        ls, ts, fs = [], [], []
        for x in pdf["_xm"]:
            xi = int(x)
            if s is None:
                s, b = xi, 0
            else:
                prev = s
                s = tdiv(a * xi + (1_000_000 - a) * (s + b))
                b = tdiv(bt * (s - prev) + (1_000_000 - bt) * b)
            ls.append(s)
            ts.append(b)
            fs.append(s + b)
        pdf["level_micro"] = pd.Series(ls, dtype="int64")
        pdf["trend_micro"] = pd.Series(ts, dtype="int64")
        pdf["forecast_micro"] = pd.Series(fs, dtype="int64")
        return pdf

    return base.groupBy(*keys).applyInPandas(kernel, out_schema) \
        .drop("_xm", "_l0", "_b0")


def forecast_backtest(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alpha_ppm: int = 200_000,
    beta_ppm: int | None = None,
) -> DataFrame:
    """Rolling-origin ONE-STEP-AHEAD backtest of the integer
    smoothers — the evaluation loop that turns `ewma`/`holt_smoothing`
    from transforms into a defensible forecasting choice: for each
    point t ≥ 2 the prediction is the state BEFORE t (EWMA s_{t−1};
    Holt s_{t−1} + b_{t−1} when `beta_ppm` is given), and the per-key
    report aggregates exact integer errors:

        n_eval      points with a prior-state prediction
        mae_micro   Σ|err| div n (err in micro units)
        bias_micro  sign-safe Σerr div n (positive = under-forecast)
        mape_ppm    mean of per-point |err|·1e6 div |x| over x ≠ 0
                    (n_mape counts them) — exact integer throughout

    No IEEE seam anywhere: the smoother recursion is integer, the
    errors are integer differences, the means are sign-safe truncating
    divisions — the report replays on any engine.

    Shape: the smoother's cost + one key-ordered lag window (same
    partitioning) + one keys-sized aggregate."""
    if (beta_ppm is None and alpha_ppm is None):
        raise ValueError("alpha_ppm required")
    if beta_ppm is None:
        sm = ewma(df, key_cols, order_cols, value_col, alpha_ppm)
        pred_state = F.col("ewma_micro")
    else:
        sm = holt_smoothing(
            df, key_cols, order_cols, value_col, alpha_ppm, beta_ppm
        )
        pred_state = F.col("forecast_micro")
    keys = [F.col(c) for c in key_cols]
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    xm = F.expr(f"CAST(round({value_col} * 1000000, 0) AS BIGINT)")
    stepped = sm.withColumn("_xm", xm).withColumn(
        "_pred", F.lag(pred_state).over(w)
    )
    ev = stepped.filter(F.col("_pred").isNotNull()).withColumn(
        "_err", F.col("_xm") - F.col("_pred")
    )
    sdiv = (
        "CASE WHEN {n} >= 0 THEN {n} div {d} "
        "ELSE -((-({n})) div {d}) END"
    )
    return ev.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.expr(
            sdiv.format(n="sum(abs(_err))", d="count(1)")
        ).cast("long").alias("mae_micro"),
        F.expr(
            sdiv.format(n="sum(_err)", d="count(1)")
        ).cast("long").alias("bias_micro"),
        F.count(F.when(F.col("_xm") != 0, 1)).cast("long")
        .alias("n_mape"),
        F.expr(
            "CASE WHEN count(CASE WHEN _xm != 0 THEN 1 END) > 0 THEN "
            "sum(CASE WHEN _xm != 0 THEN "
            "(abs(_err) * CAST(1000000 AS BIGINT)) div abs(_xm) END) "
            "div count(CASE WHEN _xm != 0 THEN 1 END) "
            "ELSE NULL END"
        ).cast("long").alias("mape_ppm"),
    )

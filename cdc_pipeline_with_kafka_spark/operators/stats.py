"""Hypothesis-testing / association statistics over CDC streams and
corpus tables (SURVEY.md §4 scale extensions; reference analogue: the
ad-hoc drift eyeballing the trend analyzer does by re-reading Redis
counters, advanced_trend_analyzer.py — here made into first-class,
exactly-reproducible reports).

The exactness contract follows the engine's house pattern: inputs
quantize to integers at ONE explicit seam, every aggregate is an exact
integer (BIGINT / DECIMAL(38,0)) sum over those integers, and any final
float step is a single fixed IEEE expression over exact sums (sqrt is
correctly rounded by IEEE 754, so even that step reproduces
bit-for-bit on any engine — the corr_matrix contract, sketch.py).

Operators:

- ``ks_drift``: exact two-sample Kolmogorov–Smirnov distance between
  the distributions of a numeric column on two row slices — the
  distribution-shift companion to PSI (classify.psi_report): PSI needs
  a bucketing choice, KS does not, and KS localizes WHERE the
  distributions diverge (the returned cut value).
- ``chi2_association``: chi-square statistic + Cramér's V between two
  categorical columns — "is event_type independent of source?", the
  pre-training feature-redundancy / leakage screen for categorical
  features (corr_matrix covers the numeric ones).
- ``benford_report``: first-significant-digit distribution vs
  Benford's law — the classic fabricated-numbers / broken-upstream
  data-quality screen for value-like columns (amounts, counts).
- ``ols_by_group``: per-group least-squares fit y ~ x (slope,
  intercept, r²) from one pass of exact co-moment sums — the
  continuous trend estimator behind trends.trend_direction's
  categorical label.  Split into ``ols_comoments`` /
  ``merge_comoments`` / ``ols_from_comoments`` because the co-moment
  table is exactly mergeable across shards and micro-batches (the
  streaming co-moment sink's contract).
- ``theil_sen_by_group``: the robust sibling — median pairwise slope
  (~29% breakdown point), O(n²) per group with a loud guard.
- ``km_survival``: Kaplan–Meier curves with censoring — survival by
  an integer floor recurrence, no exp/ln seam.
- ``abtest_report``: two-proportion lift + pooled z per variant vs
  control, exact ppm lifts.
- ``mutual_information_report`` (+ pure ``mi_core``): MI/NMI of
  categorical features vs a label, computed driver-side from
  cells-sized counts so the number replays exactly off-Spark.
- ``ks_core``: pure-Python twin of ks_drift over count maps — the
  per-batch statistic of the streaming drift sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DEC = "decimal(38,0)"

# floor/round of 1e6·log10(1 + 1/d) — they agree at this precision and
# the nine constants sum to exactly 1_000_000, so Σ dev_ppm over the
# digits is exactly −(ppm mass on digits that never occur).
_BENFORD_PPM = {
    1: 301_030, 2: 176_091, 3: 124_939, 4: 96_910, 5: 79_181,
    6: 66_947, 7: 57_992, 8: 51_153, 9: 45_757,
}


def _is_fractional(df: DataFrame, col: str) -> bool:
    """True when `col` is a continuous numeric type (float/double, or
    decimal with scale > 0) — the types whose distinct count grows
    unboundedly with row count and therefore get the ks_drift
    auto-quantize treatment by default."""
    from pyspark.sql.types import DecimalType, DoubleType, FloatType

    dt = df.schema[col].dataType
    return isinstance(dt, (DoubleType, FloatType)) or (
        isinstance(dt, DecimalType) and dt.scale > 0
    )


def _drop_nan(df: DataFrame, col: str) -> DataFrame:
    """Filter NaN rows from a float/double column (no-op for every
    other type — decimals cannot hold NaN).  NaN is treated as
    missing data, like NULL: it has no place in a CDF ordering, and
    a single NaN would otherwise poison min/max aggregates (Spark
    max returns NaN) and silently disable the ks_drift quantize
    grid.  Monitor the NaN RATE separately (table_profile / dq
    rules) — it is a real drift signal, just not a KS one."""
    from pyspark.sql.types import DoubleType, FloatType

    if isinstance(df.schema[col].dataType, (DoubleType, FloatType)):
        return df.filter(~F.isnan(col))
    return df


def _require_finite_range(lo: float, hi: float, what: str) -> None:
    """Loud ±Inf rejection for equal-width grids: width=inf collapses
    every finite value into cell 0 and silently degenerates the
    statistic.  Winsorize / filter infinities upstream."""
    import math

    if not (math.isfinite(lo) and math.isfinite(hi)):
        raise ValueError(
            f"{what}: observed range [{lo}, {hi}] is not finite — an "
            "equal-width quantize grid over an infinite range is "
            "degenerate; winsorize or filter ±Inf upstream (NaN is "
            "already dropped as missing data)"
        )


def ks_drift(
    df: DataFrame,
    value_col: str,
    side_col: str,
    side_a,
    side_b,
    max_distinct_values: int | None = None,
    auto_quantize_cells: int | None = 100_000,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov distance between the
    `value_col` distributions of the `side_col == side_a` and
    `side_col == side_b` slices: D = sup_x |F_a(x) − F_b(x)|, reported
    as exact integer ppm together with the value at which the supremum
    is attained (the smallest such value — deterministic under ties).

    For step CDFs the supremum is attained at a pooled data point with
    both CDFs evaluated right-inclusively, so it is EXACT integer
    arithmetic end to end: at each distinct value,
    |cum_a·n_b − cum_b·n_a| (DECIMAL(38,0), no overflow to ~1e19 rows
    a side), maximized by one TakeOrdered(1).

    Plan shape: one groupBy to DISTINCT-VALUE granularity (map-side
    combined — the shuffle carries distinct values, not rows), then a
    SinglePartition cumulative window over those distinct values.
    That window is the scale knob, and the contract is ENFORCED BY
    DEFAULT for continuous columns: when `value_col` is fractional
    (float/double/decimal with scale > 0), values are auto-quantized
    onto an equal-width grid of `auto_quantize_cells` cells between
    the observed min and max (one extra cheap min/max job), so the
    distinct-value frame is bounded no matter the input cardinality —
    KS on a quantized grid is the standard streaming form and
    lower-bounds the exact D by at most one grid cell of CDF mass;
    `at_value` then reports the CELL LOWER EDGE as a double.
    `auto_quantize_cells=None` opts out (exact raw-value KS — only
    safe when the column's distinct count is known-bounded).  Integer
    / date / string columns never quantize (their distinct grain IS
    the exact statistic).  `max_distinct_values` additionally makes
    the bound a loud guard: one extra count over the (already
    combined, post-quantize) distinct frame, ValueError past the
    bound — the equi_depth_histogram guardrail pattern.

    Non-finite values: NaN rows are dropped like NULLs on both paths
    (a CDF has no NaN position; monitor NaN rate via table_profile),
    and ±Inf raises loudly when quantizing (an equal-width grid over
    an infinite range is degenerate — winsorize first; the exact
    opt-out path still orders ±Inf correctly).

    Output (one row): (n_a, n_b, at_value, d_ppm); empty frame if no
    rows land on either side.
    """
    v, s = F.col(value_col), F.col(side_col)
    rows = df.filter(v.isNotNull() & s.isin([side_a, side_b])).select(
        v.alias("_v"),
        F.when(s == F.lit(side_a), F.lit(1)).otherwise(F.lit(0)).alias("_ia"),
    )
    if _is_fractional(df, value_col):
        # NaN ≙ NULL: dropped from the statistic on BOTH the quantized
        # and the exact path, so opting out of the grid never changes
        # NaN semantics (and a NaN can't poison min/max below).
        rows = _drop_nan(rows, "_v")
    if auto_quantize_cells is not None and _is_fractional(df, value_col):
        if auto_quantize_cells < 2:
            raise ValueError("auto_quantize_cells must be >= 2")
        mm = rows.agg(F.min("_v").alias("lo"), F.max("_v").alias("hi")) \
            .collect()[0]
        if mm["lo"] is not None:
            _require_finite_range(
                float(mm["lo"]), float(mm["hi"]), "ks_drift auto-quantize"
            )
        if mm["lo"] is not None and float(mm["hi"]) > float(mm["lo"]):
            lo, hi = float(mm["lo"]), float(mm["hi"])
            cells = int(auto_quantize_cells)
            width = (hi - lo) / cells
            cell = F.least(
                F.lit(cells - 1),
                F.floor(
                    (F.col("_v").cast("double") - F.lit(lo)) / F.lit(width)
                ).cast("long"),
            )
            rows = rows.select(
                (F.lit(lo) + cell.cast("double") * F.lit(width)).alias("_v"),
                "_ia",
            )
    per_v = rows.groupBy("_v").agg(
        F.sum("_ia").cast(_DEC).alias("_ca"),
        F.sum(1 - F.col("_ia")).cast(_DEC).alias("_cb"),
    )
    if max_distinct_values is not None:
        per_v = per_v.localCheckpoint(eager=True)
        n_distinct = per_v.count()
        if n_distinct > max_distinct_values:
            raise ValueError(
                f"ks_drift: {n_distinct} distinct values exceed "
                f"max_distinct_values={max_distinct_values} — quantize "
                "the column first (round / bucket); the cumulative CDF "
                "window is SinglePartition over distinct values"
            )
    w_cum = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per_v.select(
        "_v",
        F.sum("_ca").over(w_cum).alias("_cuma"),
        F.sum("_cb").over(w_cum).alias("_cumb"),
        F.sum("_ca").over(w_all).alias("_na"),
        F.sum("_cb").over(w_all).alias("_nb"),
    )
    d = F.abs(F.col("_cuma") * F.col("_nb") - F.col("_cumb") * F.col("_na"))
    return (
        cum.select("_v", "_na", "_nb", d.alias("_d"))
        .orderBy(F.col("_d").desc(), F.col("_v").asc())
        .limit(1)
        .select(
            F.col("_na").cast("long").alias("n_a"),
            F.col("_nb").cast("long").alias("n_b"),
            F.col("_v").alias("at_value"),
            F.when(
                (F.col("_na") > 0) & (F.col("_nb") > 0),
                F.expr("CAST(_d * 1000000 div (_na * _nb) AS BIGINT)"),
            ).otherwise(F.lit(0)).alias("d_ppm"),
        )
    )


def chi2_association(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Chi-square independence statistic + Cramér's V between two
    categorical columns, total over the frame: rows where either side
    is NULL are counted in `n_excluded` (the pr_report totality
    contract), never silently dropped.

    Exactness: the contingency table is exact counts; the statistic is
    computed in the ``Σ o²/e − n`` form — cells with o = 0 contribute
    ZERO there, so the groupBy's absent zero-cells are handled by
    construction (the (o−e)²/e form would need their e mass
    materialized).  Each observed cell's term is the exact integer ppm
    ``o²·n·1e6 div (r·c)`` in DECIMAL(38,0) — both engines floor per
    cell identically, so chi2_ppm = Σ cell_ppm − n·1e6 is EXACT (no
    float-accumulation-order seam; flooring biases down < 1 ppm/cell).
    Cramér's V is then ONE fixed IEEE expression over exact integers
    (a division and a correctly-rounded sqrt), floored to ppm.
    Overflow bound: o²·n·1e6 must fit DECIMAL(38,0), i.e.
    n·max(o)² < 1e32 — holds to ~1e10 rows; past that pre-aggregate
    per shard and chi-square the merged exact cells (the table is
    cells-sized and mergeable).

    Plan shape: ONE scan — one groupBy(a, b) with map-side combine
    (the shuffle carries CELLS, not rows; NULL-keyed cells ride along
    as ordinary groups), then three windows over the cells-sized frame
    (NULL cells contribute nothing to r/c/n via conditional sums) and
    one global aggregate of it — nothing downstream of the first
    shuffle ever touches row-grain data, and n_excluded comes from the
    same cells frame instead of a second scan.

    Output (one row): (n, n_excluded, n_cells, card_a, card_b, dof,
    chi2_ppm [DECIMAL(38,0) — may exceed BIGINT at extreme skew],
    cramers_v_ppm).
    """
    a, b = F.col(col_a), F.col(col_b)
    cells = df.groupBy(
        a.alias("_a"), b.alias("_b")
    ).agg(F.count(F.lit(1)).cast(_DEC).alias("_o"))
    valid = F.col("_a").isNotNull() & F.col("_b").isNotNull()
    vo = F.when(valid, F.col("_o"))
    w_a = Window.partitionBy("_a")
    w_b = Window.partitionBy("_b")
    w_all = Window.partitionBy()
    sized = cells.select(
        "_a", "_b", "_o", valid.alias("_valid"),
        F.sum(vo).over(w_a).alias("_r"),
        F.sum(vo).over(w_b).alias("_c"),
        F.sum(vo).over(w_all).alias("_n"),
    )
    per_cell = sized.select(
        "_n", "_a", "_b", "_valid", "_o",
        (F.col("_o") * F.col("_o") * F.col("_n")
         * F.lit(1_000_000).cast(_DEC)).alias("_num"),
        (F.col("_r") * F.col("_c")).alias("_den"),
    ).select(
        "_n", "_a", "_b", "_valid", "_o",
        F.when(
            F.col("_valid"),
            F.expr("CAST(_num div _den AS DECIMAL(38,0))"),
        ).alias("_cell_ppm"),
    )
    out = per_cell.agg(
        F.max(F.when(F.col("_valid"), F.col("_n"))).alias("_n"),
        F.coalesce(
            F.sum(F.when(~F.col("_valid"), F.col("_o"))),
            F.lit(0).cast(_DEC),
        ).alias("_nex"),
        F.count(F.when(F.col("_valid"), F.lit(1))).alias("n_cells"),
        F.countDistinct(F.when(F.col("_valid"), F.col("_a")))
        .alias("card_a"),
        F.countDistinct(F.when(F.col("_valid"), F.col("_b")))
        .alias("card_b"),
        F.sum("_cell_ppm").alias("_sum_ppm"),
    ).withColumn(
        # clamp: per-cell flooring biases down, so a near-independent
        # table can land a few ppm below n·1e6 — true chi² is ≥ 0
        "chi2_ppm",
        F.expr(
            "CAST(greatest(_sum_ppm - _n * 1000000, 0) AS DECIMAL(38,0))"
        ),
    )
    mindof = F.least(F.col("card_a") - 1, F.col("card_b") - 1)
    v_arg = (
        F.col("chi2_ppm").cast("double")
        / (F.lit(1_000_000.0) * F.col("_n").cast("double")
           * mindof.cast("double"))
    )
    return out.select(
        F.col("_n").cast("long").alias("n"),
        F.col("_nex").cast("long").alias("n_excluded"),
        F.col("n_cells").cast("long").alias("n_cells"),
        F.col("card_a").cast("long").alias("card_a"),
        F.col("card_b").cast("long").alias("card_b"),
        ((F.col("card_a") - 1) * (F.col("card_b") - 1))
        .cast("long").alias("dof"),
        "chi2_ppm",
        F.when(
            (mindof > 0) & (F.col("_n") > 0),
            F.floor(F.lit(1_000_000.0) * F.sqrt(v_arg)),
        ).otherwise(F.lit(0)).cast("long").alias("cramers_v_ppm"),
    )


def benford_report(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    scale: int = 100,
) -> DataFrame:
    """First-significant-digit distribution of `value_col` against
    Benford's law — the data-quality screen for naturally-spanning
    magnitudes (transaction amounts, populations, view counts):
    fabricated or truncated upstream feeds bend the digit curve long
    before any per-column min/max profile notices.

    The digit is extracted EXACTLY: v → |round(v·scale)| as BIGINT
    (scale=100 ⇒ cents — the one quantization seam), zeros dropped,
    first character of the decimal rendering (both engines render
    BIGINT identically — no float log10 edge cases).  Expected shares
    are the fixed ppm constants of log10(1+1/d), which sum to exactly
    1e6.  All output numbers are exact integers.

    Plan shape: one groupBy((groups), digit) with map-side combine,
    one window over the ≤9-rows-per-group frame, one broadcast join
    against the 9-row digit spine so absent digits report cnt=0 (a
    missing digit is the loudest Benford signal — it must be a row,
    not an absence).  Magnitude bound: |v|·scale must fit BIGINT
    (~9.2e18) — under ANSI mode a larger value raises at the cast
    (loud, correct); drop `scale` for astronomical units.

    Output: one row per (group, digit 1..9): (…group, digit, cnt, n,
    obs_ppm, exp_ppm, dev_ppm) — dev_ppm = obs − exp.
    """
    groups = list(group_cols or [])
    x = F.abs(F.expr(f"CAST(round({value_col} * {scale}, 0) AS BIGINT)"))
    rows = df.filter(F.col(value_col).isNotNull()).select(
        *groups, x.alias("_x")
    ).filter(F.col("_x") > 0)
    digit = F.substring(F.col("_x").cast("string"), 1, 1).cast("int")
    counts = rows.select(*groups, digit.alias("digit")).groupBy(
        *groups, "digit"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    spark = df.sparkSession
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    gkeys = (
        counts.select(*groups).distinct()
        if groups
        else spark.range(1).select(F.lit(1).alias("_one"))
    )
    full = gkeys.crossJoin(F.broadcast(spine))
    joined = full.join(counts, [*groups, "digit"] if groups else ["digit"],
                       "left").select(
        *groups, "digit",
        F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
    )
    w_g = Window.partitionBy(*groups) if groups else Window.partitionBy()
    exp_ppm = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _BENFORD_PPM.items() for x in kv]
        ),
        F.col("digit"),
    )
    return joined.select(
        *groups, "digit", "cnt",
        F.sum("cnt").over(w_g).alias("n"),
        exp_ppm.cast("long").alias("exp_ppm"),
    ).select(
        *groups, "digit", "cnt", "n",
        F.when(
            F.col("n") > 0,
            F.expr("CAST(cnt * 1000000 div n AS BIGINT)"),
        ).otherwise(F.lit(0)).alias("obs_ppm"),
        "exp_ppm",
    ).withColumn("dev_ppm", F.col("obs_ppm") - F.col("exp_ppm"))


def ols_by_group(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str],
    micro: int = 1_000_000,
) -> DataFrame:
    """Per-group ordinary least squares y ~ x: slope, intercept and r²
    from ONE pass of exact co-moment sums — the continuous trend
    estimator (how fast is each event type's daily volume growing,
    and how linear is it?) behind trends.trend_direction's
    categorical up/flat/down label.

    Exactness contract (corr_matrix's, sketch.py): x and y quantize to
    integer micros at one explicit seam; (n, Σx, Σy, Σxy, Σx², Σy²)
    are exact DECIMAL(38,0) sums — order-free, shard-mergeable; the
    closed-form slope/intercept/r² are fixed IEEE-double expressions
    over those exact sums (divisions only), bit-reproducible on any
    engine.  Rows with a NULL on either side are dropped per group
    (pairwise-complete).  Overflow: n·Σxy inside DECIMAL(38,0) —
    |v·micro| ≤ 1e12 to ~1e12 rows per group; drop `micro` past that.

    Plan shape: one partial-aggregated groupBy on the group keys (the
    shuffle carries 6 decimal sums per group, not rows) and a final
    projection.  No windows, no second scan.

    Output: (…group, n, slope, intercept, r2) — slope/intercept in
    ORIGINAL units; NULL slope/r² for degenerate groups (n < 2 or
    zero x-variance).
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if micro < 1:
        raise ValueError("micro must be >= 1")
    return ols_from_comoments(
        ols_comoments(df, x_col, y_col, group_cols, micro),
        group_cols, micro,
    )


def ols_comoments(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str],
    micro: int = 1_000_000,
) -> DataFrame:
    """The exact co-moment table behind `ols_by_group`, exposed
    because it is MERGEABLE: (n, Σx, Σy, Σxy, Σx², Σy²) per group as
    DECIMAL(38,0) — order-free integer sums, so tables from different
    shards / micro-batches merge by plain addition
    (`merge_comoments`) with NO loss, and the fit finishes later via
    `ols_by_group`'s closed form.  This is what the streaming
    co-moment sink persists per batch.

    Output: group_cols + (_n, _sx, _sy, _sxy, _sxx, _syy)."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if micro < 1:
        raise ValueError("micro must be >= 1")
    qx = F.expr(f"CAST(round({x_col} * {micro}, 0) AS BIGINT)")
    qy = F.expr(f"CAST(round({y_col} * {micro}, 0) AS BIGINT)")
    rows = df.select(
        *group_cols, qx.alias("_qx"), qy.alias("_qy")
    ).filter(F.col("_qx").isNotNull() & F.col("_qy").isNotNull())
    gx, gy = F.col("_qx").cast(_DEC), F.col("_qy").cast(_DEC)
    return rows.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast(_DEC).alias("_n"),
        F.sum(gx).alias("_sx"),
        F.sum(gy).alias("_sy"),
        F.sum(gx * F.col("_qy")).alias("_sxy"),
        F.sum(gx * F.col("_qx")).alias("_sxx"),
        F.sum(gy * F.col("_qy")).alias("_syy"),
    )


def merge_comoments(
    comoments: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Merge co-moment tables from shards / micro-batches: plain
    per-group DECIMAL sums — exact, associative, commutative, so ANY
    merge order gives the identical table (the incremental ≡ one-shot
    theorem the sink tests pin)."""
    sums = [
        F.coalesce(F.sum(c), F.lit(0).cast(_DEC)).alias(c)
        for c in ("_n", "_sx", "_sy", "_sxy", "_sxx", "_syy")
    ]
    return comoments.groupBy(*group_cols).agg(*sums)


def ols_from_comoments(
    comoments: DataFrame,
    group_cols: list[str],
    micro: int = 1_000_000,
) -> DataFrame:
    """Finish an OLS fit from a (possibly merged) co-moment table —
    the same closed form `ols_by_group` applies, split out so rolling
    tables maintained by the streaming sink can be fit WITHOUT ever
    rescanning rows.  `micro` must match the quantization the
    co-moments were built with."""
    num = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
    vx = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
    vy = (F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy"))
    slope = F.when(vx > 0, num.cast("double") / vx.cast("double"))
    intercept = F.when(
        vx > 0,
        (F.col("_sy").cast("double") - slope * F.col("_sx").cast("double"))
        / F.col("_n").cast("double") / F.lit(float(micro)),
    )
    r2 = F.when(
        (vx > 0) & (vy > 0),
        (num.cast("double") * num.cast("double"))
        / (vx.cast("double") * vy.cast("double")),
    )
    return comoments.select(
        *group_cols,
        F.col("_n").cast("long").alias("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def km_survival(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Kaplan–Meier survival curve per group — the time-to-event view
    behind cohort_retention's fixed-offset matrix (time-to-convert,
    time-to-churn, time-to-first-alert), with CENSORING handled
    correctly: a unit observed for 10 days without converting is
    evidence about days 0–10, not a conversion failure at day 10.

    Semantics: one input row per unit; `duration_col` is the
    time-on-study (quantize to a coarse unit — hours/days — upstream:
    distinct durations per group is the state size), `event_col`
    truthy = the event fired at that duration, falsy = censored then.
    Rows are emitted at EVENT times (d > 0); censor-only times adjust
    the risk set but emit no step (standard KM).

    Exactness: the survival probability is the integer recurrence
    s ← s·(n_t − d_t) div n_t starting at 1e6 — per-step floored,
    so every engine lands the identical integer (the per-step factor
    is also emitted; flooring biases each step down < 1 ppm).  No
    exp/ln seam.

    Plan shape: one groupBy to (group, duration) grain (map-side
    combined), one keyed cumulative window for the risk set, then one
    collect_list per group feeding a SQL ``aggregate`` recurrence —
    the array is DISTINCT-EVENT-TIMES-sized, not unit-sized (the
    documented bound; both shuffles share the group key, so the
    second groupBy reuses the window's partitioning).

    Output: (…group, t, n_risk, d, c_censored, factor_ppm, surv_ppm).
    """
    groups = list(group_cols or [])
    ev = F.col(event_col).cast("boolean")
    rows = df.filter(
        F.col(duration_col).isNotNull() & ev.isNotNull()
    ).select(
        *groups,
        F.col(duration_col).alias("_t"),
        F.when(ev, F.lit(1)).otherwise(F.lit(0)).alias("_e"),
    )
    per_t = rows.groupBy(*groups, "_t").agg(
        F.sum("_e").cast("long").alias("_d"),
        F.count(F.lit(1)).cast("long").alias("_cnt"),
    )
    w_g = Window.partitionBy(*groups) if groups else Window.partitionBy()
    w_prior = (
        (Window.partitionBy(*groups) if groups else Window.partitionBy())
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sized = per_t.select(
        *groups, "_t", "_d",
        (F.col("_cnt") - F.col("_d")).alias("_c"),
        (
            F.sum("_cnt").over(w_g)
            - F.coalesce(F.sum("_cnt").over(w_prior), F.lit(0))
        ).cast("long").alias("_n"),
    ).filter(F.col("_d") > 0)
    t_type = sized.schema["_t"].dataType.simpleString()
    arr = sized.groupBy(*groups).agg(
        F.sort_array(
            F.collect_list(F.struct("_t", "_n", "_d", "_c"))
        ).alias("_steps")
    )
    run_expr = (
        "aggregate(_steps, "
        f"CAST(array() AS array<struct<_t:{t_type},_n:bigint,_d:bigint,"
        "_c:bigint,_s:bigint>>), "
        "(acc, x) -> array_append(acc, named_struct("
        "'_t', x._t, '_n', x._n, '_d', x._d, '_c', x._c, "
        "'_s', (CASE WHEN size(acc) = 0 THEN CAST(1000000 AS BIGINT) "
        "ELSE element_at(acc, size(acc))._s END) "
        "* (x._n - x._d) div x._n)))"
    )
    return arr.select(
        *groups, F.explode(F.expr(run_expr)).alias("_r")
    ).select(
        *groups,
        F.col("_r._t").alias("t"),
        F.col("_r._n").alias("n_risk"),
        F.col("_r._d").alias("d"),
        F.col("_r._c").alias("c_censored"),
        F.expr("(_r._n - _r._d) * 1000000 div _r._n").alias("factor_ppm"),
        F.col("_r._s").alias("surv_ppm"),
    )


def abtest_report(
    df: DataFrame,
    variant_col: str,
    success_col: str,
    control,
) -> DataFrame:
    """Two-proportion A/B report: one input row per experiment unit,
    `success_col` truthy = converted; every variant is compared to
    `control` — absolute and relative lift as exact integer ppm, and
    the pooled two-proportion z statistic as ONE fixed IEEE expression
    over exact integers (divisions + a correctly-rounded sqrt — the
    corr_matrix float contract, so the double reproduces bitwise).

    Totality: NULL-success units count in `n_excluded` per variant
    (the pr_report contract), NULL variants are dropped.  Relative
    lift uses the sign-safe division pattern (truncate-vs-floor on
    negatives is an engine seam): sign extracted, magnitude floored.

    Plan shape: one groupBy(variant) with map-side combine (the
    shuffle carries variants, not units), one broadcast 1-row
    crossJoin for the control totals.  Overflow: s·n_ctl inside
    DECIMAL(38,0) — safe to ~1e19 units.

    Output: one row per variant (control included, flagged):
    (variant, is_control, n, n_success, n_excluded, cr_ppm, lift_ppm,
    rel_lift_ppm, z) — lift columns NULL on the control row and when
    the control has zero successes (rel) / zero spread (z).
    """
    v = F.col(variant_col)
    s = F.col(success_col).cast("boolean")
    per_v = df.filter(v.isNotNull()).groupBy(v.alias("variant")).agg(
        F.count(F.when(s.isNotNull(), F.lit(1))).alias("n"),
        F.count(F.when(s, F.lit(1))).alias("n_success"),
        F.count(F.when(s.isNull(), F.lit(1))).alias("n_excluded"),
    )
    ctl = per_v.filter(F.col("variant") == F.lit(control)).select(
        F.col("n").alias("_cn"), F.col("n_success").alias("_cs")
    )
    got_ctl = ctl.limit(1).collect()  # 1-row bounded check
    if not got_ctl:
        raise ValueError(
            f"abtest_report: control variant {control!r} has no rows — "
            "an empty report would silently hide the wiring bug"
        )
    j = per_v.crossJoin(F.broadcast(ctl))
    cr = F.when(
        F.col("n") > 0, F.expr("n_success * 1000000 div n")
    ).otherwise(F.lit(0))
    ccr = F.when(
        F.col("_cn") > 0, F.expr("_cs * 1000000 div _cn")
    ).otherwise(F.lit(0))
    is_ctl = F.col("variant") == F.lit(control)
    relnum = F.expr(
        "CAST(n_success AS DECIMAL(38,0)) * _cn "
        "- CAST(_cs AS DECIMAL(38,0)) * n"
    )
    rel = F.when(
        is_ctl | (F.col("_cs") <= 0), F.lit(None).cast("long")
    ).otherwise(
        F.when(relnum < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
        * F.expr(
            "CAST(abs(CAST(n_success AS DECIMAL(38,0)) * _cn "
            "- CAST(_cs AS DECIMAL(38,0)) * n) * 1000000 "
            "div (CAST(_cs AS DECIMAL(38,0)) * n) AS BIGINT)"
        )
    )
    p1 = F.col("n_success").cast("double") / F.col("n").cast("double")
    p2 = F.col("_cs").cast("double") / F.col("_cn").cast("double")
    pc = (F.col("n_success") + F.col("_cs")).cast("double") / (
        F.col("n") + F.col("_cn")
    ).cast("double")
    zden = F.sqrt(
        pc * (F.lit(1.0) - pc)
        * (F.lit(1.0) / F.col("n").cast("double")
           + F.lit(1.0) / F.col("_cn").cast("double"))
    )
    z = F.when(
        is_ctl | (F.col("n") <= 0) | (F.col("_cn") <= 0) | (zden <= 0),
        F.lit(None).cast("double"),
    ).otherwise((p1 - p2) / zden)
    return j.select(
        "variant", is_ctl.alias("is_control"),
        "n", "n_success", "n_excluded",
        cr.cast("long").alias("cr_ppm"),
        F.when(is_ctl, F.lit(None).cast("long"))
        .otherwise((cr - ccr).cast("long")).alias("lift_ppm"),
        rel.alias("rel_lift_ppm"),
        z.alias("z"),
    )


def mi_core(
    cells: list[tuple],
) -> tuple[int, int, int, int, int, int, int]:
    """Pure mutual-information computation shared by the Spark path
    and the oracle replay (the psi_core pattern, classify.py): input
    (value, label, count) cells for ONE feature; returns
    (mi_micro, n, card_v, card_l, h_v_micro, h_l_micro, nmi_ppm) with
    natural-log entropies, HALF_UP micro rounding of each final
    number — Python's libm on both sides, so no cross-engine seam."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def _q(x: float) -> int:
        return int(
            Decimal(repr(x * 1_000_000)).quantize(
                Decimal(1), rounding=ROUND_HALF_UP
            )
        )

    n = sum(c for _, _, c in cells)
    if n == 0:
        return 0, 0, 0, 0, 0, 0, 0
    vtot: dict = {}
    ltot: dict = {}
    for v, l, c in cells:
        vtot[v] = vtot.get(v, 0) + c
        ltot[l] = ltot.get(l, 0) + c
    mi = 0.0
    for v, l, c in sorted(cells, key=lambda x: (repr(x[0]), repr(x[1]))):
        if c > 0:
            mi += (c / n) * math.log(c * n / (vtot[v] * ltot[l]))
    h_v = -sum((c / n) * math.log(c / n) for c in vtot.values() if c > 0)
    h_l = -sum((c / n) * math.log(c / n) for c in ltot.values() if c > 0)
    h_min = min(h_v, h_l)
    nmi = mi / h_min if h_min > 0 else 0.0
    return (
        _q(mi), n, len(vtot), len(ltot), _q(h_v), _q(h_l),
        _q(nmi),
    )


def mutual_information_report(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    max_cells: int = 100_000,
) -> DataFrame:
    """Mutual information (and normalized MI) of each CATEGORICAL
    feature column against a label — the feature-selection /
    leakage screen chi2_association's p-value-shaped statistic isn't:
    MI ranks features by how much label information they carry, on a
    comparable scale (nmi ∈ [0,1], 1 = feature determines label).

    Continuous features must be quantized upstream (equi_depth
    histogram buckets, F.round — the engine's standard seam); this
    operator treats every distinct value as a category and NULL as a
    real category (missingness is informative).  Rows with NULL label
    are dropped.

    Shape: ONE stack-unpivot scan → groupBy((feature, value, label))
    with map-side combine — the shuffle and the driver collect are
    CELLS-sized (Σ_f card_f · card_label), guarded by `max_cells`
    (loud raise, never silent truncation); the MI itself runs in
    `mi_core` on the driver so the number replays exactly off-Spark
    (the psi_report pattern).

    Output: one row per feature: (feature, n, card_feature,
    card_label, mi_micro, h_feature_micro, h_label_micro, nmi_ppm).
    """
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    stack_args = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in feature_cols
    )
    cells = (
        df.filter(F.col(label_col).isNotNull())
        .selectExpr(
            f"stack({len(feature_cols)}, {stack_args}) AS (_f, _v)",
            f"CAST(`{label_col}` AS STRING) AS _l",
        )
        .groupBy("_f", "_v", "_l")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    got = cells.limit(max_cells + 1).collect()
    if len(got) > max_cells:
        raise ValueError(
            f"mutual_information_report: > {max_cells} (feature, value, "
            "label) cells — quantize the feature columns first "
            "(equi_depth_histogram / F.round) or raise max_cells"
        )
    by_f: dict = {c: [] for c in feature_cols}
    for r in got:
        by_f[r["_f"]].append((r["_v"], r["_l"], int(r["_c"])))
    out = []
    for c in feature_cols:
        mi, n, cv, cl, hv, hl, nmi = mi_core(by_f[c])
        out.append((c, n, cv, cl, mi, hv, hl, nmi))
    return df.sparkSession.createDataFrame(
        out,
        "feature string, n long, card_feature long, card_label long, "
        "mi_micro long, h_feature_micro long, h_label_micro long, "
        "nmi_ppm long",
    )


def ks_core(
    counts_a: dict, counts_b: dict
) -> tuple[int, int, int, object]:
    """Pure-Python twin of `ks_drift` over (value → count) maps — the
    off-Spark replay (psi_core pattern) the streaming drift sink uses
    per micro-batch: same exact integer arithmetic, same smallest-
    argmax tie-break.  Returns (d_ppm, n_a, n_b, at_value);
    (0, n_a, n_b, None) when either side is empty."""
    n_a = sum(counts_a.values())
    n_b = sum(counts_b.values())
    if n_a == 0 or n_b == 0:
        return 0, n_a, n_b, None
    cum_a = cum_b = 0
    best = -1
    best_v = None
    for v in sorted(set(counts_a) | set(counts_b)):
        cum_a += counts_a.get(v, 0)
        cum_b += counts_b.get(v, 0)
        d = abs(cum_a * n_b - cum_b * n_a)
        if d > best:
            best, best_v = d, v
    return best * 1_000_000 // (n_a * n_b), n_a, n_b, best_v


def theil_sen_by_group(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str],
    max_points: int = 4096,
    micro: int = 1_000_000,
) -> DataFrame:
    """Theil–Sen robust trend per group: slope = MEDIAN of all
    pairwise slopes, intercept = median of (y − slope·x) — up to ~29%
    of the points can be arbitrary garbage (one bot burst, one
    backfill glitch) without moving the estimate, where
    `ols_by_group` chases every outlier.  The robust sibling, same
    input shape.

    COST IS QUADRATIC per group — n(n−1)/2 pairs — which is fine for
    its actual regime (per-key daily/hourly trend series: 365 points
    → 66k pairs) and catastrophic outside it, so the operator RAISES
    past `max_points` per group (loud guard, never silent sampling;
    thin the series upstream — daily instead of hourly — or use
    ols_by_group/winsorize).  The pair join is group-keyed: groups
    parallelize, nothing is global.

    Exactness: x/y quantize to integer micros; pair slopes and
    residuals are single IEEE divisions over exact integers; the
    medians take the value at rank ⌈n/2⌉ — an ACTUAL element of the
    deterministic-double multiset, so the result reproduces bitwise
    on any engine (no interpolation, no mean-of-two).  Pairs with
    equal x are excluded (vertical slope), per the standard
    estimator.

    Output: (…group, n_points, n_pairs, slope, intercept); NULL
    slope for groups with < 2 distinct x.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if micro < 1:
        raise ValueError("micro must be >= 1")
    qx = F.expr(f"CAST(round({x_col} * {micro}, 0) AS BIGINT)")
    qy = F.expr(f"CAST(round({y_col} * {micro}, 0) AS BIGINT)")
    pts = df.select(
        *group_cols, qx.alias("_qx"), qy.alias("_qy")
    ).filter(F.col("_qx").isNotNull() & F.col("_qy").isNotNull())
    counted = pts.withColumn(
        "_np", F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
    )
    guard = F.when(
        F.col("_np") > max_points,
        F.raise_error(F.concat(
            F.lit(f"theil_sen_by_group: > {max_points} points in group "),
            F.concat_ws("|", *[F.col(c).cast("string")
                               for c in group_cols]),
            F.lit(" — O(n²) pairs; thin the series or raise max_points"),
        )),
    ).otherwise(F.col("_np"))
    pts = counted.withColumn("_np", guard)
    a = pts.select(
        *group_cols, F.col("_qx").alias("_xa"), F.col("_qy").alias("_ya"),
        "_np",
    )
    b = pts.select(
        *[F.col(c).alias(f"_g_{c}") for c in group_cols],
        F.col("_qx").alias("_xb"), F.col("_qy").alias("_yb"),
    )
    cond = [F.col(c) == F.col(f"_g_{c}") for c in group_cols]
    pairs = a.join(b, cond).filter(F.col("_xa") < F.col("_xb")).select(
        *group_cols, "_np",
        ((F.col("_yb") - F.col("_ya")).cast("double")
         / (F.col("_xb") - F.col("_xa")).cast("double")).alias("_slope"),
    )
    w_rank = Window.partitionBy(*group_cols).orderBy("_slope")
    w_g = Window.partitionBy(*group_cols)
    ranked = pairs.withColumn("_rn", F.row_number().over(w_rank)) \
        .withColumn("_npairs", F.count(F.lit(1)).over(w_g))
    med = ranked.filter(
        F.col("_rn") == F.expr("CAST((_npairs + 1) div 2 AS BIGINT)")
    ).select(
        *group_cols, "_np", "_npairs", F.col("_slope").alias("_med_slope")
    )
    resid = pts.join(F.broadcast(med.drop("_np")), group_cols, "left").select(
        *group_cols,
        F.coalesce(F.col("_npairs"), F.lit(0)).alias("_npairs"),
        F.col("_np"),
        F.col("_med_slope"),
        (F.col("_qy").cast("double")
         - F.col("_med_slope") * F.col("_qx").cast("double")).alias("_r"),
    )
    w_rr = Window.partitionBy(*group_cols).orderBy("_r")
    w_rg = Window.partitionBy(*group_cols)
    rr = resid.withColumn("_rrn", F.row_number().over(w_rr)) \
        .withColumn("_nr", F.count(F.lit(1)).over(w_rg))
    out = rr.filter(
        F.col("_rrn") == F.expr("CAST((_nr + 1) div 2 AS BIGINT)")
    )
    return out.select(
        *group_cols,
        F.col("_np").cast("long").alias("n_points"),
        F.col("_npairs").cast("long").alias("n_pairs"),
        F.col("_med_slope").alias("slope"),
        F.when(
            F.col("_med_slope").isNotNull(),
            F.col("_r") / F.lit(float(micro)),
        ).alias("intercept"),
    )

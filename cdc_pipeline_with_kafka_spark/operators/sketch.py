"""Sketch-shaped aggregates for massive key cardinality (SURVEY.md §4
scale extensions; reference analogue: the Redis counter tables the
trend analyzer reads, advanced_trend_analyzer.py — exact counters that
stop fitting once the key space is the open vocabulary of a 100 TB
corpus).

Three operators:

- ``heavy_hitters``: exact top-k over an unbounded key space WITHOUT a
  full-key shuffle — candidate/verify (TPUT/threshold-algorithm
  family).  Pass 1 scans once, keeps the top-m keys per partition
  (mapInPandas, no shuffle) plus each partition's m-th count; pass 2
  exact-counts ONLY the candidate keys (broadcast semi-join, so the
  shuffle carries candidate rows, not the vocabulary).  A key missing
  from every partition's top-m has global count ≤ Σ_p thresh_p, so
  when the k-th verified count clears that bound the result is
  PROVABLY the exact top-k; the bound is returned so callers can
  escalate (raise m, or fall back to a full groupBy) instead of
  silently trusting a heuristic.
- ``quantile_summary``: per-stratum distribution summary.  Exact
  ``percentile`` (full sort-per-group — fine up to millions of rows
  per group) or ``approx_percentile`` (GK sketch, mergeable,
  bounded-memory — the 100 TB path) behind one flag with identical
  output shape.
- ``cms_counts``: count-min sketch per group via the built-in
  ``count_min_sketch`` aggregate; returns the serialized sketch for a
  downstream store, plus a driver-side reader for point lookups.
  Overestimate-only error ≤ eps·N with prob ≥ confidence.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _local_topm(key_col: str, m: int):
    """Per-partition counting pass: emit the partition's top-m keys by
    local count, plus one marker row (key NULL) carrying the m-th
    largest local count — the partition's contribution to the
    missing-key upper bound (0 when the partition had < m distinct
    keys, i.e. every key was emitted)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        counts: Counter = Counter()
        for pdf in batches:
            counts.update(pdf[key_col].dropna().value_counts().to_dict())
        top = counts.most_common(m)
        thresh = top[-1][1] if len(top) == m else 0
        keys = [k for k, _ in top] + [None]
        cnts = [c for _, c in top] + [thresh]
        marker = [False] * len(top) + [True]
        yield pd.DataFrame({key_col: keys, "local_cnt": cnts, "is_thresh": marker})

    return gen


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int,
    candidate_factor: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Exact top-k keys by count without shuffling the full key space.

    Returns ``(topk, bound)``:

    - ``topk``: (key_col, cnt) — the k most frequent keys, exact
      counts, deterministic tie-break (cnt desc, key asc);
    - ``bound``: single row (missing_upper_bound) — the largest global
      count any NON-candidate key could have.  The result is provably
      exact iff ``topk``'s k-th cnt ≥ that bound; callers at scale
      check it and re-run with a larger ``candidate_factor`` (or fall
      back to the full groupBy of ``windows.topk_global``) on the rare
      adversarial distribution where it fails.  On Zipfian text
      frequencies (the corpus case) m = k·factor clears it easily.

    Scale shape: pass 1 is one scan, zero shuffle, p·m candidate rows;
    pass 2 re-scans but shuffles only rows whose key is a candidate
    (broadcast semi-join + partial agg), so reducer input is ~k·factor
    keys regardless of vocabulary size.  Compare ``topk_global``: one
    scan but a full shuffle of every distinct key — better when the
    vocabulary is bounded, unusable at open-vocabulary 100 TB."""
    m = max(k * candidate_factor, k + 1)
    # nullable=True regardless of the input field: the per-partition
    # threshold marker row carries a NULL key
    schema = T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType, True),
            T.StructField("local_cnt", T.LongType()),
            T.StructField("is_thresh", T.BooleanType()),
        ]
    )
    local = df.select(key_col).mapInPandas(_local_topm(key_col, m), schema=schema)
    local = local.persist()
    candidates = local.filter(~F.col("is_thresh")).select(key_col).distinct()
    bound = local.filter(F.col("is_thresh")).agg(
        F.coalesce(F.sum("local_cnt"), F.lit(0)).alias("missing_upper_bound")
    )
    exact = (
        df.join(F.broadcast(candidates), key_col, "semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), F.asc(key_col))
    topk = (
        exact.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )
    return topk, bound


def quantile_summary(
    df: DataFrame,
    num_col: str,
    probs: list[float],
    stratum_col: str | None = None,
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-stratum quantiles, long form: (stratum?, prob, quantile).

    ``approx=False`` uses exact ``percentile`` (linear interpolation,
    matches DuckDB ``quantile_cont``) — it buffers each group's values,
    so reserve it for bounded groups.  ``approx=True`` uses the
    Greenwald-Khanna sketch (``approx_percentile``): mergeable partial
    aggregates, memory O(accuracy), rank error ≤ 1/accuracy — the only
    viable form at 100 TB.  Output shape is identical so callers can
    flip the flag per deployment."""
    probs_arr = F.array(*[F.lit(float(p)) for p in probs])
    agg = (
        F.approx_percentile(F.col(num_col).cast("double"), probs_arr, F.lit(accuracy))
        if approx
        else F.percentile(F.col(num_col).cast("double"), probs_arr)
    ).alias("qs")
    grouped = df.groupBy(stratum_col).agg(agg) if stratum_col else df.agg(agg)
    labeled = grouped.select(
        *([stratum_col] if stratum_col else []),
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(float(p)) for p in probs]).alias("prob"),
                F.col("qs").alias("quantile"),
            )
        ).alias("z"),
    )
    return labeled.select(
        *([stratum_col] if stratum_col else []),
        F.col("z.prob").alias("prob"),
        F.col("z.quantile").alias("quantile"),
    )


def cms_counts(
    df: DataFrame,
    key_col: str,
    eps: float = 0.0001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Count-min sketch of a key column: single row with the serialized
    sketch (binary).  Mergeable across partitions/batches by the JVM
    aggregate — the streaming-friendly way to keep per-key counters
    when the key space doesn't fit (reference keeps them in Redis,
    realtime_trend_analyzer.py; a CMS is the bounded-memory analogue).
    Width ⌈e/eps⌉ × depth ⌈ln(1/(1−confidence))⌉ ints; estimates only
    ever OVERcount, by ≤ eps·N with probability ≥ confidence."""
    return df.agg(
        F.count_min_sketch(key_col, F.lit(eps), F.lit(confidence), F.lit(seed)).alias(
            "sketch"
        ),
        F.count(F.lit(1)).alias("n"),
    )


def cms_estimate(spark, sketch_bytes: bytes, keys: list) -> dict:
    """Driver-side point lookups against a serialized count-min sketch
    (the sketch is KB-sized — reading it on the driver is the point:
    an alerting service polls counters without touching the cluster)."""
    jvm = spark.sparkContext._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytes(sketch_bytes))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    return {k: cms.estimateCount(k) for k in keys}


def hll_sketches(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HyperLogLog distinct-count sketches (Datasketches HLL
    via the built-in ``hll_sketch_agg``): (group_cols..., hll binary,
    n_distinct estimate).

    The MERGEABLE form of count-distinct for 100 TB rollups: unlike
    ``approx_count_distinct`` (which returns only a number), the binary
    sketch column can be persisted per shard/day/partition and later
    combined with ``hll_merge`` — distinct users per day roll up to
    per-month WITHOUT rescanning raw events, the exact pattern the
    reference's Redis counter tables cannot express.  Standard error
    ≈ 1.04/√2^lg_k (~1.6% at the default lg_k=12, 2 KB per sketch)."""
    groups = group_cols or []
    return df.groupBy(*groups).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("hll"),
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col(key_col), F.lit(lg_k))).alias(
            "n_distinct"
        ),
    )


def hll_merge(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    hll_col: str = "hll",
) -> DataFrame:
    """Roll persisted HLL sketches up to a coarser grain: union the
    sketches per (coarser) group and re-estimate.  Input rows are
    KB-sized sketches, not raw data — a month-from-days rollup reads
    30 rows per key, never the 100 TB of events behind them."""
    groups = group_cols or []
    merged = sketches.groupBy(*groups).agg(
        F.hll_union_agg(F.col(hll_col)).alias("hll")
    )
    return merged.select(
        *groups, "hll", F.hll_sketch_estimate(F.col("hll")).alias("n_distinct")
    )

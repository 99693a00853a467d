"""Scoring / normalization scalar math (SURVEY.md §2.7 F9, F17; §2.5 W4).

All pure column arithmetic — stays inside whole-stage codegen.

- F9  log view weight : readme.md:240-244 (log10(views+1))
- F17 clamp/normalize : advanced_trend_analyzer.py:195,218-220
- W4  compound score  : advanced_trend_analyzer.py:208-236
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Compound-score weights (advanced_trend_analyzer.py:228-233).
W_FREQ = 0.25
W_VELOCITY = 0.30
W_ANOMALY = 0.25
W_MOMENTUM = 0.20


def log_view_weight(views: Column) -> Column:
    """F9: log10(views + 1) dynamic weight."""
    return F.log10(views + F.lit(1))


def clamp(col: Column, lo: float, hi: float) -> Column:
    """F17: min(max(x, lo), hi)."""
    return F.least(F.greatest(col, F.lit(lo)), F.lit(hi))


def freq_score(count_1h: Column) -> Column:
    """F17: min(count/10, 10) frequency sub-score."""
    return F.least(count_1h / F.lit(10.0), F.lit(10.0))


def velocity_score(velocity: Column) -> Column:
    """F17: min(max(v,0)/5, 10) velocity sub-score."""
    return F.least(F.greatest(velocity, F.lit(0.0)) / F.lit(5.0), F.lit(10.0))


def anomaly_score(zscore: Column) -> Column:
    """F17/W2: min(|z|/3, 1) anomaly sub-score (0-1)."""
    return F.least(F.abs(zscore) / F.lit(3.0), F.lit(1.0))


def momentum_score(count_6h: Column, count_24h: Column) -> Column:
    """W4: min(count_6h / count_24h, 5) * 2 (0 when 24h count is 0)."""
    ratio = F.when(count_24h > 0, count_6h / count_24h).otherwise(F.lit(0.0))
    return F.least(ratio, F.lit(5.0)) * F.lit(2.0)


def compound_score(
    freq: Column, velocity: Column, anomaly: Column, momentum: Column
) -> Column:
    """W4: weighted sum of normalized sub-scores, ×10 → 0-100, round 2.

    anomaly is 0-1 so it is scaled ×10 to share the 0-10 range of the
    other sub-scores before weighting (advanced_trend_analyzer.py:226).
    """
    raw = (
        freq * F.lit(W_FREQ)
        + velocity * F.lit(W_VELOCITY)
        + anomaly * F.lit(10.0) * F.lit(W_ANOMALY)
        + momentum * F.lit(W_MOMENTUM)
    )
    return F.round(raw * F.lit(10.0), 2)

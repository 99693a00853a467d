"""Trainable document classifiers and importance weighting for corpus
curation — the "model-in-the-loop" quality tier of a training-data
pipeline, built from pure aggregations so training runs as ONE Spark
job with no driver-side iteration.

- Multinomial Naive Bayes (`train_nb` / `nb_score`): the classic
  fastText-style quality/domain classifier reduced to its aggregation
  core — token-count statistics per class + Laplace smoothing.  Both
  training and scoring are groupBy/join plans; nothing iterates.
- DSIR importance weights (`dsir_weights` / `dsir_select`): Data
  Selection via Importance Resampling (Xie et al. 2023,
  arXiv:2302.03169) — hashed n-gram bag-of-words importance
  log-ratios between a target distribution and the raw corpus.

Determinism contract (shared with the DuckDB oracles): every per-token
log-probability is quantized to an integer number of micro-nats
(round(ln(p) * 1e6)) BEFORE summation, so document scores are exact
integer sums — accumulation order across engines, partitions, and
rounds cannot change a single bit.

100 TB shape: model state is (vocab × classes) / (2^hash_bits) rows —
KB-to-MB scale — and is broadcast into the scoring join; the corpus is
touched once per phase with map-side partial aggregation.  Vocabulary
is frequency-capped (`max_vocab`) so adversarial corpora can't inflate
the broadcast side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..util import spread
from .textstats import _tokens

MICRO = 1_000_000


def _micro_ln(col: Column) -> Column:
    """Integer micro-nats: round(ln(x) * 1e6) as BIGINT — the
    quantization both engines apply before any summation."""
    return F.round(F.log(col) * MICRO).cast("long")


def _vocab_topk(toks: DataFrame, max_vocab: int) -> DataFrame:
    """Exact global top-max_vocab tokens by (frequency desc, token asc)
    as an ORDER BY + LIMIT: compiles to TakeOrderedAndProject — every
    partition keeps its own bounded top and the driver merges the
    partials.  NOT an unpartitioned row_number window, which would
    serialize the full distinct-token table through one task at corpus
    scale (plan-pinned in test_plans)."""
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("token").asc())
        .limit(max_vocab)
        .select("token")
    )


def train_nb(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    max_vocab: int | None = 50_000,
):
    """Train a multinomial Naive Bayes classifier.

    Returns (token_logp, class_stats):
    - token_logp: (label, token, logp_micro) — ln P(token|label) with
      Laplace add-1 smoothing over the *kept* vocabulary, in micro-nats;
    - class_stats: (label, prior_micro, unseen_micro) — ln P(label) and
      the smoothed log-probability for any token outside the (label,
      token) table.

    `max_vocab` keeps the most frequent tokens corpus-wide (ties break
    lexicographically) so the model is a bounded broadcast at any corpus
    size; tokens outside the vocabulary fall to unseen_micro, exactly as
    unseen tokens do at scoring time.  Training is two aggregations over
    one tokenized scan — no iteration, no driver-side state beyond the
    model DataFrames themselves.
    """
    toks = spread(df, label_col).select(
        F.col(label_col).alias("label"),
        F.explode(_tokens(F.col(text_col))).alias("token"),
    )
    if max_vocab is not None:
        toks = toks.join(F.broadcast(_vocab_topk(toks, max_vocab)), "token")
    # localCheckpoint pins the (≤ vocab × classes)-row count table so
    # the vocab-size action and both model outputs reuse ONE tokenize
    # pass over the corpus instead of re-scanning per consumer
    counts = toks.groupBy("label", "token").agg(F.count(F.lit(1)).alias("cnt")).localCheckpoint()
    vocab_size = counts.select("token").distinct().count()
    totals = counts.groupBy("label").agg(F.sum("cnt").alias("n_tok"))
    token_logp = counts.join(totals, "label").select(
        "label",
        "token",
        _micro_ln((F.col("cnt") + 1) / (F.col("n_tok") + vocab_size)).alias("logp_micro"),
    )
    docs_per_label = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    total_docs = df.count()
    class_stats = docs_per_label.join(totals, "label", "left").select(
        "label",
        _micro_ln(F.col("n_docs") / F.lit(total_docs)).alias("prior_micro"),
        _micro_ln(1 / (F.coalesce(F.col("n_tok"), F.lit(0)) + vocab_size)).alias(
            "unseen_micro"
        ),
    )
    return token_logp, class_stats


def nb_score(
    df: DataFrame,
    token_logp: DataFrame,
    class_stats: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents against a trained NB model.

    Returns (id, label, score_micro, predicted) — one row per document
    per class, `predicted` marking the argmax (ties → smallest label).
    score_micro = prior + Σ_token count·logp, all integer micro-nats.

    Plan: tokenize once, aggregate to (doc, token, cnt), cross the few
    class rows (broadcast), left-join the broadcast token table, one
    groupBy(doc, label).  The corpus never joins itself and the model
    side is bounded, so this scales linearly.
    """
    doc_tokens = spread(df, id_col).select(
        F.col(id_col).alias("id"), F.explode(_tokens(F.col(text_col))).alias("token")
    ).groupBy("id", "token").agg(F.count(F.lit(1)).alias("cnt"))
    labeled = doc_tokens.crossJoin(F.broadcast(class_stats))
    scored = labeled.join(
        F.broadcast(token_logp), ["label", "token"], "left"
    ).groupBy("id", "label").agg(
        (
            F.first("prior_micro")
            + F.sum(F.col("cnt") * F.coalesce(F.col("logp_micro"), F.col("unseen_micro")))
        ).alias("score_micro")
    )
    # docs with zero tokens still get prior-only scores — detected by a
    # shuffle-free token-count filter, not an anti-join against the
    # scored output (which would re-shuffle the whole corpus)
    empties = df.filter(F.size(_tokens(F.col(text_col))) == 0).select(
        F.col(id_col).alias("id")
    )
    prior_only = empties.crossJoin(F.broadcast(class_stats)).select(
        "id", "label", F.col("prior_micro").alias("score_micro")
    )
    allscores = scored.unionByName(prior_only)
    w = Window.partitionBy("id").orderBy(F.col("score_micro").desc(), F.col("label").asc())
    return allscores.select(
        "id", "label", "score_micro", (F.row_number().over(w) == 1).alias("predicted")
    )


def nb_predict(
    df: DataFrame,
    token_logp: DataFrame,
    class_stats: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per document: (id, predicted_label, score_micro)."""
    return (
        nb_score(df, token_logp, class_stats, text_col=text_col, id_col=id_col)
        .filter(F.col("predicted"))
        .select("id", F.col("label").alias("predicted_label"), "score_micro")
    )


def _feature_hash(col: Column, hash_buckets: int) -> Column:
    """Deterministic md5-based feature bucket, reproducible in DuckDB:
    first 15 md5 hex chars mod buckets."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % hash_buckets
    )


def _doc_features(df: DataFrame, text_col: str, id_col: str, hash_buckets: int) -> DataFrame:
    """Hashed unigram + bigram feature occurrences per document:
    (id, bucket) with one row per occurrence (bag semantics)."""
    toks = _tokens(F.col(text_col))
    # zip-slice bigrams (r12): two shifted slices zipped once — flat
    # array ops instead of an interpreted slice-per-element transform
    # lambda (same rewrite as dedup.token_ngrams); identical order
    # and values, empty array for <2-token (or NULL-token) docs.
    _bcnt = F.size(toks) - F.lit(1)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.arrays_zip(
                F.slice(toks, 1, _bcnt).alias("t0"),
                F.slice(toks, 2, _bcnt).alias("t1"),
            ),
            lambda g: F.concat_ws(" ", g["t0"], g["t1"]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(toks, bigrams)
    return spread(df, id_col).select(
        F.col(id_col).alias("id"), F.explode_outer(feats).alias("feat")
    ).filter(F.col("feat").isNotNull()).select(
        "id", _feature_hash(F.col("feat"), hash_buckets).alias("bucket")
    )


def dsir_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_buckets: int = 10_000,
) -> DataFrame:
    """DSIR log importance weights (Xie et al. 2023): for each raw
    document, logw = Σ_features [ln p_target(bucket) − ln p_raw(bucket)]
    over hashed unigram+bigram occurrences, with add-1 smoothing over
    the `hash_buckets`-dimensional feature space.

    Returns (id, n_feats, logw_micro) — integer micro-nats, exact sums.

    The two distribution estimates are bucket-count aggregations whose
    output is at most `hash_buckets` rows — they are COLLECTED to the
    driver (hard-bounded by construction, same contract as the
    codebook/BPE/LM trainers) so each corpus is tokenized exactly once
    for its distribution, and the log-ratio table ships back as a
    broadcast.  Raw docs then take one more tokenize + broadcast-join +
    groupBy pass for the weights: two passes over raw, one over target,
    total.
    """
    import math

    raw_feats = _doc_features(raw_df, text_col, id_col, hash_buckets)
    target_feats = _doc_features(target_df, text_col, id_col, hash_buckets)

    def _ln_micro(p: float) -> int:
        # HALF_UP away from zero — the same rounding Spark's round()
        # and DuckDB's round() apply, NOT Python's banker's round
        v = math.log(p) * MICRO
        return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))

    def dist(feats: DataFrame) -> tuple[dict[int, int], int]:
        rows = feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("c")).collect()
        return {r["bucket"]: r["c"] for r in rows}, sum(r["c"] for r in rows)

    t_counts, t_total = dist(target_feats)
    r_counts, r_total = dist(raw_feats)
    spark = raw_df.sparkSession
    ratio_rows = [
        (
            b,
            _ln_micro((t_counts.get(b, 0) + 1) / (t_total + hash_buckets))
            - _ln_micro((r_counts.get(b, 0) + 1) / (r_total + hash_buckets)),
        )
        for b in set(t_counts) | set(r_counts)
    ]
    ratio = spark.createDataFrame(ratio_rows, "bucket long, lr_micro long")
    # every raw bucket is in r_counts by construction, so the join
    # never misses; 'left' + coalesce documents the invariant anyway
    unseen_lr = _ln_micro(1 / (t_total + hash_buckets)) - _ln_micro(
        1 / (r_total + hash_buckets)
    )
    return (
        raw_feats.join(F.broadcast(ratio), "bucket", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(F.coalesce(F.col("lr_micro"), F.lit(unseen_lr))).alias("logw_micro"),
        )
    )


def dsir_select(
    raw_df: DataFrame,
    target_df: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_buckets: int = 10_000,
    normalize: bool = True,
) -> DataFrame:
    """Top-k raw documents by DSIR importance, deterministically ranked.

    `normalize` divides the log-weight by the document's feature count
    (per-feature average log-ratio) so long documents don't dominate
    purely by length — the practical resampling variant.  Ranking key is
    integer micro-nats with ascending id tie-breaks, so selection is
    bit-stable across engines and runs.

    Plan shape: the global top-k is an ORDER BY + LIMIT
    (TakeOrderedAndProject — per-partition bounded partials, driver
    merge), never an unpartitioned row_number over all doc weights; the
    rank numbers are then assigned over the ≤ k selected rows only, so
    the single-partition window is bounded by k, not the corpus.
    """
    w = dsir_weights(
        raw_df, target_df, text_col=text_col, id_col=id_col, hash_buckets=hash_buckets
    )
    key = (
        (F.col("logw_micro") / F.col("n_feats")).cast("long")
        if normalize
        else F.col("logw_micro")
    )
    topk = (
        w.select("id", "n_feats", "logw_micro", key.alias("rank_key"))
        .orderBy(F.col("rank_key").desc(), F.col("id").asc())
        .limit(k)
    )
    return topk.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.col("rank_key").desc(), F.col("id").asc())),
    ).drop("rank_key")


def nb_filter(
    df: DataFrame,
    token_logp: DataFrame,
    class_stats: DataFrame,
    keep_label: str,
    min_margin_micro: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents the NB model assigns to `keep_label` with a score
    margin ≥ `min_margin_micro` over the best other class — the
    classifier-filter stage of a curation pipeline (fastText-style
    quality gate).  Margin is in micro-nats: 1e6 ≈ one nat of
    log-likelihood separation.

    One scoring pass + a doc-grain max-aggregation; the corpus is
    never joined against itself."""
    scores = nb_score(df, token_logp, class_stats, text_col=text_col, id_col=id_col)
    margins = scores.groupBy("id").agg(
        (
            F.max(F.when(F.col("label") == keep_label, F.col("score_micro")))
            - F.max(F.when(F.col("label") != keep_label, F.col("score_micro")))
        ).alias("_margin")
    ).filter(F.col("_margin") >= min_margin_micro)
    return df.join(
        margins.withColumnRenamed("id", id_col).select(id_col), id_col, "left_semi"
    )


def pr_report(
    df: DataFrame,
    score_col: str,
    truth_col: str,
    thresholds: list[int],
) -> DataFrame:
    """Precision/recall/F1 threshold sweep for a quality classifier —
    the calibration step between training a filter (NB/DSIR/perplexity
    scores) and deploying it: pick the threshold whose precision/recall
    trade-off matches the curation budget.

    One corpus pass: each (score, truth) row fans out to the (small)
    threshold list and one groupBy(threshold) accumulates the
    confusion counts; ``flagged = score >= threshold``.  Every metric
    is EXACT integer ppm (`tp·1e6 div (tp+fp)` etc.; F1 via the
    single-division identity `2·tp·1e6 div (2·tp+fp+fn)`), so the
    report is engine-portable and partition-order-free.  Empty
    denominators report 0 ppm.

    Rows with a NULL score or NULL truth can land in NO confusion
    cell (both `flag` and `~flag` evaluate NULL) — they are counted
    EXPLICITLY in `n_excluded`, so the confusion matrix is total:
    tp+fp+fn+tn+n_excluded == row count at every threshold, and a
    quietly-NULL scoring bug shows up in the report instead of
    silently shrinking the denominator.

    Output: one row per threshold — (threshold, tp, fp, fn, tn,
    n_excluded, precision_ppm, recall_ppm, f1_ppm)."""
    if not thresholds:
        raise ValueError("need at least one threshold")
    # dedupe: a repeated threshold would fan each row out twice and
    # double every confusion count for that threshold
    uniq = sorted({int(t) for t in thresholds})
    rows = df.select(
        F.col(score_col).cast("long").alias("_s"),
        F.col(truth_col).cast("boolean").alias("_y"),
        F.explode(
            F.array(*[F.lit(t).cast("long") for t in uniq])
        ).alias("threshold"),
    )
    valid = F.col("_s").isNotNull() & F.col("_y").isNotNull()
    flag = F.col("_s") >= F.col("threshold")
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    agg = rows.groupBy("threshold").agg(
        cnt(valid & flag & F.col("_y")).alias("tp"),
        cnt(valid & flag & ~F.col("_y")).alias("fp"),
        cnt(valid & ~flag & F.col("_y")).alias("fn"),
        cnt(valid & ~flag & ~F.col("_y")).alias("tn"),
        cnt(~valid).alias("n_excluded"),
    )
    div = lambda num, den: F.when(  # noqa: E731
        F.expr(den) > 0, F.expr(f"CAST(({num}) div ({den}) AS BIGINT)")
    ).otherwise(F.lit(0)).cast("long")
    return agg.select(
        "threshold", "tp", "fp", "fn", "tn", "n_excluded",
        div("tp * 1000000", "tp + fp").alias("precision_ppm"),
        div("tp * 1000000", "tp + fn").alias("recall_ppm"),
        div("2 * tp * 1000000", "2 * tp + fp + fn").alias("f1_ppm"),
    )


def psi_core(
    old_counts: dict, new_counts: dict, hash_buckets: int
) -> tuple[int, int, int, int]:
    """Pure PSI computation shared by the Spark path and the oracle
    replay: add-1 smoothed bucket probabilities, HALF_UP micro
    rounding of the final sum.  Returns (psi_micro, n_buckets_hit,
    n_old_feats, n_new_feats)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    n_old = sum(old_counts.values())
    n_new = sum(new_counts.values())
    buckets = set(old_counts) | set(new_counts)
    psi = 0.0
    for b in sorted(buckets):
        po = (old_counts.get(b, 0) + 1.0) / (n_old + hash_buckets)
        pn = (new_counts.get(b, 0) + 1.0) / (n_new + hash_buckets)
        psi += (pn - po) * math.log(pn / po)
    micro = int(
        Decimal(repr(psi * 1_000_000)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP
        )
    )
    return micro, len(buckets), n_old, n_new


def psi_report(
    old_df: DataFrame,
    new_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_buckets: int = 1024,
) -> DataFrame:
    """Population Stability Index between two corpus versions over the
    hashed unigram+bigram feature space — the drift gate a training
    pipeline runs between releases (the credit-scoring PSI applied to
    text): PSI = Σ_buckets (p_new − p_old)·ln(p_new/p_old), add-1
    smoothed over the `hash_buckets` feature space.  Rule of thumb:
    < 0.1 stable, 0.1–0.25 moderate drift, > 0.25 investigate before
    training.

    One bucket-count aggregation per corpus (≤ hash_buckets rows each
    — the dsir_weights bounded-collect contract), PSI computed on the
    driver by `psi_core`, so the number replays exactly off-Spark.
    Returns one row: (psi_micro, n_buckets, n_old_feats, n_new_feats)."""
    old_counts = {
        int(r["bucket"]): int(r["c"])
        for r in _doc_features(old_df, text_col, id_col, hash_buckets)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    new_counts = {
        int(r["bucket"]): int(r["c"])
        for r in _doc_features(new_df, text_col, id_col, hash_buckets)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    micro, nb, no, nn = psi_core(old_counts, new_counts, hash_buckets)
    return old_df.sparkSession.createDataFrame(
        [(micro, nb, no, nn)],
        "psi_micro long, n_buckets long, n_old_feats long, n_new_feats long",
    )


def reliability_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Calibration (reliability-diagram) table: rows bucketed into
    `n_buckets` equal-population score bands by exact percentile rank,
    each band reporting its observed positive rate — the companion to
    `pr_report`: PR picks a threshold, this shows whether the score is
    MONOTONE in the truth (a well-calibrated quality classifier's
    pos_ppm rises with the bucket; a flat or U-shaped diagram means
    the score is noise even if some threshold looks good).

    Exactness: buckets come from the RANK-based integer percentile
    (`sketch.percentile_rank` — ties share a band, engine-portable);
    per band: n, lo/hi score, Σscore (emitted as the SUM, not a mean
    — integral division of possibly-negative sums truncates toward
    zero on Spark and floors on DuckDB, so the report never divides
    scores), and ``pos_ppm = positives·1e6 div n`` (non-negative, so
    `div` ≡ `//`).  Score col is expected integer (micros); NULL
    score or label rows are excluded (calibration is defined on
    scored + labeled rows only).

    Shape: one global rank window over scored rows (group it per
    source at 100 TB by calling per slice), one n_buckets-row
    aggregate."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    from .sketch import percentile_rank

    s, y = F.col(score_col), F.col(label_col)
    base = df.filter(s.isNotNull() & y.isNotNull()).select(
        s.cast("long").alias("_s"), y.cast("boolean").alias("_y")
    )
    ranked = percentile_rank(base, "_s", None, out_col="_pct")
    bucket = F.least(
        F.lit(int(n_buckets)),
        F.expr(f"(_pct * {int(n_buckets)}) div 1000000 + 1"),
    ).cast("int")
    return (
        ranked.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("_s").alias("lo_micro"),
            F.max("_s").alias("hi_micro"),
            F.sum("_s").cast("long").alias("sum_score_micro"),
            F.expr(
                "(sum(CASE WHEN _y THEN 1 ELSE 0 END) * 1000000)"
                " div count(1)"
            ).cast("long").alias("pos_ppm"),
        )
        .orderBy("bucket")
    )


def gains_table(
    scored: DataFrame,
    score_col: str,
    truth_col: str,
    n_bands: int = 10,
) -> DataFrame:
    """Cumulative gains / decile-lift table — the THIRD leg of the
    classifier-evaluation tier (pr_report picks a threshold,
    reliability_report checks calibration; this answers the triage
    question "if I only review the top 10%/20%/... by score, what
    share of the positives do I catch?").

    Banding is by SCORE-VALUE CUTS at exact ranks (cut k = the value
    at rank ⌈k·n/B⌉ in descending order — n_bands−1 bounded
    TakeOrdered jobs, the equi-depth-histogram pattern), NOT a global
    row_number window: no SinglePartition pass over the data ever
    runs.  Ties share a band (band sizes go uneven — the honest
    answer, same contract as the histogram).  The only window is the
    running cumulative over the ≤n_bands-row band AGGREGATE — bounded
    by construction.

    Total accounting (the pr_report contract): rows with NULL score
    or NULL truth are excluded from banding but counted —
    `n_excluded` rides every row, and Σn + n_excluded == input rows.

    Output per non-empty band (1 = top scores):
    (band, cut_score, n, n_pos, cum_n, cum_pos, gain_ppm, lift_ppm,
    n_excluded) — gain = cum_pos·1e6 div total_pos; lift =
    cum_pos·n_total·1e6 div (total_pos·cum_n), DECIMAL(38,0) inside
    so 1e12-row sweeps can't overflow."""
    if n_bands < 2:
        raise ValueError("n_bands must be >= 2")
    s, y = F.col(score_col), F.col(truth_col)
    counts = scored.agg(
        F.count(F.lit(1)).alias("_tot"),
        F.count(F.when(s.isNotNull() & y.isNotNull(), F.lit(1))).alias("_n"),
    ).first()
    n, n_excluded = int(counts["_n"]), int(counts["_tot"]) - int(counts["_n"])
    valid = scored.filter(s.isNotNull() & y.isNotNull()).select(
        s.alias("_s"), y.cast("boolean").alias("_y")
    )
    spark = scored.sparkSession
    if n == 0:
        return spark.createDataFrame(
            [], "band int, cut_score double, n long, n_pos long, "
                "cum_n long, cum_pos long, gain_ppm long, lift_ppm long, "
                "n_excluded long",
        )
    cuts = []
    for k in range(1, n_bands):
        rank = -(-k * n // n_bands)  # ceil(k*n/B)
        cuts.append(
            valid.orderBy(F.col("_s").desc())
            .limit(rank)
            .agg(F.min("_s").alias("c"))
            .first()["c"]
        )
    band = F.lit(n_bands)
    for k in range(len(cuts), 0, -1):
        band = F.when(F.col("_s") >= F.lit(cuts[k - 1]), F.lit(k)).otherwise(band)
    per_band = (
        valid.select(band.cast("int").alias("band"), "_y")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count(F.when(F.col("_y"), F.lit(1))).cast("long").alias("n_pos"),
        )
    )
    # the running window covers only the ≤n_bands-row aggregate —
    # bounded by construction, never the raw data
    w = Window.orderBy(F.col("band").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dec = "decimal(38,0)"
    cum = (
        per_band.withColumn("cum_n", F.sum("n").over(w).cast("long"))
        .withColumn("cum_pos", F.sum("n_pos").over(w).cast("long"))
    )
    total_pos = cum.agg(F.max("cum_pos").alias("tp"))
    out = cum.crossJoin(F.broadcast(total_pos))
    cut_map = F.create_map(
        *[x for k, c in enumerate(cuts, 1) for x in (F.lit(k), F.lit(c))]
    ) if cuts else None
    return out.select(
        "band",
        (cut_map[F.col("band")] if cut_map is not None else F.lit(None))
        .cast("double").alias("cut_score"),
        "n", "n_pos", "cum_n", "cum_pos",
        F.when(
            F.col("tp") > 0,
            F.expr("CAST(CAST(cum_pos AS DECIMAL(38,0)) * 1000000 div tp AS BIGINT)"),
        ).otherwise(F.lit(0)).cast("long").alias("gain_ppm"),
        F.when(
            (F.col("tp") > 0) & (F.col("cum_n") > 0),
            F.expr(
                f"CAST(CAST(cum_pos AS {dec}) * CAST({n} AS {dec}) * 1000000 "
                f"div (CAST(tp AS {dec}) * cum_n) AS BIGINT)"
            ),
        ).otherwise(F.lit(0)).cast("long").alias("lift_ppm"),
        F.lit(int(n_excluded)).cast("long").alias("n_excluded"),
    )

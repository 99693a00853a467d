"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's link-level dedup (SURVEY.md §2.6 O7, J3 —
ArticleServiceImpl.java:131-134), these are the document-level dedup
strategies a 100 TB corpus pipeline needs:

- exact          : content-hash groupBy (one shuffle on a 16-byte key)
- ngram Jaccard  : inverted-index join on shingles — never an O(n²)
                   cross join; candidate pairs only share ≥1 shingle
- MinHash + LSH  : constant-size signatures; banding → bucket join so
                   candidate generation is linear in corpus size
- SimHash        : 64-bit fingerprint; near-dup = small Hamming distance

Hash functions are deterministic arithmetic over md5 (stable across
engines/runs — required for the DuckDB oracle and for re-runs over an
append-only corpus to be idempotent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


from ..util import spread


def _md5_hash64(col: Column, salt: str = "") -> Column:
    """Deterministic 60-bit integer hash: first 15 hex chars of
    md5(salt || value) — reproducible in any engine with md5()."""
    salted = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def normalized_text(col: Column) -> Column:
    """Canonicalization before hashing: lowercase, collapse whitespace,
    trim — so trivial formatting differences don't defeat exact dedup."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup groups: normalized-content hash → groups with >1 doc.
    Returns (content_hash, dup_count, keep_id) where keep_id is the
    lowest id (the canonical survivor).  One shuffle on the hash key;
    group payload is ids only, not text."""
    hashed = df.select(
        F.md5(normalized_text(F.col(text_col))).alias("content_hash"),
        F.col(id_col),
    )
    return (
        hashed.groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min(id_col).alias("keep_id"))
        .filter(F.col("dup_count") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (lowest id) per distinct normalized content."""
    w = Window.partitionBy(normalized_text(F.col(text_col))).orderBy(F.col(id_col).asc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def char_shingles(col: Column, k: int = 5) -> Column:
    """k-char shingle set of the normalized text (distinct)."""
    norm = normalized_text(col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(norm, 1, 10**9).substr(i, F.lit(k))))


def token_ngrams(col: Column, n: int = 3) -> Column:
    """Word n-gram set (distinct) of the normalized text."""
    tokens = F.split(normalized_text(col), " ")
    count = F.greatest(F.size(tokens) - (n - 1), F.lit(0))
    idx = F.sequence(F.lit(1), F.greatest(count, F.lit(1)))
    grams = F.when(count > 0, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))).otherwise(F.array())
    return F.array_distinct(grams)


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard similarity ≥ threshold.

    Inverted-index formulation (no cross join):
      explode n-grams → self-join on the gram → count shared grams per
      pair → |A∩B| / (|A|+|B|−|A∩B|).
    Shuffles scale with total gram postings, not n².  Hot grams (stop
    phrases) are the skew risk at 100 TB — AQE skew-join splits them;
    a doc-frequency cap on grams is the stronger mitigation and is
    exposed via `max_gram_df`.
    """
    grams = spread(df, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(token_ngrams(F.col(text_col), n)).alias("gram"),
    )
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("set_size"))
    a, b = grams.alias("a"), grams.alias("b")
    shared = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("set_size").alias("size_b"))
    jac = F.col("shared") / (F.col("size_a") + F.col("size_b") - F.col("shared"))
    return (
        shared.join(sa, "id_a").join(sb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# Mersenne prime 2^31-1: affine rehash domain.  a*h+b stays < 2^62, no
# 64-bit overflow.
_MINHASH_P = (1 << 31) - 1


def _minhash_params(i: int) -> tuple[int, int]:
    """Deterministic affine coefficients for hash function i (shared by
    the pure-Python test reference)."""
    a = (i * 2654435761 + 1) % _MINHASH_P or 1
    b = (i * 40503 + 7) % _MINHASH_P
    return a, b


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 16,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signatures: one md5 base hash per gram, `num_hashes`
    affine rehashes (a_i·h+b_i mod 2³¹−1), min per doc.

    One hash computation per gram instead of num_hashes — the md5 is
    the expensive part; affine rehash is three integer ops.  Output:
    (id, sig: array<long>[num_hashes]) — a constant-size sketch,
    corpus-size-independent, which is what makes near-dup feasible at
    100 TB."""
    grams = spread(df, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(token_ngrams(F.col(text_col), shingle_n)).alias("gram"),
    )
    base = grams.select("id", (_md5_hash64(F.col("gram")) % _MINHASH_P).alias("h"))
    min_cols = []
    for i in range(num_hashes):
        a, b = _minhash_params(i)
        min_cols.append(F.min((F.col("h") * a + b) % _MINHASH_P).alias(f"h{i}"))
    mins = base.groupBy("id").agg(*min_cols)
    return mins.select("id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash + LSH near-dup candidate pairs, verified by estimated
    Jaccard (signature agreement rate) ≥ threshold.

    Banding: split the signature into `bands` bands of r rows; docs
    agreeing on ALL rows of any band land in the same bucket →
    candidates come from a groupBy on (band, band-hash), linear scale.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, num_hashes, shingle_n, text_col, id_col)
    band_entries = sigs.select(
        "id", "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(F.concat_ws(",", *[
                        F.col("sig").getItem(b * rows_per_band + r).cast("string")
                        for r in range(rows_per_band)
                    ])).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")
    a, b_ = band_entries.alias("a"), band_entries.alias("b")
    candidates = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est_jaccard = (
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0))),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.lit(float(num_hashes))
    )
    return candidates.select(
        "id_a", "id_b", F.round(est_jaccard, 6).alias("est_jaccard")
    ).filter(F.col("est_jaccard") >= threshold)


def token_hashes(col: Column, salt: str = "sh:") -> Column:
    """Distinct word tokens → 60-bit hash array (the SimHash input)."""
    tokens = F.array_distinct(F.split(normalized_text(col), " "))
    return F.transform(tokens, lambda t: _md5_hash64(t, salt=salt))


def simhash_from_hashes(hashes: Column) -> Column:
    """SimHash fingerprint from a precomputed hash array: each bit
    position accumulates +1/−1 votes across tokens; fingerprint bit =
    sign.  IMPORTANT: pass a MATERIALIZED column (e.g. produced behind
    an explode barrier) — this expression references `hashes` 60 times,
    and projection collapse would otherwise recompute the md5 per
    token per bit."""
    # F.shiftleft needs a literal bit count, so build per-bit masks as
    # python ints (exact long literals, no float detour)
    fingerprint = F.lit(0).cast("long")
    for bit in range(60):
        mask = F.lit(1 << bit).cast("long")
        vote = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )
        fingerprint = fingerprint.bitwiseOR(F.when(vote > 0, mask).otherwise(F.lit(0).cast("long")))
    return fingerprint


def simhash64(col: Column, salt: str = "sh:") -> Column:
    """64-bit SimHash as a single column expression (convenience form —
    for bulk scans prefer token_hashes + an explode barrier +
    simhash_from_hashes, as simhash_pairs does)."""
    return simhash_from_hashes(token_hashes(col, salt))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    blocks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance ≤ max_hamming.

    Pigeonhole blocking: split the 60-bit fingerprint into `blocks`
    15-bit blocks; any pair within distance < blocks must agree on at
    least one block → candidates via equi-join per block (union), then
    exact popcount verification.  Linear candidate generation."""
    # Generate barrier: hash each token once, then fold 60 bit-votes
    # over the materialized array (see simhash_from_hashes)
    hashed = spread(df, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(F.array(token_hashes(F.col(text_col)))).alias("_hashes"),
    )
    fps = hashed.select("id", simhash_from_hashes(F.col("_hashes")).alias("fp"))
    block_bits = 60 // blocks
    entries = fps.select(
        "id", "fp",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("blk"),
                    F.shiftright("fp", i * block_bits)
                    .bitwiseAND(F.lit((1 << block_bits) - 1).cast("long"))
                    .alias("key"),
                )
                for i in range(blocks)
            ])
        ).alias("e"),
    ).select("id", "fp", "e.blk", "e.key")
    a, b = entries.alias("a"), entries.alias("b")
    xor = F.col("a.fp").bitwiseXOR(F.col("b.fp"))
    candidates = (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.bit_count(xor).alias("hamming"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return candidates.filter(F.col("hamming") <= max_hamming)

"""Similarity search over embedding columns (array<float>).

Part of the 100 TB training-data extension set (BASELINE.json
north-star).  Two tiers:

- brute-force cosine top-k : exact baseline — broadcast the (small)
  query set against the corpus, JVM-side dot products via
  ``F.zip_with`` + ``F.aggregate`` (no Python in the loop).
- LSH-bucketed ANN         : random-hyperplane signatures (deterministic,
  seeded) → candidates share a bucket → exact re-rank inside buckets.
  Candidate generation is linear; at 100 TB bucket tables are
  pre-computed and partitioned by bucket key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries`` (query_id, embedding) is broadcast — the corpus is
    scanned once, no shuffle of the corpus side; the per-query top-k
    uses a window row_number which AQE executes as a partial top-k.
    """
    q = F.broadcast(queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec")))
    scored = corpus.crossJoin(q).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("_qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cos_sim", "rnk")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no numpy dependency in
    the executor path; generated once on the driver)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(vec · plane_i).
    Returns a compact string bucket key."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(float(x)) for x in plane])) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: exact cosine re-rank restricted to corpus
    vectors sharing a hyperplane bucket with the query in ANY of
    `n_tables` independent hash tables (OR-construction — the standard
    recall amplification; recall ≈ 1-(1-p^planes)^tables).

    At 100 TB the bucket tables are precomputed once and partitioned
    by (table, bucket); a query touches n_tables buckets, never the
    full corpus."""
    def bucket_entries(df, vec_name, out_cols):
        entries = []
        for t in range(n_tables):
            planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
            entries.append(
                df.select(
                    *out_cols,
                    F.lit(t).alias("_table"),
                    lsh_signature(F.col(vec_name), planes).alias("_bucket"),
                )
            )
        out = entries[0]
        for e in entries[1:]:
            out = out.unionByName(e)
        return out

    c = bucket_entries(corpus, vec_col, [F.col(id_col), F.col(vec_col)])
    q = F.broadcast(
        bucket_entries(
            queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec")),
            "_qvec",
            [F.col(query_id_col), F.col("_qvec")],
        )
    )
    candidates = (
        c.join(q, ["_table", "_bucket"])
        .select(query_id_col, id_col, vec_col, "_qvec")
        .dropDuplicates([query_id_col, id_col])
    )
    scored = candidates.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("_qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cos_sim", "rnk")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    seed: int = 42,
    dim: int | None = None,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ threshold).

    exact=True does the O(n²) self-join (oracle-checkable baseline at
    small SF); default is LSH-blocked: pairs must share a hyperplane
    bucket, which is the linear-candidate path for 100 TB.  High-
    threshold pairs almost always share all signs, so recall at 0.95+
    is near-1 even with few planes."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    if exact:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    else:
        if dim is None:
            raise ValueError("dim required for LSH blocking")
        planes = _hyperplanes(dim, n_planes, seed)
        a = a.withColumn("_bucket", lsh_signature(F.col("vec_a"), planes))
        b = b.withColumn("_bucket", lsh_signature(F.col("vec_b"), planes))
        pairs = a.join(b, "_bucket").filter(F.col("id_a") < F.col("id_b"))
    sim = F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6)
    return (
        pairs.select("id_a", "id_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )

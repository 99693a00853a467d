"""Distributed Lloyd k-means (similarity.kmeans_train_distributed):
the full-corpus trainer whose per-iteration driver traffic is k×(d+1)
integers — and whose arithmetic is exactly replayable off-Spark
(kmeans_lloyd_replay), which is what the semdedup gate's 'km'/'kmc'
rows pin at driver level."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_pipeline_with_kafka_spark.operators import similarity as sim


def _df(spark, mat: np.ndarray):
    rows = [(i, [float(x) for x in mat[i]]) for i in range(len(mat))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_distributed_matches_pure_python_replay(spark):
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(60, 8)).astype(np.float32)
    df = _df(spark, mat)
    _cids, cm = sim.kmeans_train_distributed(df, k=5, iters=4)
    vecs = [(i, [float(x) for x in mat[i]]) for i in range(len(mat))]
    cm2, assign2 = sim.kmeans_lloyd_replay(vecs, k=5, iters=4)
    assert np.array_equal(cm, np.array(cm2))  # bit-identical centroids
    vec = F.col("embedding").cast("array<double>")
    got = {
        r.vec_id: r.cid
        for r in df.select(
            "vec_id", sim._kmeans_assign_col(vec, [list(c) for c in cm]).alias("cid")
        ).collect()
    }
    assert got == assign2


def test_empty_cluster_keeps_previous_centroid(spark):
    # first two init vectors are identical → ties assign to the FIRST
    # centroid, the second cluster goes empty and must keep its
    # (duplicate) centroid — deterministically, on both engines
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(20, 4)).astype(np.float32)
    mat[1] = mat[0]
    df = _df(spark, mat)
    _cids, cm = sim.kmeans_train_distributed(df, k=3, iters=3)
    vecs = [(i, [float(x) for x in mat[i]]) for i in range(len(mat))]
    cm2, _ = sim.kmeans_lloyd_replay(vecs, k=3, iters=3)
    assert np.array_equal(cm, np.array(cm2))


def test_recovers_separated_blobs(spark):
    rng = np.random.default_rng(3)
    blobs = []
    for c in range(3):
        center = np.zeros(6)
        center[c] = 50.0
        blobs.append(center + rng.normal(scale=0.5, size=(10, 6)))
    # interleave so the first-k init draws from distinct blobs
    mat = np.empty((30, 6))
    for i in range(10):
        for c in range(3):
            mat[i * 3 + c] = blobs[c][i]
    df = _df(spark, mat.astype(np.float32))
    _cids, cm = sim.kmeans_train_distributed(df, k=3, iters=5)
    vec = F.col("embedding").cast("array<double>")
    out = df.select(
        "vec_id", sim._kmeans_assign_col(vec, [list(c) for c in cm]).alias("cid")
    ).collect()
    # every member of a blob lands in the same cluster
    by_blob: dict[int, set[int]] = {}
    for r in out:
        by_blob.setdefault(r.vec_id % 3, set()).add(r.cid)
    assert all(len(cids) == 1 for cids in by_blob.values())
    assert len({next(iter(v)) for v in by_blob.values()}) == 3


def test_k_larger_than_corpus_raises(spark):
    df = _df(spark, np.zeros((2, 3), dtype=np.float32))
    with pytest.raises(ValueError, match="< k="):
        sim.kmeans_train_distributed(df, k=5)
    with pytest.raises(ValueError, match="< k="):
        sim.kmeans_lloyd_replay([(0, [0.0, 0.0, 0.0])], k=2)

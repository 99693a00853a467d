"""foreachBatch MERGE sinks (SURVEY.md §2.1 S9-S10, §3.4).

The reference's SyncService replicates CDC into MySQL with
``INSERT ... ON DUPLICATE KEY UPDATE`` (targetDB1/SyncService.py:87-140)
and handles deletes as soft-delete on articles / hard delete on media
(SyncService.py:143-146,255-283).  Delivery is at-least-once made
effectively-once by idempotent upserts (SURVEY §2.8 T5).

Spark-first: Structured Streaming ``foreachBatch`` applying a keyed
MERGE.  Without a Delta/Iceberg runtime in this container, the MERGE is
implemented as a partition-aware parquet rewrite:  anti-join out
replaced keys, union the new images, write back.  On a lakehouse table
format the body of ``merge_upsert`` becomes a single ``MERGE INTO``;
the calling convention and idempotency contract are identical.

Idempotency: replaying a batch yields identical target state because
(a) the upsert keys on the primary key, (b) within a batch only the
LAST image per key (by ts, then op-order) is applied, and (c) deletes
win over earlier upserts of the same key in the same batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_image_per_key(batch: DataFrame, key: str = "id", ts_col: str = "ts") -> DataFrame:
    """Collapse a CDC micro-batch to the last event per key — ordering
    by event time then a stable op priority (d > u > c/r at equal ts,
    matching 'final state wins' replication).

    The key is taken from the top-level column when present, else
    derived as coalesce(after.key, before.key) (parse_envelope output
    keeps images nested)."""
    op_rank = F.when(F.col("op") == "d", 3).when(F.col("op") == "u", 2).otherwise(1)
    key_col = (
        F.col(key)
        if key in batch.columns
        else F.coalesce(F.col(f"after.{key}"), F.col(f"before.{key}"))
    )
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).desc(), op_rank.desc())
    return batch.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def _read_target(spark: SparkSession, path: str, like: DataFrame) -> DataFrame:
    if os.path.exists(path):
        return spark.read.parquet(path)
    return spark.createDataFrame([], like.schema)


def merge_upsert(
    spark: SparkSession,
    batch: DataFrame,
    target_path: str,
    key: str = "id",
    soft_delete: bool = True,
    ts_col: str = "ts",
) -> DataFrame:
    """S9/S10: apply a CDC micro-batch to the target table.

    - op c/r/u → upsert the after-image (insert or replace by key)
    - op d     → articles-style soft delete (is_deleted=true, after
      image from `before`) when soft_delete, else drop the row (media-
      style hard delete, SyncService.py:277-283)

    Returns the new target DataFrame (also written to target_path).
    """
    latest = latest_image_per_key(batch, key, ts_col)
    upserts = (
        latest.filter(F.col("op").isin("c", "r", "u"))
        .select("after.*")
        .filter(F.col(key).isNotNull())
    )
    deletes = latest.filter(F.col("op") == "d").select(
        F.coalesce(F.col(f"before.{key}"), F.col(f"after.{key}")).alias(key),
        F.col("before").alias("_before"),
    ).filter(F.col(key).isNotNull())

    target = _read_target(spark, target_path, upserts)
    touched = latest.select(
        F.coalesce(F.col(f"after.{key}"), F.col(f"before.{key}")).alias(key)
    ).filter(F.col(key).isNotNull()).distinct()

    untouched = target.join(touched, key, "left_anti")
    new_rows = [untouched, upserts]
    if soft_delete:
        soft = deletes.select("_before.*").withColumn("is_deleted", F.lit(True))
        # keep prior row content if the delete event lacks a before-image
        prior = target.join(deletes.select(key), key, "left_semi").withColumn(
            "is_deleted", F.lit(True)
        )
        soft_ids = soft.select(key)
        new_rows.append(soft.filter(F.col(key).isNotNull()))
        new_rows.append(prior.join(soft_ids, key, "left_anti"))
    merged = new_rows[0]
    for piece in new_rows[1:]:
        merged = merged.unionByName(piece, allowMissingColumns=True)

    # The two-step write exists because `merged` reads from target_path
    # (can't overwrite a path being scanned).  NOT atomic: a crash
    # between the two overwrites can leave target_path mid-rewrite —
    # the checkpointed source batch replays and the idempotent merge
    # restores it, but a concurrent READER of the raw path can observe
    # the partial state.  On Delta/Iceberg the same body is an atomic
    # MERGE INTO and this window disappears; on raw parquet, point
    # readers at a view/manifest, not the live path.
    import shutil

    tmp = target_path + "._tmp"
    merged.write.mode("overwrite").parquet(tmp)
    result = spark.read.parquet(tmp)
    result.write.mode("overwrite").parquet(target_path)
    out = spark.read.parquet(target_path)  # reads the final path, not tmp
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def merge_upsert_partitioned(
    spark: SparkSession,
    batch: DataFrame,
    target_path: str,
    key: str = "id",
    partition_col: str = "stored_date",
    soft_delete: bool = True,
    ts_col: str = "ts",
) -> None:
    """S9/S10 at scale: partition-aware MERGE.

    The naive merge rewrites the whole target — O(table) per batch.
    This variant partitions the target by `partition_col` (the
    reference's articles carry stored_date yyyyMMdd — natural event-day
    partitioning) and rewrites ONLY the partitions the batch touches:

      1. collapse the batch to last-image-per-key,
      2. find touched partition values (a few per batch),
      3. read just those partitions (partition-pruned scan),
      4. merge, and write back with dynamic partition overwrite.

    Per-batch cost scales with touched-partition size, not table size —
    the property that makes continuous replication viable at 100 TB.
    On Delta/Iceberg this whole body is `MERGE INTO`; the contract and
    idempotency guarantees are identical.
    """
    latest = latest_image_per_key(batch, key, ts_col)
    upserts = (
        latest.filter(F.col("op").isin("c", "r", "u"))
        .select("after.*")
        .filter(F.col(key).isNotNull() & F.col(partition_col).isNotNull())
    )
    # deletes stay a DataFrame end-to-end: a bulk-delete CDC batch must
    # never become a driver-side key list / giant IN expression — the
    # delete set is applied via broadcast-able joins below.
    deletes = (
        latest.filter(F.col("op") == "d")
        .select(
            F.col(f"before.{key}").alias(key),
            F.col(f"before.{partition_col}").alias(partition_col),
        )
        .filter(F.col(key).isNotNull())
    )
    # The ONLY collect is the touched PARTITION VALUES — bounded by the
    # number of event-day partitions a batch spans (a handful), never by
    # row count.
    touched = {
        r[0]
        for r in upserts.select(partition_col)
        .union(deletes.select(partition_col))
        .distinct()
        .collect()
        if r[0] is not None
    }
    if not touched:
        return
    import os

    delete_keys = deletes.select(key).distinct()
    if os.path.exists(target_path):
        target = spark.read.parquet(target_path).filter(
            F.col(partition_col).isin(list(touched))
        )
        untouched = target.join(upserts.select(key).distinct(), key, "left_anti")
        if not soft_delete:
            # media-style hard delete (SyncService.py:277-283): drop
            # deleted keys from the carried-over rows
            untouched = untouched.join(delete_keys, key, "left_anti")
        merged = untouched.unionByName(upserts, allowMissingColumns=True)
    else:
        merged = upserts
        if not soft_delete:
            merged = merged.join(delete_keys, key, "left_anti")
    if soft_delete:
        # articles-style soft delete: mark via a join, not isin(list)
        marks = delete_keys.withColumn("_mark_deleted", F.lit(True))
        merged = (
            merged.join(marks, key, "left")
            .withColumn(
                "is_deleted",
                F.when(F.col("_mark_deleted"), F.lit(True)).otherwise(
                    F.coalesce(F.col("is_deleted"), F.lit(False))
                ),
            )
            .drop("_mark_deleted")
        )
    with _partition_overwrite(spark):
        (
            merged.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(target_path)
        )


class _partition_overwrite:
    """Temporarily switch to dynamic partition overwrite so only the
    partitions present in the written DataFrame are replaced."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", self.prev)


def make_merge_sink(target_path: str, key: str = "id", soft_delete: bool = True):
    """Wrap merge_upsert as a foreachBatch callback:
    ``stream.writeStream.foreachBatch(make_merge_sink(...))``."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert(batch_df.sparkSession, batch_df, target_path, key, soft_delete)

    return sink


def observed_batch(batch: DataFrame, name: str = "batch_metrics"):
    """A14: per-batch success/error tallies (SyncService.py:454-468)
    via the Observation API — metrics ride the job, no extra pass.

    Returns (df, observation); read `observation.get` after an action.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = batch.observe(
        obs,
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("op").isin("c", "r", "u"), 1).otherwise(0)).alias("n_upserts"),
        F.sum(F.when(F.col("op") == "d", 1).otherwise(0)).alias("n_deletes"),
        F.sum(F.when(F.col("op").isNull(), 1).otherwise(0)).alias("n_errors"),
    )
    return observed, obs


def kafka_sink_options(topic: str) -> dict[str, str]:
    """S7/S8 producer parity (keyword_republisher.py:48-57): snappy,
    acks=all, small linger for batching."""
    return {
        "topic": topic,
        "kafka.compression.type": "snappy",
        "kafka.acks": "all",
        "kafka.linger.ms": "10",
        "kafka.batch.size": "16384",
    }


def reconcile_snapshot(
    spark: SparkSession,
    source: DataFrame,
    target_path: str,
    key: str = "id",
    compare_cols: list[str] | None = None,
) -> tuple[DataFrame, dict]:
    """Audit-and-repair cycle: diff the replicated table against a
    source snapshot and apply ONLY the drift — the set-oriented form
    of the reference's SyncService full-resync (which re-upserts
    every row, targetDB1/SyncService.py:87-140; at 100 TB you ship
    the patch, not the table).

    Composes the engine's own primitives end-to-end:
    ``operators.relational.snapshot_diff(include_values=True)``
    produces the applicable patch (insert/update rows with NEW-side
    values, delete keys), which is re-expressed as minimal CDC
    envelopes and replayed through the SAME `merge_upsert` path the
    streaming sink uses (hard deletes — reconciliation means the
    replica must EQUAL the source, so a soft-delete tombstone would
    itself be drift on the next audit).

    Returns ``(new_target_df, counts)`` with counts =
    {'insert': n, 'update': n, 'delete': n}.  Fixed point: after one
    application the diff is empty and a second pass applies nothing
    (pinned in tests).  Scale: the diff is one key-partitioned outer
    join; the apply rewrites the target via merge_upsert — partition
    both by the key (or use merge_upsert_partitioned's touched-
    partition rewrite) when the table outgrows a full rewrite."""
    from ..operators.relational import snapshot_diff

    replica = _read_target(spark, target_path, source)
    patch = snapshot_diff(
        replica, source, [key],
        compare_cols=compare_cols, include_values=True,
    ).localCheckpoint(eager=True)
    counts = {r["change"]: r["n"] for r in patch.groupBy("change").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    counts = {c: int(counts.get(c, 0)) for c in ("insert", "update", "delete")}
    value_cols = [
        c for c in patch.columns if c not in (key, "change", "n_changed_cols")
    ]
    env = patch.select(
        F.when(F.col("change") == "delete", F.lit("d"))
        .when(F.col("change") == "insert", F.lit("c"))
        .otherwise(F.lit("u")).alias("op"),
        F.struct(F.col(key), *[F.col(c) for c in value_cols]).alias("after"),
        F.struct(F.col(key)).alias("before"),
        F.lit(0).cast("long").alias("ts"),
    )
    out = merge_upsert(
        spark, env, target_path, key=key, soft_delete=False, ts_col="ts"
    )
    return out, counts

# A/B: quantile_normalize — replace the SinglePartition global
# row_number over the whole reference (and the global count window)
# with a range-partitioned sort + per-partition row_number + an
# in-plan partition-offset cumsum (tiny frame), fully lazy.  Value-
# identical: any rank assignment consistent with the value order maps
# rank -> value identically (ties carry equal values).
from pyspark.sql import functions as F, Window


def quantile_normalize_v2(df, value_col, group_cols, reference=None, n_cuts=1000):
    if n_cuts < 1 or 1_000_000 % n_cuts != 0:
        raise ValueError("n_cuts must divide 1e6 (e.g. 100, 1000)")
    step = 1_000_000 // n_cuts
    ref = reference if reference is not None else df
    spark = df.sparkSession
    rv = F.col(value_col)
    pid = F.spark_partition_id()
    local = (
        ref.select(rv.alias("_rv"))
        .filter(F.col("_rv").isNotNull())
        .repartitionByRange(F.col("_rv"))
        .withColumn("_pid", pid)
        .withColumn(
            "_lrn",
            F.row_number().over(
                Window.partitionBy("_pid").orderBy(F.col("_rv").asc())
            ),
        )
    )
    sizes = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    offs = sizes.select(
        "_pid",
        (
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("_off"),
        F.sum("_n").over(Window.orderBy("_pid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )).alias("_nn"),
    ).select("_pid", F.coalesce("_off", F.lit(0)).alias("_off"), "_nn")
    ranked_ref = local.join(F.broadcast(offs), "_pid").select(
        "_rv", (F.col("_off") + F.col("_lrn")).alias("_rn"), "_nn"
    )
    grid = spark.range(1, n_cuts + 1).select(
        (F.col("id") * F.lit(step)).cast("long").alias("_q_ppm")
    )
    targets = grid.crossJoin(
        F.broadcast(offs.select("_nn").limit(1))
    ).select(
        "_q_ppm",
        F.expr("CAST((_q_ppm * _nn + 999999) div 1000000 AS BIGINT)").alias("_rn"),
    )
    cuts = F.broadcast(targets).join(ranked_ref, "_rn").select(
        "_q_ppm", F.col("_rv").alias("value_qn")
    )
    # row side: PRODUCTION code verbatim (sketch.py:1215-1224)
    from cdc_pipeline_with_kafka_spark.operators.sketch import percentile_rank
    ranked = percentile_rank(df, value_col, group_cols, out_col="_pct")
    idx = F.expr(
        f"greatest(CAST(1 AS BIGINT), (_pct * {n_cuts} + 999999) div 1000000)"
    )
    with_q = ranked.withColumn(
        "_q_ppm",
        F.when(F.col("_pct").isNotNull(), idx * F.lit(step)).cast("long"),
    )
    return with_q.join(F.broadcast(cuts), ["_q_ppm"], "left") \
        .drop("_q_ppm", "_pct")


import cdc_pipeline_with_kafka_spark.operators.sketch as SK

ev = spark.read.parquet(SF + "/events.parquet")
old = SK.quantile_normalize(ev, "value", ["event_type"], n_cuts=1000)
new = quantile_normalize_v2(ev, "value", ["event_type"], n_cuts=1000)
print("old cols:", old.columns)
print("new cols:", new.columns)
print("hash old:", hashdf(old.select(old.columns)))
print("hash new:", hashdf(new.select(old.columns)))
for _ in range(3):
    print("old t:", time_noop(old), "new t:", time_noop(new))

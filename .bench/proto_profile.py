# A/B: table_profile single-agg (Expand + string-buffered SortAggregate
# over 6n expanded rows sorted by every column incl. full text) vs the
# r12 split: regular aggs (count/nulls/min/max — one global no-key agg,
# no Expand) crossJoined with the distinct-count agg (Expand + pure
# count buffers -> HashAggregate phases, no Sort anywhere).
# exec with harness loaded.
from pyspark.sql import functions as F


def table_profile_v2(df, cols=None, approx_distinct=False):
    cols = list(cols or df.columns)
    dtypes = dict(df.dtypes)
    reg = [F.count(F.lit(1)).alias("_rows")]
    dis = []
    for c in cols:
        col = F.col(c)
        reg.append(
            F.coalesce(
                F.sum(F.when(col.isNull(), 1).otherwise(0)), F.lit(0)
            ).alias(f"_n_{c}")
        )
        if dtypes[c].startswith("map"):
            dis.append(F.lit(None).cast("long").alias(f"_d_{c}"))
        else:
            dis.append(
                (
                    F.approx_count_distinct(col)
                    if approx_distinct
                    else F.count_distinct(col)
                ).alias(f"_d_{c}")
            )
        simple = not dtypes[c].startswith(("array", "struct", "map", "binary"))
        reg.append(
            (F.min(col).cast("string") if simple else F.lit(None).cast("string")).alias(f"_lo_{c}")
        )
        reg.append(
            (F.max(col).cast("string") if simple else F.lit(None).cast("string")).alias(f"_hi_{c}")
        )
    one = df.agg(*reg).crossJoin(df.agg(*dis))
    stacked = ", ".join(
        f"'{c}', _n_{c}, _d_{c}, _lo_{c}, _hi_{c}" for c in cols
    )
    return one.selectExpr(
        "_rows AS n_rows",
        f"stack({len(cols)}, {stacked}) AS (column, n_nulls, n_distinct, min_str, max_str)",
    ).select(
        "column",
        F.col("n_rows").cast("long"),
        F.col("n_nulls").cast("long"),
        F.col("n_distinct").cast("long"),
        "min_str",
        "max_str",
    )


from cdc_pipeline_with_kafka_spark.operators import sketch as SK

docs = spark.read.parquet(SF + "/documents.parquet")
old = SK.table_profile(docs)
new = table_profile_v2(docs)
print("hash old:", hashdf(old))
print("hash new:", hashdf(new))
for r in range(3):
    print("old t:", time_noop(old), "new t:", time_noop(new))
from cdc_pipeline_with_kafka_spark.util import plan_facts
po, pn = plan_facts(old), plan_facts(new)
print("old:", po["exchanges"], "ex,", po.get("sorts"), "sorts; new:", pn["exchanges"], "ex,", pn.get("sorts"), "sorts")

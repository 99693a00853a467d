# cost anatomy of spread(): round-robin + sortBeforeRepartition vs
# hash-on-all-columns partitioning (no sort needed), corr agg downstream
from pyspark.sql import functions as F

cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
micro = 1_000_000
li = spark.read.parquet(SF + "/lineitem.parquet").select(*cols)
qn = li.select(*[F.expr(f"CAST(round({c} * {micro}, 0) AS BIGINT)").alias(f"_q{i}") for i, c in enumerate(cols)])
pairs = [(i, j) for i in range(4) for j in range(i + 1, 4)]
dec = "decimal(38,0)"
def aggs():
    out = []
    for p, (i, j) in enumerate(pairs):
        qx, qy = F.col(f"_q{i}"), F.col(f"_q{j}")
        both = qx.isNotNull() & qy.isNotNull()
        gx = F.when(both, qx.cast(dec)); gy = F.when(both, qy.cast(dec))
        out += [F.count(F.when(both, F.lit(1))).cast(dec).alias(f"_n_{p}"),
                F.sum(gx).alias(f"_sx_{p}"), F.sum(gy).alias(f"_sy_{p}"),
                F.sum(gx * qy).alias(f"_sxy_{p}"), F.sum(gx * qx).alias(f"_sxx_{p}"),
                F.sum(gy * qy).alias(f"_syy_{p}")]
    return out

rr = qn.repartition(32).agg(*aggs())
hashall = qn.repartition(32, F.xxhash64(*[F.col(f"_q{i}") for i in range(4)])).agg(*aggs())
print("A roundrobin+sort:", time_noop(rr), time_noop(rr), time_noop(rr))
spark.conf.set("spark.sql.execution.sortBeforeRepartition", "false")
rr2 = qn.repartition(32).agg(*aggs())
print("B roundrobin-nosort:", time_noop(rr2), time_noop(rr2), time_noop(rr2))
spark.conf.set("spark.sql.execution.sortBeforeRepartition", "true")
print("C hash(allcols):  ", time_noop(hashall), time_noop(hashall), time_noop(hashall))
# D: quantize AFTER the exchange (shuffle raw doubles)
raw = li.repartition(32, F.xxhash64(*[F.col(c) for c in cols]))
qpost = raw.select(*[F.expr(f"CAST(round({c} * {micro}, 0) AS BIGINT)").alias(f"_q{i}") for i, c in enumerate(cols)]).agg(*aggs())
print("D hash+quantpost: ", time_noop(qpost), time_noop(qpost), time_noop(qpost))

# Interleaved A/B at sf1: keyless spread as r11 round-robin vs the r12
# xxhash64 hash-partition, on a_stats_suite branches — the sf1 close
# bench read the whole suite ~1.6-2.2x slower than the r11 artifact on
# byte-unchanged code.  'path'/'sesa'/'qn' ride the shared
# ev = spread(events) seam; 'ohlc' reads events WITHOUT spread and is
# the control: if it moves with the swap something else is at play; if
# it stays slow under both, the suite-wide delta is environmental.
import cdc_pipeline_with_kafka_spark.util as U
from pyspark.sql import functions as F

_new_spread = U.spread

def _old_spread(df, *cols):
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        pass
    if cols:
        return df.repartition(target, *[F.col(c) for c in cols])
    return df.repartition(target)  # round-robin (+ map-side local sort)

import cdc_pipeline_with_kafka_spark.operators.windows as OW
import cdc_pipeline_with_kafka_spark.operators.stats as OS
import cdc_pipeline_with_kafka_spark.operators.sketch as OK
import cdc_pipeline_with_kafka_spark.operators.trends as OT
import cdc_pipeline_with_kafka_spark.operators.relational as OR
MODS = [U, OW, OS, OK, OT, OR]

def _set_spread(fn):
    for m in MODS:
        if hasattr(m, 'spread'):
            m.spread = fn

S1 = '/root/repo/.sfscale/sf1'
BR = ['ohlc', 'path', 'sesa', 'qn']
res = {t: {b: [] for b in BR} for t in ('old', 'new')}
for rnd in range(3):
    for tag, fn in (("old", _old_spread), ("new", _new_spread)):
        _set_spread(fn)
        df = q.a_stats_suite(spark, S1)
        for b in BR:
            res[tag][b].append(time_branch(df, b))
_set_spread(_new_spread)
print("AB SPREAD SF1", res)

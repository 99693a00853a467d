"""Interactive measurement harness for optimization round 12.

Usage (inside python REPL):
    exec(open('.bench/harness.py').read())
    t = time_df(q.a_stats_suite(spark, SF))          # suite-level steady count
    t = time_branch(q.a_stats_suite(spark, SF), 'ewma')
"""
import os, sys, time
sys.path.insert(0, '/root/repo')
os.chdir('/root/repo')
SF = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')

from cdc_pipeline_with_kafka_spark import queries as q
from cdc_pipeline_with_kafka_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark('opt-r12')
spark.sparkContext.setLogLevel('ERROR')


def _warm_python_workers():
    from pyspark.sql.types import DoubleType
    noop = F.pandas_udf(lambda x: x * 1.0, DoubleType())
    cpus = spark.sparkContext.defaultParallelism
    spark.range(cpus * 4).repartition(cpus).select(noop(F.col('id').cast('double'))).count()


def time_df(df, n=3, label=None):
    """Warm pass + best-of-n count — the bench's own steady methodology."""
    if label:
        spark.sparkContext.setJobDescription(label)
    df.count()
    best = float('inf')
    for _ in range(n):
        s = time.perf_counter()
        df.count()
        best = min(best, time.perf_counter() - s)
    spark.sparkContext.setJobDescription(None)
    return round(best, 3)


def time_branch(df, case, n=3):
    return time_df(df.filter(F.col('suite_case') == case), n=n, label=case)


def time_noop(df, n=3, label=None):
    """Warm + best-of-n noop-sink write (computes every column)."""
    if label:
        spark.sparkContext.setJobDescription(label)
    def run():
        df.write.format('noop').mode('overwrite').save()
    run()
    best = float('inf')
    for _ in range(n):
        s = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - s)
    spark.sparkContext.setJobDescription(None)
    return round(best, 3)


def plan(df):
    print(df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), 'formatted'))


def hashdf(df):
    """Order-insensitive content hash of a DataFrame (column-name-aware)."""
    from pyspark.sql.types import StringType
    cols = [F.coalesce(F.col(c).cast('string'), F.lit('<NULL>')) for c in df.columns]
    h = df.select(F.sha2(F.concat_ws('\x01', *cols), 256).alias('h'))
    row = h.agg(F.sum(F.conv(F.substring('h', 1, 15), 16, 10).cast('decimal(38,0)')).alias('s'), F.count('*').alias('n')).collect()[0]
    return (str(row['s']), row['n'])


_warm_python_workers()
q.q1_pricing_summary(spark, SF).count()
print('harness ready; SF=', SF)

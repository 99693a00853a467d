"""Dump .explain('formatted') for every bench query to plans/r13/<q>_after.txt."""
import os, sys
sys.path.insert(0, '/root/repo')
os.chdir('/root/repo')
SF = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
from cdc_pipeline_with_kafka_spark import queries as q
from cdc_pipeline_with_kafka_spark.session import get_spark

spark = get_spark('plans-r13')
spark.sparkContext.setLogLevel('ERROR')
os.makedirs('plans/r13', exist_ok=True)
for name, fn in q.BENCH_FNS.items():
    df = fn(spark, SF)
    txt = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), 'formatted')
    with open(f'plans/r13/{name}_after.txt', 'w') as f:
        f.write(txt)
    print('wrote', name, flush=True)
spark.stop()
print('DONE')

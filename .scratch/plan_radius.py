import sys
sys.path.insert(0, "/root/repo")
from etl_generator_demo_spark.registry import load_all
from etl_generator_demo_spark.session import get_spark
spark = get_spark("plan-debug")
spark.sparkContext.setLogLevel("ERROR")
reg = load_all()
df = reg["x3_radius_search"].fn(spark, "/root/testdata/sf0.01")
df.collect()
plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
print(plan)

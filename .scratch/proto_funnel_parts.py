import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
from etl_generator_demo_spark.operators.surfaces_r13 import x4_decontam_funnel, x3_semantic_decontam
from etl_generator_demo_spark.operators.surfaces_r12b import x4_fuzzy_decontam
from etl_generator_demo_spark.operators.textops import x4_decontaminate

def tm(label, fn, n=3):
    best = 1e9
    for _ in range(n):
        t0=time.time(); fn(); best=min(best, time.time()-t0)
    print(label, round(best,2))

tm("exact ", lambda: x4_decontaminate(spark, SF).collect())
tm("fuzzy ", lambda: x4_fuzzy_decontam(spark, SF).collect())
tm("sem   ", lambda: x3_semantic_decontam(spark, SF).collect())
tm("funnel", lambda: x4_decontam_funnel(spark, SF).collect())

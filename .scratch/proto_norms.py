import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
from etl_generator_demo_spark.operators.similarity import _as_double, cosine, _dot, _norm
from etl_generator_demo_spark.operators.textops import DECONTAM_MOD, DECONTAM_REMAINDER
TAU = 350_000
emb = spark.read.parquet(SF + "/embeddings.parquet")
is_eval = F.col("vec_id") % DECONTAM_MOD == DECONTAM_REMAINDER
e = emb.select("vec_id", _as_double("embedding").alias("v"))

def brute_hof():
    ev = F.broadcast(e.filter(is_eval).select(F.col("v").alias("ev_v")))
    return (e.filter(~is_eval).crossJoin(ev)
        .select(F.col("vec_id").alias("train_doc"),
                F.floor(cosine(F.col("v"), F.col("ev_v")) * 1_000_000).cast("long").alias("cos_e6"))
        .filter(F.col("cos_e6") >= TAU).groupBy("train_doc")
        .agg(F.count(F.lit(1)).cast("long").alias("n"), F.max("cos_e6").alias("m"))
        .orderBy("train_doc"))

def brute_norms():
    tr = e.filter(~is_eval).withColumn("nt", _norm(F.col("v")))
    ev = F.broadcast(e.filter(is_eval).select(F.col("v").alias("ev_v"))
                      .withColumn("ne", _norm(F.col("ev_v"))))
    return (tr.crossJoin(ev)
        .select(F.col("vec_id").alias("train_doc"),
                F.floor(F.try_divide(_dot(F.col("v"), F.col("ev_v")),
                                     F.col("nt") * F.col("ne")) * 1_000_000).cast("long").alias("cos_e6"))
        .filter(F.col("cos_e6") >= TAU).groupBy("train_doc")
        .agg(F.count(F.lit(1)).cast("long").alias("n"), F.max("cos_e6").alias("m"))
        .orderBy("train_doc"))

a = [tuple(r) for r in brute_hof().collect()]
b = [tuple(r) for r in brute_norms().collect()]
print("EQUAL:", a == b, len(a), len(b))
for label, fn in (("hof", brute_hof), ("norms", brute_norms)):
    best=1e9
    for _ in range(3):
        t0=time.time(); fn().collect(); best=min(best,time.time()-t0)
    print(label, round(best,3))

import sys, time, os
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "8g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"

from etl_generator_demo_spark.operators.surfaces_r13 import x4_decontam_funnel, x3_semantic_decontam
from etl_generator_demo_spark.operators.surfaces_r12b import x4_fuzzy_decontam
from etl_generator_demo_spark.operators.textops import DECONTAM_MOD, DECONTAM_REMAINDER, x4_decontaminate
from etl_generator_demo_spark.operators.relational import t

def funnel_variant(spark, sf_dir, mode):
    docs = t(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % DECONTAM_MOD == DECONTAM_REMAINDER
    pop = docs.filter(~is_eval).select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok"))
    exact_flag = x4_decontaminate(spark, sf_dir).select("doc_id")
    fuzzy_flag = x4_fuzzy_decontam(spark, sf_dir).select(F.col("train_doc").alias("doc_id"))
    sem_flag = x3_semantic_decontam(spark, sf_dir).select(F.col("train_doc").alias("doc_id"))
    if mode == "ckpt":
        exact_flag = exact_flag.localCheckpoint(eager=False)
        fuzzy_flag = fuzzy_flag.localCheckpoint(eager=False)
        sem_flag = sem_flag.localCheckpoint(eager=False)
    elif mode == "persist":
        exact_flag = exact_flag.persist(); fuzzy_flag = fuzzy_flag.persist(); sem_flag = sem_flag.persist()
    s2 = pop.join(exact_flag, "doc_id", "left_anti")
    s3 = s2.join(fuzzy_flag, "doc_id", "left_anti")
    s4 = s3.join(sem_flag, "doc_id", "left_anti")
    def stage(no, name, df):
        return df.agg(F.lit(no).cast("long").alias("stage_no"), F.lit(name).alias("stage"),
                      F.count(F.lit(1)).cast("long").alias("n_docs"), F.sum("n_tok").cast("long").alias("n_tokens"))
    return (stage(1,"train_total",pop).unionByName(stage(2,"after_exact_ngram",s2))
            .unionByName(stage(3,"after_fuzzy_minhash",s3)).unionByName(stage(4,"after_semantic_cosine",s4))
            .orderBy("stage_no"))

# warm caches/JIT with one throwaway sf0.01 run
_ = funnel_variant(spark, "/root/testdata/sf0.01", "none").collect()

for mode in ("none", "ckpt", "persist", "none", "ckpt", "persist"):
    t0 = time.time()
    rows = funnel_variant(spark, SF, mode).collect()
    print(mode, round(time.time()-t0, 2), [tuple(r) for r in rows][:1])

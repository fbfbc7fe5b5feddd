"""Prototype: exact cosine-threshold decontam via ball-bound pruned IVF."""
import sys, time, os, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
from etl_generator_demo_spark.operators.similarity import _as_double, cosine, build_ivf_index
from etl_generator_demo_spark.operators.textops import DECONTAM_MOD, DECONTAM_REMAINDER

TAU_E6 = 350_000
SF = "/root/testdata/sf0.01"

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))

# --- build normalized-space IVF with per-list radii
from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector

norm = F.sqrt(F.aggregate(F.transform(_as_double("embedding"), lambda x: x*x), F.lit(0.0), lambda s,v: s+v))
nemb = emb.withColumn("_vhat", F.transform(_as_double("embedding"), lambda x: F.try_divide(x, norm)))
ml_df = nemb.withColumn("_features", array_to_vector("_vhat"))
model = KMeans(k=16, seed=42, featuresCol="_features", predictionCol="ivf_list").fit(ml_df)
assigned = model.transform(ml_df).drop("_features")
centroids = [list(map(float, c)) for c in model.clusterCenters()]

# per-list radius over normalized vectors
cexpr = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
dist_to_c = F.sqrt(F.aggregate(
    F.zip_with(F.col("_vhat"), F.element_at(cexpr, F.col("ivf_list")+1), lambda a,b: (a-b)*(a-b)),
    F.lit(0.0), lambda s,v: s+v))
radii_rows = (assigned.withColumn("_r", dist_to_c).groupBy("ivf_list")
              .agg(F.max("_r").alias("r")).collect())
radii = {r["ivf_list"]: float(r["r"]) for r in radii_rows}
print("radii:", {k: round(v,3) for k,v in sorted(radii.items())})

path = "/root/repo/.scratch/_proto_ivf"
(assigned.drop("_vhat").repartition("ivf_list").write.mode("overwrite")
 .partitionBy("ivf_list").parquet(path))

# --- query: eval-as-queries with ball-bound qualification
is_eval = F.col("vec_id") % DECONTAM_MOD == DECONTAM_REMAINDER
ev = emb.filter(is_eval).select(F.col("vec_id").alias("eval_id"), _as_double("embedding").alias("ev_v"))
evn = F.sqrt(F.aggregate(F.transform(F.col("ev_v"), lambda x: x*x), F.lit(0.0), lambda s,v: s+v))
ev = ev.withColumn("ev_hat", F.transform("ev_v", lambda x: F.try_divide(x, evn)))

cent_df = spark.createDataFrame(
    [(i, centroids[i], radii.get(i, 2.0)) for i in range(len(centroids))],
    "ivf_list int, c array<double>, r double")

dotc = F.aggregate(F.zip_with(F.col("ev_hat"), F.col("c"), lambda a,b: a*b), F.lit(0.0), lambda s,v: s+v)
qual = (ev.crossJoin(F.broadcast(cent_df))
        .withColumn("bound", dotc + F.col("r"))
        .filter(F.col("bound") >= TAU_E6/1e6 - 1e-9)
        .select("eval_id", "ev_v", "ivf_list"))

idx = spark.read.parquet(path).filter(~(F.col("vec_id") % DECONTAM_MOD == DECONTAM_REMAINDER))
pairs = idx.join(F.broadcast(qual), "ivf_list")
res = (pairs
       .select(F.col("vec_id").alias("train_doc"),
               F.floor(cosine(_as_double("embedding"), F.col("ev_v")) * 1_000_000).cast("long").alias("cos_e6"))
       .filter(F.col("cos_e6") >= TAU_E6)
       .groupBy("train_doc")
       .agg(F.count(F.lit(1)).cast("long").alias("n_eval_neardups"),
            F.max("cos_e6").cast("long").alias("max_cos_e6"))
       .orderBy("train_doc"))

t0=time.time(); rows = res.collect(); t1=time.time()
print("indexed rows:", len(rows), "time", round(t1-t0,2))

# brute force compare
e = emb.select("vec_id", _as_double("embedding").alias("v"))
evb = F.broadcast(e.filter(is_eval).select(F.col("v").alias("ev_v")))
brute = (e.filter(~is_eval).crossJoin(evb)
    .select(F.col("vec_id").alias("train_doc"),
            F.floor(cosine(F.col("v"), F.col("ev_v")) * 1_000_000).cast("long").alias("cos_e6"))
    .filter(F.col("cos_e6") >= TAU_E6)
    .groupBy("train_doc")
    .agg(F.count(F.lit(1)).cast("long").alias("n_eval_neardups"),
         F.max("cos_e6").cast("long").alias("max_cos_e6"))
    .orderBy("train_doc"))
brows = brute.collect()
print("brute rows:", len(brows))
print("EQUAL:", [tuple(r) for r in rows] == [tuple(r) for r in brows])

# plan: is the scan partition-pruned (DPP)?
res.explain("formatted")

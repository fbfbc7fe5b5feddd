import sys, os, datetime
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[4]").config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
base = "/root/repo/.scratch/_pt"
import shutil; shutil.rmtree(base, ignore_errors=True)
df = spark.createDataFrame(
    [(1, "a b"), (2, "x:y"), (3, None), (4, "2024-01-01 10:00:00"), (5, "plain"), (6, "한글")],
    "id int, p string")
df.write.mode("overwrite").partitionBy("p").parquet(base)
print("DISK:", sorted(os.listdir(base)))
r = (spark.read.parquet(base)
     .select(F.input_file_name().alias("f"))
     .distinct().collect())
print("IFN:")
for row in sorted({x["f"].rsplit("/",2)[1] for x in r}):
    print("  ", row)
# JVM escapePathName
esc = spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
for v in ("a b", "x:y", "2024-01-01 10:00:00", "plain", "한글"):
    print("ESC:", repr(v), "->", esc(v))
# timestamp partition col
base2 = "/root/repo/.scratch/_pt2"
shutil.rmtree(base2, ignore_errors=True)
df2 = spark.createDataFrame([(1, datetime.datetime(2024,1,1,10,30,0))], "id int, ts timestamp")
df2.write.mode("overwrite").partitionBy("ts").parquet(base2)
print("DISK ts:", sorted(os.listdir(base2)))

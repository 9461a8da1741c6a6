import sys, time, json
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
import pandas as pd
data = sys.argv[1]
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet(data); df.count()
res = {"cores": spark.sparkContext.defaultParallelism}
def count_only(batches):
    n=0
    for pdf in batches: n+=len(pdf)
    yield pd.DataFrame({"n":[n]})
# int-only transfer: conv_id pre-hashed in JVM
t=time.perf_counter()
df.select(F.xxhash64("conv_id").alias("h"), F.length("text").cast("double").alias("tl")).mapInPandas(count_only, "n long").agg(F.sum("n")).collect()
res["arrow_int_only"]=round(time.perf_counter()-t,2)
# warm python workers then repeat (isolate worker-boot fixed cost)
t=time.perf_counter()
df.select(F.xxhash64("conv_id").alias("h"), F.length("text").cast("double").alias("tl")).mapInPandas(count_only, "n long").agg(F.sum("n")).collect()
res["arrow_int_warm"]=round(time.perf_counter()-t,2)
# string transfer warm
df.select("conv_id","tool","text").mapInPandas(count_only, "n long").agg(F.sum("n")).collect()
t=time.perf_counter()
df.select("conv_id","tool","text").mapInPandas(count_only, "n long").agg(F.sum("n")).collect()
res["arrow_str_warm"]=round(time.perf_counter()-t,2)
print("P4::"+json.dumps(res))
spark.stop()

import sys, time, json
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F
import pandas as pd
data = sys.argv[1]
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet(data); df.count()
res = {"cores": spark.sparkContext.defaultParallelism}
# A: JVM-only heavy agg (no python)
t=time.perf_counter()
df.select(F.sum(F.length("text")), F.countDistinct("conv_id")).collect()
res["jvm_agg"]=round(time.perf_counter()-t,2)
# B: JVM window sort only
w = Window.partitionBy("conv_id").orderBy("turn_idx")
t=time.perf_counter()
df.select(F.lag(F.length("text")).over(w).alias("x")).agg(F.sum("x")).collect()
res["jvm_window"]=round(time.perf_counter()-t,2)
# C: pure Arrow transfer: mapInPandas passthrough count (no kernels)
def count_only(batches):
    n=0
    for pdf in batches: n+=len(pdf)
    yield pd.DataFrame({"n":[n]})
t=time.perf_counter()
df.select("conv_id","tool","text").mapInPandas(count_only, "n long").agg(F.sum("n")).collect()
res["arrow_passthrough"]=round(time.perf_counter()-t,2)
# D: arrow + hashing only (the hot kernel op)
def hash_only(batches):
    import numpy as np
    sys.path.insert(0,"/root/repo")
    from associationabacminer_spark.sketch.hashing import hash64
    n=0
    for pdf in batches:
        h = hash64(pdf["conv_id"]); n+=len(pdf)
    yield pd.DataFrame({"n":[n]})
t=time.perf_counter()
df.select("conv_id").mapInPandas(hash_only, "n long").agg(F.sum("n")).collect()
res["arrow_hash"]=round(time.perf_counter()-t,2)
print("P3::"+json.dumps(res))
spark.stop()

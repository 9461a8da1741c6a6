import json, sys, time
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F
sys.path.insert(0, "/root/repo")
data = sys.argv[1]
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import pandas as pd
from associationabacminer_spark.operators.agg import SketchSpec, tree_merge
from associationabacminer_spark.sketch import HyperLogLog, CountMinSketch, KLL, TDigest, BloomFilter
def specs():
    return [
        SketchSpec("hll_conv", HyperLogLog, "conv_id", kernel_cls=HyperLogLog),
        SketchSpec("cms_tool", lambda: CountMinSketch(4096,5), "tool", kernel_cls=CountMinSketch),
        SketchSpec("kll_len", lambda: KLL(k=200), "text_len", kernel_cls=KLL),
        SketchSpec("td_lat", lambda: TDigest(200), "latency_s", kernel_cls=TDigest),
        SketchSpec("bloom_conv", lambda: BloomFilter.from_capacity(2_000_000,0.01), "conv_id", kernel_cls=BloomFilter),
    ]
df = spark.read.parquet(data)
df.count()
w = Window.partitionBy("conv_id").orderBy("turn_idx")
prep = (df.withColumn("text_len", F.length("text").cast("double"))
          .withColumn("latency_s", F.col("ts").cast("timestamp").cast("double")
                      - F.lag(F.col("ts").cast("timestamp").cast("double")).over(w))
          .select("conv_id","tool","text_len","latency_s"))
print("PART_COUNT::", prep.rdd.getNumPartitions())
def build_map(batches):
    sp = specs(); kernels=None; pid=-1; nrows={}
    for pdf in batches:
        if kernels is None:
            kernels = {s.name: s.make() for s in sp}; nrows={s.name:0 for s in sp}
            pid = int(pdf["__pid__"].iloc[0]) if len(pdf) else -1
        for s in sp:
            col = pdf[s.column].dropna()
            if len(col): kernels[s.name].update_batch(col.to_numpy()); nrows[s.name]+=len(col)
    if kernels is not None:
        yield pd.DataFrame({"group_id":[pid]*len(sp),"sketch_name":[s.name for s in sp],
            "row_count":[nrows[s.name] for s in sp],
            "sketch":[kernels[s.name].serialize() for s in sp],
            "wall_time_s":[0.0]*len(sp)})
t0=time.perf_counter()
lineage = prep.withColumn("__pid__", F.spark_partition_id()).mapInPandas(build_map,
    schema="group_id int, sketch_name string, row_count long, sketch binary, wall_time_s double")
ks = tree_merge(lineage, specs(), n_states=None)
print("RESULT::"+json.dumps({"cores": spark.sparkContext.defaultParallelism,
  "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
  "sec": round(time.perf_counter()-t0,2), "est": round(ks["hll_conv"].estimate())}))
spark.stop()

"""Phase-level timing probe: find what anti-scales between local[8]/local[32]."""
import json, sys, time
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

data = sys.argv[1]
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, "/root/repo")
from associationabacminer_spark.operators.agg import SketchSpec, build_sketches, tree_merge
from associationabacminer_spark.sketch import HyperLogLog, CountMinSketch, KLL, TDigest, BloomFilter

def specs():
    return [
        SketchSpec("hll_conv", HyperLogLog, "conv_id", kernel_cls=HyperLogLog),
        SketchSpec("cms_tool", lambda: CountMinSketch(4096,5), "tool", kernel_cls=CountMinSketch),
        SketchSpec("kll_len", lambda: KLL(k=200), "text_len", kernel_cls=KLL),
        SketchSpec("td_lat", lambda: TDigest(200), "latency_s", kernel_cls=TDigest),
        SketchSpec("bloom_conv", lambda: BloomFilter.from_capacity(2_000_000, 0.01), "conv_id", kernel_cls=BloomFilter),
    ]

df = spark.read.parquet(data)
res = {"parallelism": spark.sparkContext.defaultParallelism}
t=time.perf_counter(); n=df.count(); res["scan_count"]=round(time.perf_counter()-t,2)

w = Window.partitionBy("conv_id").orderBy("turn_idx")
prep = (df.withColumn("text_len", F.length("text").cast("double"))
          .withColumn("latency_s", F.col("ts").cast("timestamp").cast("double")
                      - F.lag(F.col("ts").cast("timestamp").cast("double")).over(w))
          .select("conv_id","tool","text_len","latency_s"))
t=time.perf_counter(); prep.count(); res["scan_window"]=round(time.perf_counter()-t,2)

t=time.perf_counter()
lineage = build_sketches(prep, specs(), num_groups=64)
ks = tree_merge(lineage, specs(), n_states=64)
res["full_groupby_build"]=round(time.perf_counter()-t,2)

# prototype: mapInPandas per-partition build, zero extra shuffle
import pandas as pd
def build_map(batches):
    kernels = None; pid=-1; nrows={}
    sp = specs()
    for pdf in batches:
        if kernels is None:
            kernels = {s.name: s.make() for s in sp}
            nrows = {s.name: 0 for s in sp}
            pid = int(pdf["__pid__"].iloc[0]) if len(pdf) else -1
        for s in sp:
            col = pdf[s.column].dropna()
            if len(col): kernels[s.name].update_batch(col.to_numpy()); nrows[s.name]+=len(col)
    if kernels is not None:
        yield pd.DataFrame({"group_id":[pid]*len(sp),"sketch_name":[s.name for s in sp],
            "row_count":[nrows[s.name] for s in sp],
            "sketch":[kernels[s.name].serialize() for s in sp],
            "wall_time_s":[0.0]*len(sp)})
t=time.perf_counter()
lineage2 = prep.withColumn("__pid__", F.spark_partition_id()).mapInPandas(build_map,
    schema="group_id int, sketch_name string, row_count long, sketch binary, wall_time_s double")
ks2 = tree_merge(lineage2, specs(), n_states=None)
res["full_map_build"]=round(time.perf_counter()-t,2)
res["hll_est"]=round(ks2["hll_conv"].estimate(),0)
print("PROBE::"+json.dumps(res))
spark.stop()

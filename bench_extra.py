"""Round-6 measurement harness (bench.py is frozen for the driver).

Times individual headline queries with the SAME methodology as bench.py
(build the DataFrame, ``collect()``), repeated and interleaved so A/B
comparisons are robust to window noise, and brackets the run with the
cpu controls so every reading is attributable to a health state.

Usage:
    python bench_extra.py time q9i_source_overlap q9l_incremental_ingest -r 5
    python bench_extra.py time --all -r 3          # every bench.py HEADLINE entry
    python bench_extra.py noop q9i_source_overlap  # noop-sink isolation (guide §1.4)

Prints one JSON line per invocation:
    {"mode", "repeats", "queries": {name: {"samples": [...], "min", "median"}},
     "cpu_control_pre", "cpu_control_post", "cpu_control_par8"}
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["time", "noop"])
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("-r", "--repeats", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--par8", action="store_true", help="also run the 8-way control")
    args = ap.parse_args()

    import bench as B

    names = list(B.HEADLINE) if args.all else args.names
    names = [n for n in names if not n.startswith("sketch_build")]

    control_pre = B.cpu_control_sample()

    from associationabacminer_spark.session import get_spark

    spark = get_spark(app_name="bench_extra")

    import associationabacminer_spark.queries as Q
    from associationabacminer_spark.sources.tables import load_tables

    for _name, _df in load_tables(spark, args.sf).items():
        _df.count()

    samples: dict[str, list[float]] = {n: [] for n in names}
    # warm-up pass (uncounted) so codegen/JIT constants drop out, then
    # interleaved repeats: round-robin across queries so a throttle shift
    # mid-run biases all queries equally instead of one.
    for n in names:
        spark.sparkContext.setJobDescription(f"warm:{n}")
        df = Q.QUERIES[n](spark, args.sf)
        if args.mode == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()
    for r in range(args.repeats):
        for n in names:
            spark.sparkContext.setJobDescription(f"rep{r}:{n}")
            t0 = time.perf_counter()
            df = Q.QUERIES[n](spark, args.sf)
            if args.mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            samples[n].append(round(time.perf_counter() - t0, 3))

    out = {
        "mode": args.mode,
        "repeats": args.repeats,
        "sf": args.sf,
        "queries": {
            n: {
                "samples": s,
                "min": min(s),
                "median": round(statistics.median(s), 3),
            }
            for n, s in samples.items()
        },
        "cpu_control_pre": control_pre,
        "cpu_control_post": B.cpu_control_sample(),
    }
    if args.par8:
        out["cpu_control_par8"] = B.cpu_control_parallel(8)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""Capture .explain("formatted") for every headline bench query.

Usage: python bench/capture_plans.py <outdir> [query ...]

Writes <outdir>/<query>_<tag>.txt (tag from $PLAN_TAG, default "before").
Plan capture is driver-side only (no job runs), so it is valid even in a
CPU-throttled window.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    outdir = sys.argv[1]
    only = set(sys.argv[2:])
    tag = os.environ.get("PLAN_TAG", "before")
    os.makedirs(outdir, exist_ok=True)

    from bench import HEADLINE

    from associationabacminer_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture_plans")

    import associationabacminer_spark.queries as Q

    names = [n for n in HEADLINE if not only or n in only]
    for name in names:
        if name.startswith("sketch_build"):
            continue  # harness paths, captured separately below
        try:
            df = Q.QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR during plan build: {e!r}"
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else "ERR", flush=True)

    # the sketch-build throughput harness: capture the stage-1 lineage
    # plan of the map build (the only shuffle-bearing piece the bench
    # times for sketch_build_1p2M_turns)
    synth = os.path.join(REPO, ".synth", "bench_transcripts")
    if os.path.exists(os.path.join(synth, "_SUCCESS")) and (
        not only or "sketch_build_1p2M_turns" in only
    ):
        from associationabacminer_spark.operators.agg import build_sketches
        from associationabacminer_spark.suite import (
            prepare_transcripts,
            transcript_specs,
        )

        df = spark.read.parquet(synth)
        prepared = prepare_transcripts(df)
        mdf = build_sketches(prepared, transcript_specs(), method="map")
        plan = mdf._sc._jvm.PythonSQLUtils.explainString(
            mdf._jdf.queryExecution(), "formatted"
        )
        with open(
            os.path.join(outdir, f"sketch_build_1p2M_turns_{tag}.txt"), "w"
        ) as f:
            f.write(plan)
        print("sketch_build_1p2M_turns ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

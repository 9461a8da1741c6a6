"""Scaling-efficiency evidence (BASELINE.json north_rule).

A real N vs 4N executor cluster is unavailable in this sandbox, so the
mandated proxy is: the SAME spark-submit job on the SAME input at
local[8] vs local[32].  Efficiency = (T_8 / T_32) / 4 (perfect linear
scaling = 1.0; target >= 0.8).

Each run is a fresh JVM via spark-submit --py-files (the packaging
contract), so no cache leaks between levels.  Results are appended to
BENCH/BASELINE.md.

Usage:  python bench/run_scaling.py [--convs 400000] [--repeats 1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ensure_data(path: str, n_convs: int) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    sys.path.insert(0, REPO)
    from associationabacminer_spark.session import get_spark
    from associationabacminer_spark.sources.transcripts import generate_transcripts

    spark = get_spark(app_name="scaling-datagen", cores=32)
    generate_transcripts(spark, n_convs=n_convs, seed=42).write.mode(
        "overwrite"
    ).parquet(path)
    spark.stop()


def make_pkg_zip() -> str:
    tmp = tempfile.mkdtemp(prefix="pkg-")
    zip_base = os.path.join(tmp, "associationabacminer_spark")
    shutil.make_archive(
        zip_base,
        "zip",
        root_dir=REPO,
        base_dir="associationabacminer_spark",
    )
    return zip_base + ".zip"


def run_level(cores: int, data: str, pkg_zip: str, groups: int) -> dict:
    out = tempfile.mktemp(suffix=".json")
    cmd = [
        "spark-submit",
        "--master",
        f"local[{cores}]",
        "--conf",
        f"spark.sql.shuffle.partitions={cores}",
        "--conf",
        "spark.sql.adaptive.enabled=true",
        "--conf",
        "spark.sql.session.timeZone=UTC",
        "--conf",
        "spark.ui.enabled=false",
        "--driver-memory",
        "16g",
        "--py-files",
        pkg_zip,
        os.path.join(REPO, "bench", "sketch_job.py"),
        "--data",
        data,
        "--groups",
        str(groups),
        "--out",
        out,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    with open(out) as f:
        return json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=400_000)
    ap.add_argument("--data", default=os.path.join(REPO, ".synth", "scaling_transcripts"))
    args = ap.parse_args()

    ensure_data(args.data, args.convs)
    pkg_zip = make_pkg_zip()

    r8 = run_level(8, args.data, pkg_zip, groups=64)
    r32 = run_level(32, args.data, pkg_zip, groups=64)
    speedup = r8["seconds"] / r32["seconds"]
    efficiency = speedup / 4.0

    result = {
        "rows": r8["rows"],
        "local8_sec": r8["seconds"],
        "local8_turns_per_sec": r8["turns_per_sec"],
        "local32_sec": r32["seconds"],
        "local32_turns_per_sec": r32["turns_per_sec"],
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
        "pass": efficiency >= 0.8,
    }
    print(json.dumps(result))

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    with open(md, "a") as f:
        f.write(
            f"\n| {r8['rows']} | {r8['seconds']} | {r8['turns_per_sec']} | "
            f"{r32['seconds']} | {r32['turns_per_sec']} | {round(speedup,3)} | "
            f"{round(efficiency,3)} | {'PASS' if result['pass'] else 'FAIL'} |"
        )


if __name__ == "__main__":
    main()

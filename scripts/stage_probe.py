#!/usr/bin/env python
"""Decompose the stage_delta phase's 2->8 core scaling.

scaling run 7 (2026-08-18): merge_write scales 2.8x from 2->8 cores but
stage_delta only 1.33x and stats_job NEGATIVELY (13.2s -> 15.1s).  Those
two phases are ~45% of the 4N leg's wall, capping pair efficiency near
0.55 regardless of host health.  This probe times the phase's sub-steps
in isolation on the same pre-generated segment (1.2M events x 2KB) at
two core counts, fresh JVM per (cores, step):

  stats   - narrow 3-column groupingSets aggregate + collect
            (the stats_job phase verbatim)
  scan    - full-content parquet scan, count-only (noop write)
  lww     - scan + LWW key-window, noop write (adds the one shuffle)
  stage   - scan + LWW + parquet stage write (the full phase)

Each step's 2->8 ratio localizes the non-scaling work: if `scan` fails
to scale the parquet reader is the issue; if `lww` adds a non-scaling
delta the shuffle/window is; if only `stage` does, the writer is.

Usage: python scripts/stage_probe.py [--events 1200000] [--trials 1]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from etl_spark.config import get_spark
from etl_spark.fixtures import events_df
spark = get_spark("stage-probe-gen", cores=32, shuffle_partitions=64,
                  extra_conf={{"spark.local.dir": "/dev/shm/spark-local"}})
ev = events_df(spark, {events}, seed=42, n_repos=50, paths_per_repo=400,
               hot_pct=20, content_bytes=2048)
ev.coalesce(8).write.mode("overwrite").parquet({seg!r})
spark.stop()
print("GENERATED")
"""

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from etl_spark.config import get_spark
from etl_spark.operators.lww import lww_latest

cores = {cores}
spark = get_spark("stage-probe", cores=cores, shuffle_partitions=32,
                  extra_conf={{
                      "spark.local.dir": "/dev/shm/spark-local",
                      "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
                  }})
df = spark.read.parquet({seg!r})
KEY = ["repo", "path"]

# warmup: tiny slice through the same plan shapes (codegen compile)
w = df.limit(5000)
w.select("part_id", "seq", "repo").groupby("part_id").count().collect()
lww_latest(w, KEY, "seq").write.format("noop").mode("overwrite").save()

def stats():
    rows = (df.select("part_id", "seq", "repo")
              .groupingSets([["part_id"], ["repo"]], "part_id", "repo")
              .agg(F.min("seq"), F.max("seq"), F.count("*").alias("n"))
              .collect())
    return len(rows)

def scan():
    df.write.format("noop").mode("overwrite").save()

def lww():
    lww_latest(df, KEY, "seq").write.format("noop").mode("overwrite").save()

def stage():
    out = tempfile.mkdtemp(prefix="stage_probe_out_", dir="/dev/shm")
    try:
        lww_latest(df, KEY, "seq").write.mode("overwrite").parquet(out)
    finally:
        shutil.rmtree(out, ignore_errors=True)

res = {{}}
for name, fn in (("stats", stats), ("scan", scan), ("lww", lww),
                 ("stage", stage)):
    times = []
    for _ in range({reps}):
        t0 = time.monotonic()
        fn()
        times.append(round(time.monotonic() - t0, 2))
    res[name] = times
    sys.stderr.write(f"{{name}}: {{times}}\n")
print(json.dumps({{"cores": cores, "steps": res}}))
spark.stop()
"""


def run_py(code: str, mem: str) -> str:
    env = dict(os.environ, ETL_SPARK_DRIVER_MEM=mem)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1800, env=env)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit("child failed")
    return out.stdout


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=1_200_000)
    ap.add_argument("--cores", type=int, nargs="+", default=[2, 8])
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    base = tempfile.mkdtemp(prefix="etl_stage_probe_", dir="/dev/shm")
    seg = os.path.join(base, "seg")
    try:
        sys.stderr.write(f"generating {args.events} events...\n")
        run_py(GEN.format(repo=REPO, events=args.events, seg=seg), "16g")
        runs = {}
        for c in args.cores:
            sys.stderr.write(f"-- cores={c}\n")
            line = [ln for ln in
                    run_py(CHILD.format(repo=REPO, cores=c, seg=seg, reps=args.reps),
                           f"{4 * c}g").splitlines()
                    if ln.startswith("{")][-1]
            runs[c] = json.loads(line)["steps"]
        out = {"events": args.events, "runs": runs}
        if len(args.cores) == 2:
            a, b = args.cores
            out["ratio"] = {k: round(min(runs[a][k]) / max(min(runs[b][k]), 1e-9), 2)
                            for k in runs[a]}
        print(json.dumps(out, indent=1))
    finally:
        import shutil

        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

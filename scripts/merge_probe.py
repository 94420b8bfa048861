#!/usr/bin/env python
"""Isolate the per-batch FIXED cost inside the merge_write phase.

phase_profile.py showed merge_write carries ~13s/batch that does not
shrink with cores or input size.  This probe applies IDENTICAL batches
to FRESH tables inside one JVM (same plan shape, warmed pandas workers)
at two sizes, so:

 - batch1 vs batch3 (same size, same JVM)  -> one-time vs per-batch cost
 - 300k vs 75k at the same cores           -> fixed vs data-scaled split
 - ETL_SPARK_WRITE_OBSERVE=0 rerun         -> attribute the observe aggs
 - --no-canon                              -> attribute canonicalize

Usage: python scripts/merge_probe.py [--cores 8] [--observe 0|1]
       [--no-canon] [--nfc 0|1]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
os.environ["ETL_SPARK_WRITE_OBSERVE"] = {observe!r}
from etl_spark.config import get_spark
from etl_spark.catalog.table import LakeTable
from etl_spark.fixtures import events_df
from etl_spark.functions.normalize import normalize_content
from etl_spark.pipeline import canonicalize

cores = {cores}
spark = get_spark("merge-probe", cores=cores, shuffle_partitions=2 * cores,
                  extra_conf={{"spark.local.dir": "/dev/shm/spark-local"}})
root = tempfile.mkdtemp(prefix="etl_mergeprobe_", dir="/dev/shm")
canon = None if {no_canon} else (lambda df: canonicalize(df, nfc=bool({nfc})))
try:
    big = events_df(spark, 300000, seed=42, n_repos=50, paths_per_repo=400,
                    hot_pct=20, content_bytes=2048)
    small = events_df(spark, 75000, seed=43, n_repos=50, paths_per_repo=400,
                      hot_pct=20, content_bytes=2048)
    big_dir, small_dir = os.path.join(root, "big"), os.path.join(root, "small")
    big.write.mode("overwrite").parquet(big_dir)
    small.write.mode("overwrite").parquet(small_dir)
    bigdf = spark.read.parquet(big_dir)
    smalldf = spark.read.parquet(small_dir)

    # warmup: same bucket shape as the measured tables so whole-stage
    # codegen + pandas workers are warm before the first measurement
    wt = LakeTable.create(spark, os.path.join(root, "wt"), n_buckets=32, salt=8)
    wev = events_df(spark, 20000, seed=7, content_bytes=2048)
    wt.apply_batch(wev, 0, delivery="unordered", canonicalizer=canon)

    out = []
    for i, (tag, df) in enumerate(
        [("big1", bigdf), ("small", smalldf), ("big2", bigdf)]
    ):
        t = LakeTable.create(spark, os.path.join(root, f"t{{i}}"),
                             n_buckets=32, salt=8)
        t0 = time.monotonic()
        st = t.apply_batch(df, 0, delivery="unordered", canonicalizer=canon)
        out.append({{"tag": tag, "wall": round(time.monotonic() - t0, 2),
                     "phases": st.get("phases")}})
        sys.stderr.write(json.dumps(out[-1]) + "\n")
    print(json.dumps({{"cores": cores, "observe": {observe!r},
                       "no_canon": {no_canon}, "nfc": {nfc}, "runs": out}}))
finally:
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--observe", default="1")
    ap.add_argument("--no-canon", action="store_true")
    ap.add_argument("--nfc", type=int, default=1)
    args = ap.parse_args()
    code = CHILD.format(repo=REPO, cores=args.cores, observe=args.observe,
                        no_canon=args.no_canon, nfc=args.nfc)
    env = dict(os.environ, ETL_SPARK_DRIVER_MEM="12g")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1200, env=env)
    sys.stderr.write(r.stderr[-3000:])
    if r.returncode != 0:
        raise SystemExit("child failed")
    print([ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])


if __name__ == "__main__":
    main()

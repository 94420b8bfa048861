#!/usr/bin/env python
"""Per-phase breakdown of small-batch (steady-state tail) apply cost.

Applies N small batches directly through LakeTable.apply_batch (no
streaming machinery) and prints the per-phase timing dict for each, so
fixed per-micro-batch overheads can be attributed and attacked.

Usage: python scripts/tail_profile.py [--events-per-batch 10000]
       [--batches 8] [--base-events 100000]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events-per-batch", type=int, default=10_000)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--base-events", type=int, default=100_000)
    ap.add_argument("--write-mode", default="cow", choices=["cow", "mor", "auto"])
    args = ap.parse_args()

    from etl_spark.catalog.table import LakeTable
    from etl_spark.config import get_spark
    from etl_spark.fixtures import events_df, write_event_batches
    from etl_spark.pipeline import canonicalize

    spark = get_spark(
        "tail-profile",
        cores=32,
        shuffle_partitions=32,
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )
    root = tempfile.mkdtemp(prefix="etl_tailprof_")
    try:
        total = args.base_events + args.batches * args.events_per_batch
        ev = events_df(
            spark, total, seed=13, n_repos=50, paths_per_repo=200,
            hot_pct=20, content_bytes=1024,
        )
        ev_dir = os.path.join(root, "events")
        # one fat base batch, then the small steady-state tail batches
        base = ev.filter(F_seq_lt(args.base_events))
        tail = ev.filter(~F_seq_lt(args.base_events))
        write_event_batches(base, os.path.join(ev_dir, "base"), 1, order="seq")
        write_event_batches(
            tail, os.path.join(ev_dir, "tail"), args.batches, order="seq"
        )
        table = LakeTable.create(
            spark, os.path.join(root, "table"), n_buckets=16, salt=8,
            write_mode=args.write_mode,
        )
        batches = [os.path.join(ev_dir, "base", "batch-00000.parquet")] + [
            os.path.join(ev_dir, "tail", f"batch-{i:05d}.parquet")
            for i in range(args.batches)
        ]
        for bid, p in enumerate(batches):
            st = table.apply_batch(
                spark.read.parquet(p), bid, canonicalizer=canonicalize
            )
            kind = "base" if bid == 0 else "tail"
            print(
                f"{kind} batch {bid}: events={st['events']} "
                f"latency_ms={st['latency_ms']} strategy={st['strategy']} "
                f"phases={st['phases']}"
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


def F_seq_lt(n: int):
    from pyspark.sql import functions as F

    return F.col("seq") < n


if __name__ == "__main__":
    main()

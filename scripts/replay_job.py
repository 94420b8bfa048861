#!/usr/bin/env python
"""Production entry point: binlog replay / tail via spark-submit.

    zip -r engine.zip etl_spark
    spark-submit --master <cluster> --py-files engine.zip \
        scripts/replay_job.py --events-dir DIR --table-dir DIR \
        --checkpoint-dir DIR [--mode replay|tail] [--format parquet|json]
        [--create --n-buckets 256 --salt 16] [--delivery ordered]

The session is built from whatever master spark-submit provides (no
local[] hardcoding); engine conf is applied on top.  Exactly-once:
rerunning after any crash resumes from the checkpoint and the fenced
snapshot — completed batches no-op.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="CDC replay/tail job")
    ap.add_argument("--events-dir", required=True)
    ap.add_argument("--table-dir", required=True)
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--mode", choices=["replay", "tail"], default="replay")
    ap.add_argument("--format", choices=["parquet", "json"], default="parquet")
    ap.add_argument("--delivery", choices=["ordered", "unordered"], default="ordered")
    ap.add_argument("--create", action="store_true", help="create table if absent")
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from etl_spark.catalog.table import LakeTable
    from etl_spark.config import spark_conf
    from etl_spark.streaming.tailer import run_tailer

    builder = SparkSession.builder.appName("etl-spark-cdc-replay")
    for k, v in spark_conf().items():
        if not k.startswith("spark.driver."):  # submit-time flags win
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try:
        try:
            table = LakeTable.load(spark, args.table_dir)
        except FileNotFoundError:
            if not args.create:
                raise
            table = LakeTable.create(
                spark, args.table_dir, n_buckets=args.n_buckets, salt=args.salt
            )
        q, sink = run_tailer(
            table,
            args.events_dir,
            args.checkpoint_dir,
            mode=args.mode,
            fmt=args.format,
            delivery=args.delivery,
            max_files_per_trigger=args.max_files_per_trigger,
        )
        if args.mode == "tail":
            # continuous ingestion: block until the query is stopped
            # externally (run_tailer only awaits bounded replays)
            q.awaitTermination()
        applied = [s for s in sink.applied if not s.get("skipped")]
        snap = table.snapshot()
        print(
            f"replay complete: {len(applied)} batches applied, "
            f"table v{snap.version}, {sum(s.get('events', 0) for s in applied)} events, "
            f"watermarks={snap.watermarks}"
        )
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())

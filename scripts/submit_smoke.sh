#!/usr/bin/env bash
# Packaging smoke: the engine must ship as `spark-submit --py-files
# engine.zip` (BASELINE.json north rule).  Generates a small event
# stream, replays it through the packaged engine in a fresh
# spark-submit JVM, and checks the final table row count.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

cd "$REPO"
zip -qr "$WORK/engine.zip" etl_spark

# generate events with the library directly
python - "$WORK" <<'EOF'
import sys
sys.path.insert(0, ".")
from etl_spark.config import get_spark
from etl_spark.fixtures import events_df, write_event_batches
work = sys.argv[1]
spark = get_spark("gen", cores=4, shuffle_partitions=4)
write_event_batches(events_df(spark, 2000, seed=42), f"{work}/events", 2)
spark.stop()
EOF

"${SPARK_HOME:-/opt/spark}/bin/spark-submit" \
    --master "local[4]" \
    --py-files "$WORK/engine.zip" \
    scripts/replay_job.py \
    --events-dir "$WORK/events" \
    --table-dir "$WORK/table" \
    --checkpoint-dir "$WORK/ckpt" \
    --create --n-buckets 8 --salt 4 2>/dev/null

# verify final state non-empty via the packaged table
python - "$WORK" <<'EOF'
import sys
sys.path.insert(0, ".")
from etl_spark.config import get_spark
from etl_spark.catalog.table import LakeTable
work = sys.argv[1]
spark = get_spark("check", cores=4, shuffle_partitions=4)
n = LakeTable.load(spark, f"{work}/table").read().count()
assert n > 0, "empty table after packaged replay"
print(f"submit smoke OK: {n} rows in final state")
spark.stop()
EOF

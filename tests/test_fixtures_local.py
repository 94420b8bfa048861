"""Pin the Spark-free event generator to the Spark one, row for row.

The CDC replay oracles recompute expected lake state from the parquet
fixture that fixtures_local writes; if that generator ever drifted from
fixtures.events_df (which the rest of the suite and bench use), the
oracles would silently verify a different stream.  Full-row equality +
batch-assignment equality make drift impossible to miss.
"""

from __future__ import annotations

import os

import pytest

from etl_spark.fixtures import events_df, write_event_batches
from etl_spark.fixtures_local import (
    assign_batches,
    ensure_replay_fixture,
    gen_events,
    replay_fixture_dir,
)

N = 1200


def _spark_key(r):
    ts = int(r["ts"].timestamp() * 1_000_000) if r["ts"] is not None else None
    return (
        r["seq"], r["part_id"], r["op"], r["repo"], r["path"],
        r["commit"], r["lang"], r["content"], ts,
    )


def _py_key(r):
    return (
        r["seq"], r["part_id"], r["op"], r["repo"], r["path"],
        r["commit"], r["lang"], r["content"], r["ts"],
    )


@pytest.mark.parametrize("hot_pct,content_bytes", [(20, 0), (0, 256)])
def test_generator_parity(spark, hot_pct, content_bytes):
    sp = sorted(
        _spark_key(r)
        for r in events_df(
            spark, N, seed=42, hot_pct=hot_pct, content_bytes=content_bytes
        ).collect()
    )
    py = sorted(
        _py_key(r)
        for r in gen_events(N, seed=42, hot_pct=hot_pct, content_bytes=content_bytes)
    )
    assert sp == py


def test_batch_assignment_parity(spark, tmp_path):
    ev = events_df(spark, N, seed=42, hot_pct=20)
    paths = write_event_batches(
        ev, str(tmp_path / "ev"), 3, order="shuffled", duplicate_pct=10
    )
    rows = gen_events(N, seed=42, hot_pct=20)
    py_batches = assign_batches(rows, 3, order="shuffled", duplicate_pct=10)
    for b, p in enumerate(paths):
        sp_seqs = sorted(r["seq"] for r in spark.read.parquet(p).collect())
        py_seqs = sorted(r["seq"] for r in py_batches[b])
        assert sp_seqs == py_seqs, f"batch {b} diverged"


def test_fixture_idempotent_and_stable():
    d1 = ensure_replay_fixture()
    marker = os.path.join(d1, "_DONE")
    mtime = os.path.getmtime(marker)
    d2 = ensure_replay_fixture()
    assert d1 == d2 == replay_fixture_dir()
    assert os.path.getmtime(marker) == mtime  # second call is a no-op
    assert sorted(
        f for f in os.listdir(d1) if f.endswith(".parquet")
    ) == [f"batch-{b:05d}.parquet" for b in range(3)]

"""Spark-free twin of the deterministic event generator (fixtures.py).

Why this exists: the driver's correctness gate runs each query's DuckDB
oracle as a STATIC SQL string with no SparkSession (and in no guaranteed
order relative to the Spark queries).  To give the full-engine replay
queries (``cdc_replay_final_state`` & friends) real value-hash oracles,
the raw change-event log must already sit at a STABLE parquet path that
both sides reference: the Spark side replays it through the real
LakeTable, the DuckDB side recomputes expected state straight from the
events.  A Spark-generated fixture can't satisfy "exists before either
side runs", so the generator is re-derived here in pure Python on top of
the driver-side XXH64 (bit-identical to Spark's ``xxhash64`` — pinned by
tests/test_functions.py), and a test pins full row equality between this
generator and ``fixtures.events_df`` + ``fixtures.write_event_batches``.

The fixture directory is content-addressed by the generator parameters:
regenerating with the same params is a no-op (done-marker), and any
param change lands in a fresh directory so a stale fixture can never be
silently reused.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import struct
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from etl_spark.fixtures import _EXTS, _NFD_ACCENT, TS_EPOCH
from etl_spark.functions.xxhash import xxhash64 as _xxh


def _h(seq: int, seed: int, salt: int) -> int:
    """Spark ``xxhash64(seq_long, lit(seed), lit(salt))``: columns fold
    left with the running hash as the next seed (initial seed 42); longs
    hash as 8-byte LE, int literals as 4-byte LE."""
    h = _xxh(struct.pack("<q", seq), 42)
    h = _xxh(struct.pack("<i", seed), h)
    return _xxh(struct.pack("<i", salt), h)


_FILLER = "    let value_%d = compute(input);   \r\n"


def gen_events(
    n: int,
    seed: int = 42,
    n_parts: int = 4,
    n_repos: int = 20,
    paths_per_repo: int = 50,
    hot_pct: int = 0,
    hot_repo: str = "repo-hot",
    delete_pct: int = 5,
    start_seq: int = 0,
    content_bytes: int = 0,
) -> list[dict]:
    """Row-for-row twin of :func:`etl_spark.fixtures.events_df`."""
    out = []
    for s in range(start_seq, start_seq + n):
        is_hot = _h(s, seed, 1) % 100 < hot_pct
        repo = hot_repo if is_hot else f"repo-{_h(s, seed, 2) % n_repos}"
        n_paths = paths_per_repo * 4 if is_hot else paths_per_repo
        path_id = _h(s, seed, 3) % n_paths
        ext = _EXTS[_h(s, seed, 4) % len(_EXTS)]
        path = f"src/m{_h(s, seed, 5) % 8}/f{path_id}.{ext}"

        opr = _h(s, seed, 6) % 100
        if opr < delete_pct and s > start_seq + 100:
            op = "delete"
        elif opr < delete_pct + 45:
            op = "update"
        else:
            op = "insert"

        v = _h(s, seed, 7) % 5
        tail = [
            "\r\nint x = 1;   \r\nreturn x;\n",
            "\nline with trailing spaces   \nnext\t\n\n\n",
            f"\n{_NFD_ACCENT} unicode line\n",
            "\nno final newline",
            "\nplain line\n",
        ][v]
        body = f"// {repo}:{path} v{s}{tail}"
        if content_bytes > 0:
            line = f"    let value_{s % 97} = compute(input);   \r\n"
            reps = max(1, content_bytes // len(_FILLER % 0))
            body += line * reps
        content = None if op == "delete" else body

        lang = "ada" if _h(s, seed, 8) % 100 < 5 else None
        commit = hashlib.sha256(f"c{s}".encode()).hexdigest()[:40]
        out.append(
            {
                "seq": s,
                "part_id": s % n_parts,
                "op": op,
                "ts": (TS_EPOCH + s) * 1_000_000,  # micros since epoch (UTC)
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": lang,
                "content": content,
                "extra": None,
            }
        )
    return out


def assign_batches(
    rows: list[dict],
    n_batches: int,
    order: str = "seq",
    duplicate_pct: int = 0,
    seed: int = 42,
) -> list[list[dict]]:
    """Twin of :func:`etl_spark.fixtures.write_event_batches` assignment:
    hash (shuffled) or contiguous-range (seq) batch ids, plus optional
    re-delivery of ``duplicate_pct`` percent of events into a later batch."""
    lo = min(r["seq"] for r in rows)
    hi = max(r["seq"] for r in rows)
    span = (hi - lo + 1 + n_batches - 1) // n_batches
    batches: list[list[dict]] = [[] for _ in range(n_batches)]

    def orig_b(s: int) -> int:
        if order == "shuffled":
            return _h(s, seed, 99) % n_batches
        return (s - lo) // span

    for r in rows:
        batches[orig_b(r["seq"])].append(r)
    if duplicate_pct > 0:
        for r in rows:
            s = r["seq"]
            if _h(s, seed, 98) % 100 < duplicate_pct:
                b = min(n_batches - 1, orig_b(s) + 1 + _h(s, seed, 97) % 2)
                batches[b].append(r)
    return batches


_EVENT_ARROW_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),
        ("part_id", pa.int32()),
        ("op", pa.string()),
        ("ts", pa.timestamp("us", tz="UTC")),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
        ("extra", pa.map_(pa.string(), pa.string())),
    ]
)


def write_batches(batches: list[list[dict]], out_dir: str) -> list[str]:
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for b, rows in enumerate(batches):
        cols = {
            name: [r[name] for r in rows] for name in _EVENT_ARROW_SCHEMA.names
        }
        tbl = pa.table(cols, schema=_EVENT_ARROW_SCHEMA)
        p = os.path.join(out_dir, f"batch-{b:05d}.parquet")
        pq.write_table(tbl, p)
        paths.append(p)
    return paths


# --------------------------------------------------------------------------
# the stable replay fixture (shared by the Spark queries and their oracles)
# --------------------------------------------------------------------------

# bump when generator semantics change, so old on-disk fixtures can never
# be read against new oracle SQL
_FIXTURE_VERSION = 1

REPLAY_EVENTS = 4000
REPLAY_BATCHES = 3
REPLAY_SEED = 42
REPLAY_HOT_PCT = 20
REPLAY_DUP_PCT = 10


def replay_fixture_dir(base: str | None = None) -> str:
    base = base or os.environ.get("ETL_SPARK_FIXTURE_BASE", "/tmp/etl_spark_fixtures")
    name = (
        f"cdc-v{_FIXTURE_VERSION}-n{REPLAY_EVENTS}-b{REPLAY_BATCHES}"
        f"-s{REPLAY_SEED}-h{REPLAY_HOT_PCT}-d{REPLAY_DUP_PCT}"
    )
    return os.path.join(base, name)


def ensure_replay_fixture(base: str | None = None) -> str:
    """Idempotently materialize the deterministic replay event log; returns
    the directory holding ``batch-0000N.parquet`` files.  Concurrency-safe:
    built in a scratch dir, atomically renamed into place; a loser of the
    rename race just uses the winner's (identical) output."""
    final = replay_fixture_dir(base)
    done = os.path.join(final, "_DONE")
    if os.path.exists(done):
        return final
    os.makedirs(os.path.dirname(final), exist_ok=True)
    tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
    rows = gen_events(
        REPLAY_EVENTS, seed=REPLAY_SEED, hot_pct=REPLAY_HOT_PCT
    )
    batches = assign_batches(
        rows, REPLAY_BATCHES, order="shuffled", duplicate_pct=REPLAY_DUP_PCT,
        seed=REPLAY_SEED,
    )
    write_batches(batches, tmp)
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write("ok")
    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost the race: reuse winner
        if not os.path.exists(done):
            raise
    return final

"""Snapshot / transaction-log layer — the engine-owned Iceberg analog.

In-sandbox there is no iceberg-spark-runtime (BASELINE.md), so the engine
owns an Iceberg-style metadata chain: an ordered list of immutable
snapshot JSON manifests under ``meta/``, with a single atomically-swapped
``LATEST`` pointer (write-temp + ``os.replace``, the metadata.json pattern).
Data files are immutable; a commit writes new files + a new manifest and
swaps the pointer.  Crash between data-write and pointer-swap leaves only
orphans (reclaimed by ``LakeTable.vacuum``), never a torn table.

Exactly-once: ``last_batch_id`` recorded in the snapshot is the fencing
token — ``foreachBatch`` re-deliveries with ``batch_id <= last_batch_id``
are no-ops (Spark guarantees replay-stable batch ids).

Single-writer model: one streaming query owns the table (the CDC tailer).
The version-file create is still collision-checked to fail fast on
misconfiguration rather than corrupt state.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from dataclasses import asdict, dataclass, field


@dataclass
class FileEntry:
    """One immutable data file + pruning stats.

    ``buckets`` is the exact set of storage buckets present in the file
    (files are usually single-bucket; survivor rewrites may pack a few).
    ``min_repo``/``max_repo`` allow repo-predicate file pruning on reads.
    """

    path: str  # relative to table root
    rows: int
    buckets: list[int]
    min_repo: str | None = None
    max_repo: str | None = None
    bytes: int = 0
    # non-tombstone rows in the file (``rows`` includes tombstones).
    # Stamped at write time by the stats pass, so a snapshot with no
    # pending delta files knows its exact LIVE row count from metadata
    # alone (deep-retention time travel never scans data just to count).
    # -1 = unknown (manifests written before this field).
    live_rows: int = -1


@dataclass
class Snapshot:
    version: int
    schema_version: int
    columns: list[str]
    n_buckets: int
    salt: int
    hot_repos: list[str] = field(default_factory=list)
    last_batch_id: int = -1
    watermarks: dict[str, int] = field(default_factory=dict)  # part_id(str) -> seq
    files: list[FileEntry] = field(default_factory=list)
    # merge-on-read delta files: per-batch LWW-winner rows (incl.
    # tombstones) written WITHOUT rewriting base buckets; readers resolve
    # base ∪ delta by key at scan time.  Folded back into ``files`` by
    # copy-on-write batches that touch their buckets, or by compact().
    delta_files: list[FileEntry] = field(default_factory=list)
    # manifest sharding (Iceberg manifest-list analog): above
    # ``manifest_shard_min_files`` entries, ``files`` is externalized
    # into content-addressed per-bucket-group shard files under
    # meta/shards/ and this field lists their relative paths — a commit
    # then rewrites only the shards whose bucket groups changed (the
    # content hash makes unchanged shards free).  In-memory, ``files``
    # is ALWAYS fully loaded; sharding is purely a serialization concern
    # owned by SnapshotLog.
    file_shards: list[str] = field(default_factory=list)
    repo_stats: dict[str, int] = field(default_factory=dict)  # top-K cumulative event counts
    parent: int | None = None
    properties: dict[str, str] = field(default_factory=dict)
    # commit audit metadata (Iceberg snapshot-summary / Delta history
    # analog): what produced this snapshot and when.  Absent in
    # pre-existing manifests (defaults apply on read).
    op: str = ""
    ts: float = 0.0

    def wm(self) -> dict[int, int]:
        return {int(k): int(v) for k, v in self.watermarks.items()}

    def live_row_count(self) -> int | None:
        """Exact live (non-tombstone) row count from metadata alone.

        None when the manifest cannot know it: pending merge-on-read
        delta files overlap base keys in ways only a key-join resolves,
        and files written before the ``live_rows`` stat lack it.  Every
        copy-on-write commit and every compaction restores exactness."""
        if self.delta_files:
            return None
        if any(e.live_rows < 0 for e in self.files):
            return None
        return sum(e.live_rows for e in self.files)

    def to_json(self) -> str:
        d = asdict(self)
        return json.dumps(d, indent=1, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Snapshot":
        d = json.loads(s)
        d["files"] = [FileEntry(**f) for f in d["files"]]
        # manifests written before the merge-on-read feature lack the key
        d["delta_files"] = [FileEntry(**f) for f in d.get("delta_files", [])]
        d.setdefault("file_shards", [])
        d.setdefault("op", "")
        d.setdefault("ts", 0.0)
        return Snapshot(**d)


class SnapshotLog:
    """The meta/ directory: versioned manifests + atomic LATEST pointer."""

    def __init__(self, root: str):
        self.root = root
        self.meta = os.path.join(root, "meta")
        self.shards_dir = os.path.join(self.meta, "shards")

    def _vpath(self, version: int) -> str:
        return os.path.join(self.meta, f"v{version:08d}.json")

    def _latest_path(self) -> str:
        return os.path.join(self.meta, "LATEST")

    def _tags_path(self) -> str:
        return os.path.join(self.meta, "TAGS.json")

    def read_tags(self) -> dict[str, int]:
        """Named snapshot refs (Iceberg tag analog): tag -> version."""
        try:
            with open(self._tags_path()) as f:
                return {str(k): int(v) for k, v in json.load(f).items()}
        except FileNotFoundError:
            return {}

    def write_tags(self, tags: dict[str, int]) -> None:
        os.makedirs(self.meta, exist_ok=True)
        self._atomic_write(
            self._tags_path(), json.dumps(dict(sorted(tags.items())), indent=1)
        )

    def exists(self) -> bool:
        return os.path.exists(self._latest_path())

    def current_version(self) -> int:
        with open(self._latest_path()) as f:
            return int(f.read().strip())

    def read(self, version: int | None = None) -> Snapshot:
        if version is None:
            version = self.current_version()
        with open(self._vpath(version)) as f:
            snap = Snapshot.from_json(f.read())
        if snap.file_shards:
            entries: list[FileEntry] = []
            for rel in snap.file_shards:
                with open(os.path.join(self.meta, rel)) as sf:
                    entries.extend(FileEntry(**e) for e in json.load(sf))
            snap.files = entries
        return snap

    def history(self) -> list[int]:
        if not os.path.isdir(self.meta):
            return []
        out = []
        for name in os.listdir(self.meta):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def _atomic_write(self, path: str, data: str) -> None:
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def _serialize(self, snap: Snapshot) -> str:
        """Manifest serialization, sharding ``files`` above a threshold.

        Entries are grouped by bucket range into CONTENT-ADDRESSED shard
        files (``shards/s<group>-<sha256 prefix>.json``): a shard whose
        entry set did not change hashes to the same name and is never
        rewritten, so steady-state commit I/O is O(touched shards) + one
        small manifest — not O(total files).  This is the Iceberg
        manifest-list analog the flat-JSON design deliberately left as a
        seam.  Crash between shard writes and the pointer swap leaves
        only orphan shard files (GC'd by vacuum).  Below the threshold
        the manifest stays a single self-contained JSON (small tables,
        and every pre-sharding manifest, read back unchanged)."""
        min_files = int(snap.properties.get("manifest_shard_min_files", "4096"))
        if len(snap.files) < min_files:
            snap.file_shards = []
            return snap.to_json()
        group = int(snap.properties.get("manifest_shard_buckets", "16"))
        shards: dict[int, list[FileEntry]] = {}
        for e in snap.files:
            g = (min(e.buckets) if e.buckets else 0) // group
            shards.setdefault(g, []).append(e)
        os.makedirs(self.shards_dir, exist_ok=True)
        rels = []
        for g in sorted(shards):
            payload = json.dumps(
                [asdict(e) for e in sorted(shards[g], key=lambda e: e.path)],
                sort_keys=True,
            )
            h = hashlib.sha256(payload.encode()).hexdigest()[:16]
            rel = os.path.join("shards", f"s{g:05d}-{h}.json")
            full = os.path.join(self.meta, rel)
            if not os.path.exists(full):  # unchanged shard -> zero I/O
                self._atomic_write(full, payload)
            rels.append(rel)
        saved = snap.files
        snap.file_shards = rels
        try:
            snap.files = []
            return snap.to_json()
        finally:
            snap.files = saved

    def commit(self, snap: Snapshot, expect_parent: int | None) -> None:
        """Atomically publish ``snap``.  ``expect_parent`` is the version
        the writer based this commit on — a cheap optimistic-concurrency
        check for the single-writer model."""
        os.makedirs(self.meta, exist_ok=True)
        if self.exists():
            cur = self.current_version()
            if expect_parent is None or cur != expect_parent:
                raise RuntimeError(
                    f"commit conflict: table at v{cur}, writer based on {expect_parent}"
                )
            if snap.version <= cur:
                raise RuntimeError(f"non-monotonic commit {snap.version} <= {cur}")
        # a stale v-file from a crashed commit (pointer never swapped) is
        # garbage under single-writer; overwrite it atomically
        self._atomic_write(self._vpath(snap.version), self._serialize(snap))
        self._atomic_write(self._latest_path(), str(snap.version))
        # fsync the directory so the pointer swap is durable
        dfd = os.open(self.meta, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

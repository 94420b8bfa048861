"""Hash / fingerprint / bucket expressions.

content_sha256 is THE correctness invariant (BASELINE.json:15): per-row
sha256 hex of normalized content, computed JVM-side with ``sha2`` (fastest
path; verified equal to Python hashlib in tests/test_functions.py).

key_bucket maps a (repo, path) key to a stable storage bucket:
- normal repo  -> pmod(xxhash64(repo), n_buckets)           (prunes by repo)
- hot repo i   -> n_buckets + i*salt + pmod(xxhash64(path), salt)
so a hot (Zipf-head) repo is spread over ``salt`` dedicated buckets instead
of overwhelming one — the engine's explicit skew defense (BASELINE.json:6
"salted repartitioning on hot repos"); AQE skew-join is the backstop.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def content_sha256(col: Column) -> Column:
    """sha256 hex digest of a string column (null -> null)."""
    return F.sha2(col, 256)


def content_sha256_py(s: str | None) -> str | None:
    if s is None:
        return None
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def key_bucket(
    repo: Column,
    path: Column,
    n_buckets: int,
    hot_repos: list[str],
    salt: int,
) -> Column:
    """Stable bucket id for a key under the current hot-repo set."""
    cold = F.pmod(F.xxhash64(repo), F.lit(n_buckets))
    out = cold
    for i, hr in enumerate(hot_repos):
        hot_bucket = F.lit(n_buckets + i * salt) + F.pmod(F.xxhash64(path), F.lit(salt))
        out = F.when(repo == F.lit(hr), hot_bucket).otherwise(out)
    return out.cast("int")


def fingerprint64(*cols: Column) -> Column:
    """Cheap 64-bit row fingerprint (diagnostics, salting)."""
    return F.xxhash64(*cols)

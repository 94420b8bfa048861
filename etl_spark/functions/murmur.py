"""Driver-side Murmur3 (x86_32) — bit-identical to Spark's ``hash()``
expression on a single INT column, plus exact shuffle-partition
placement tokens built on it.

Why: ``df.repartition(n, col)`` routes rows by
``pmod(murmur3(col, seed=42), n)``.  Hashing n distinct group ids into
n partitions leaves ~n/e partitions EMPTY and stacks 2-3 groups on
others (balls-in-bins), so the writer stage runs with uneven waves and
idle cores — measured 5.7/8 cores busy on the 8-core scaling leg while
the 2-core leg sat at 100%.  ``placement_tokens(n)`` inverts the hash:
for each target partition i it searches the smallest non-negative int
t_i with ``pmod(murmur3_int32(t_i), n) == i``.  Repartitioning on a
column that maps group -> t_i then lands EXACTLY one group per
partition — collision-free by construction, even waves, and the
downstream window/sort/write per partition sees exactly one
(bucket, slice) group.

The algorithm is public (Austin Appleby's MurmurHash3, public domain;
Spark's Murmur3_x86_32 variant).  Parity with Spark's ``F.hash`` on
int32 inputs is pinned in tests/test_functions.py.
"""

from __future__ import annotations

from functools import lru_cache

_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def murmur3_int32(x: int, seed: int = 42) -> int:
    """Murmur3_x86_32.hashInt(x, seed) as a SIGNED 32-bit int.

    Matches Spark's ``hash(int_col)`` (seed 42): one 4-byte block mix
    followed by the standard fmix finalizer with length 4.
    """
    k = (x * 0xCC9E2D51) & _M32
    k = _rotl32(k, 15)
    k = (k * 0x1B873593) & _M32
    h = (seed ^ k) & _M32
    h = _rotl32(h, 13)
    h = (h * 5 + 0xE6546B64) & _M32
    # fmix(h, len=4)
    h ^= 4
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    # Java int is signed
    return h - (1 << 32) if h >= (1 << 31) else h


def pmod32(h: int, n: int) -> int:
    """Spark's Pmod on a signed int32 hash: non-negative remainder."""
    r = h % n if h >= 0 else -((-h) % n)
    return r + n if r < 0 else r


@lru_cache(maxsize=64)
def placement_tokens(n: int) -> tuple[int, ...]:
    """n ints t_0..t_{n-1} with ``pmod(murmur3_int32(t_i), n) == i``.

    Expected search cost ~n·H(n) hash evaluations (coupon collector);
    n is bounded by the writer-partition cap (2048), so this is
    microseconds of driver work, cached per n.
    """
    out: list[int | None] = [None] * n
    found = 0
    t = 0
    while found < n:
        p = pmod32(murmur3_int32(t), n)
        if out[p] is None:
            out[p] = t
            found += 1
        t += 1
    return tuple(out)  # type: ignore[arg-type]

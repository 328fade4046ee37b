"""Pure-Python XXH64 matching Spark's built-in ``xxhash64`` (seed 42).

The engine's frontier key is ``F.xxhash64(canonical_url)`` (SURVEY.md X16).
The reference-semantics simulator (tests/simulator.py) and the hash-stability
tests need the identical value driver-side without a Spark round-trip, so this
implements the public XXH64 algorithm (xxhash spec, Yann Collet,
github.com/Cyan4973/xxHash — public BSD spec) over UTF-8 bytes with Spark's
default seed 42, returning Spark's signed-64 representation.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_XXHASH_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxhash64_bytes(data: bytes, seed: int = SPARK_XXHASH_SEED) -> int:
    """Unsigned XXH64 of raw bytes."""
    n, idx = len(data), 0
    if n >= 32:
        v1, v2 = (seed + _P1 + _P2) & _M, (seed + _P2) & _M
        v3, v4 = seed & _M, (seed - _P1) & _M
        while idx + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[idx : idx + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[idx + 8 : idx + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[idx + 16 : idx + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[idx + 24 : idx + 32], "little"))
            idx += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while idx + 8 <= n:
        h ^= _round(0, int.from_bytes(data[idx : idx + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        idx += 8
    if idx + 4 <= n:
        h ^= (int.from_bytes(data[idx : idx + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        idx += 4
    while idx < n:
        h ^= (data[idx] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        idx += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxhash64_py(s: str, seed: int = SPARK_XXHASH_SEED) -> int:
    """Signed-64 XXH64 of a string's UTF-8 bytes — equals Spark
    ``F.xxhash64(lit(s))`` exactly (asserted in tests/test_hashing.py)."""
    h = xxhash64_bytes(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h

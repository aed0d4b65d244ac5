"""Pure-Python implementation of Spark's ``xxhash64`` expression.

Spark's XXH64 (org.apache.spark.sql.catalyst.expressions.XXH64) follows
the reference xxHash64 layout for byte arrays — 32-byte stripes, then
full 8-byte words, one optional 4-byte word, then single bytes (verified
empirically against ``F.xxhash64`` across tail lengths 0..7). Strings
hash their UTF-8 bytes with Spark's default seed 42. This module exists
so expected outputs of minhash/simhash operators can be computed with no
Spark involved (tools/gen_fixtures.py); equality with ``F.xxhash64`` is
pinned by tests/test_fixtures.py.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_MASK = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _MASK, 31) * _P1) & _MASK


def _merge(h: int, acc: int) -> int:
    return ((h ^ _round(0, acc)) * _P1 + _P4) & _MASK


def xxh64(data: bytes, seed: int = 42) -> int:
    """Spark-compatible xxhash64 over raw bytes → SIGNED 64-bit int
    (matching the LongType column ``F.xxhash64`` produces)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        lane = int.from_bytes(data[i : i + 8], "little")
        h = ((_rotl(h ^ _round(0, lane), 27) * _P1) + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i : i + 4], "little")
        h = ((_rotl(h ^ (lane * _P1) & _MASK, 23) * _P2) + _P3) & _MASK
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] & 0xFF) * _P5) & _MASK, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_str(s: str, seed: int = 42) -> int:
    return xxh64(s.encode("utf-8"), seed)


def xxh64_long(v: int, seed: int = 42) -> int:
    """Spark's XXH64.hashLong (the single-8-byte-word path). Used to
    replicate MULTI-column ``F.xxhash64(str_col, long_lit)``: Spark folds
    columns left-to-right, each column hashed with the running value as
    seed — ``xxh64_long(lit, seed=xxh64_str(key) & MASK)``. Pinned against
    ``F.xxhash64`` in tests/test_fixtures.py."""
    v &= _MASK
    acc = (seed + _P5 + 8) & _MASK
    k1 = (_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK
    acc ^= k1
    acc = ((_rotl(acc, 27) * _P1) + _P4) & _MASK
    acc ^= acc >> 33
    acc = (acc * _P2) & _MASK
    acc ^= acc >> 29
    acc = (acc * _P3) & _MASK
    acc ^= acc >> 32
    return acc - (1 << 64) if acc >= (1 << 63) else acc

"""Driver-side XXH64 matching Spark's ``F.xxhash64`` bit-for-bit.

``F.pmod(F.xxhash64(col), F.lit(m))`` over a *handful of literal
strings* (query terms, shard routing of a known id list) is a whole
Spark job — createDataFrame, an Exchange for the distinct, a collect —
paid on EVERY indexed probe just to turn ≤ dozens of tiny strings into
partition-pruning literals. The guide's driver rule (§5: the driver
should do almost no data work) cuts the other way here: hashing twenty
short strings IS almost no work, and doing it in-process deletes a
fixed per-probe job from every serving call.

Spark's ``XxHash64`` is the public XXH64 algorithm (Collet) with
seed 42 over the column's UTF-8 bytes for strings, producing a SIGNED
64-bit value. ``xxh64_signed`` reproduces that exactly; parity is
property-tested against a live session in
tests/test_search.py (``test_term_buckets_python_hash_parity``) so a
Spark-side change of hash or seed fails loudly, not silently.
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned XXH64 of ``data`` (default seed 42 = Spark's)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            lane = int.from_bytes(data[i:i + 8], "little")
            v1 = (_rotl((v1 + lane * _P2) & _M, 31) * _P1) & _M
            lane = int.from_bytes(data[i + 8:i + 16], "little")
            v2 = (_rotl((v2 + lane * _P2) & _M, 31) * _P1) & _M
            lane = int.from_bytes(data[i + 16:i + 24], "little")
            v3 = (_rotl((v3 + lane * _P2) & _M, 31) * _P1) & _M
            lane = int.from_bytes(data[i + 24:i + 32], "little")
            v4 = (_rotl((v4 + lane * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _M, 31) * _P1) & _M)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        lane = int.from_bytes(data[i:i + 8], "little")
        h = ((_rotl(h ^ ((_rotl((lane * _P2) & _M, 31) * _P1) & _M), 27) * _P1)
             + _P4) & _M
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i:i + 4], "little")
        h = ((_rotl(h ^ ((lane * _P1) & _M), 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_signed(s: str, seed: int = 42) -> int:
    """``F.xxhash64(F.lit(s))`` — Spark's signed-long view of XXH64."""
    h = xxh64(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def pmod_xxh64(s: str, m: int, seed: int = 42) -> int:
    """``F.pmod(F.xxhash64(F.lit(s)), F.lit(m))`` — positive modulus
    (Python ``%`` with a positive divisor is already pmod)."""
    return xxh64_signed(s, seed) % m

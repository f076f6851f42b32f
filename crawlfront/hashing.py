"""Spark-compatible hashing, reimplemented in pure Python / NumPy.

``pyspark.sql.functions.hash`` is Murmur3_x86_32 with seed 42, applied to
the UTF-8 bytes of a string column.  Spark's tail handling is
NON-canonical: every trailing byte (when len % 4 != 0) is sign-extended
and mixed as a *full* word through mixK1+mixH1 (canonical murmur3 mixes
the tail bytes once, without the mixH1 step), so off-the-shelf murmur3
libraries disagree with Spark on any input whose byte length is not a
multiple of 4.  This module matches Spark bit-for-bit (verified in
tests/test_hashing.py against ``F.hash`` / ``F.xxhash64``).

Why a Python twin at all: the sequential oracle simulator (tests) and the
fixture generator must compute the same shard ids / bloom bit positions
as the JVM columns, without a SparkSession.  Hot paths inside the engine
always use the JVM-side ``F.hash`` / ``F.xxhash64`` columns.

Ref parity note: the reference crawler has no hashing at all (SURVEY.md
§2 X1 — dedup there is implicit); murmur3 canonicalize+dedup is mandated
by BASELINE.json:6,14.
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def murmur3_32(data: bytes | str, seed: int = 42) -> int:
    """Spark ``F.hash`` twin: Murmur3_x86_32 over UTF-8 bytes, seed 42.

    Returns a SIGNED int32 (same as Spark's IntegerType output).
    """
    if isinstance(data, str):
        data = data.encode("utf-8")
    h1 = seed & _M32
    n = len(data)
    aligned = n - (n % 4)
    for i in range(0, aligned, 4):
        k1 = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(k1))
    for i in range(aligned, n):
        b = data[i]
        if b >= 0x80:  # sign-extend the byte, as Spark's Platform.getByte does
            b -= 0x100
        h1 = _mix_h1(h1, _mix_k1(b & _M32))
    h1 = _fmix(h1, n)
    return h1 - 0x100000000 if h1 >= 0x80000000 else h1


# --- xxHash64, Spark flavor (F.xxhash64, seed 42) ------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64(data: bytes | str, seed: int = 42) -> int:
    """Spark ``F.xxhash64`` twin: xxHash64 over UTF-8 bytes, seed 42.

    Returns a SIGNED int64 (Spark LongType).  Spark's XXH64 over byte
    arrays is the canonical algorithm (unlike its murmur3 tail quirk).
    """
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 =(_rotl64((v1 + int.from_bytes(data[i : i + 8], "little") * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl64((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl64((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl64((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        k = (_rotl64((int.from_bytes(data[i : i + 8], "little") * _P2) & _M64, 31) * _P1) & _M64
        h = ((_rotl64(h ^ k, 27) * _P1) + _P4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = ((_rotl64(h, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl64(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - 0x10000000000000000 if h >= 0x8000000000000000 else h


def pmod(a: int, m: int) -> int:
    """Spark ``F.pmod`` twin: positive modulus."""
    r = a % m
    return r + m if r < 0 else r

"""Hash functions shared by the engine and the reference oracle.

The engine's hot path uses Spark-native, whole-stage-codegen'd hashes:
``F.xxhash64`` (64-bit url_hash) and ``F.hash`` (murmur3_32 fingerprint).
The oracle (a per-row reference simulator, not on the hot path) needs
bit-identical values, so this module provides pure-Python implementations
of exactly the variants Spark evaluates (seed 42, UTF-8 bytes; Spark's
murmur3 uses a nonstandard signed per-byte tail). Tests assert equality
against Spark's own output.

Bloom bit positions are derived from the 64-bit hash with splitmix64-style
mixing + Kirsch-Mitzenmacher double hashing — implemented both in numpy
(vectorized engine probe) and pure Python (oracle).

This replaces the reference's Python-``set``/``in``-list membership
structures (Utils/Insert_Nox_Data_to_DB.py:52,
New_YouTube_Crawler_Comment.py:275-313).
"""

from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1
_M32 = (1 << 32) - 1

_P64_1 = 0x9E3779B185EBCA87
_P64_2 = 0xC2B2AE3D27D4EB4F
_P64_3 = 0x165667B19E3779F9
_P64_4 = 0x85EBCA77C2B2AE63
_P64_5 = 0x27D4EB2F165667C5

SPARK_HASH_SEED = 42


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh_round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P64_2) & _M64
    return (_rotl64(acc, 31) * _P64_1) & _M64


def _xxh_merge(h: int, v: int) -> int:
    h ^= _xxh_round(0, v)
    return (h * _P64_1 + _P64_4) & _M64


def xxhash64(data: bytes, seed: int = SPARK_HASH_SEED) -> int:
    """XXH64 over ``data`` returning Spark's signed int64 (F.xxhash64)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P64_1 + _P64_2) & _M64
        v2 = (seed + _P64_2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P64_1) & _M64
        while i + 32 <= n:
            v1 = _xxh_round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _xxh_round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _xxh_round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _xxh_round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        h = _xxh_merge(h, v1)
        h = _xxh_merge(h, v2)
        h = _xxh_merge(h, v3)
        h = _xxh_merge(h, v4)
    else:
        h = (seed + _P64_5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _xxh_round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl64(h, 27) * _P64_1 + _P64_4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P64_1) & _M64
        h = (_rotl64(h, 23) * _P64_2 + _P64_3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P64_5) & _M64
        h = (_rotl64(h, 11) * _P64_1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_str(s: str, seed: int = SPARK_HASH_SEED) -> int:
    return xxhash64(s.encode("utf-8"), seed)


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mm_mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & _M32


def _mm_mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def murmur3_32(data: bytes, seed: int = SPARK_HASH_SEED) -> int:
    """Spark's Murmur3_x86_32.hashUnsafeBytes (F.hash on a string column).

    Nonstandard vs canonical murmur3: the unaligned tail is processed one
    SIGNED byte at a time through the full mix (mixK1 + mixH1), not the
    canonical partial-block xor.
    """
    n = len(data)
    h1 = seed & _M32
    aligned = n - n % 4
    for i in range(0, aligned, 4):
        k1 = int.from_bytes(data[i : i + 4], "little")
        h1 = _mm_mix_h1(h1, _mm_mix_k1(k1))
    for i in range(aligned, n):
        b = data[i]
        if b >= 128:
            b -= 256  # signed byte, masked back to 32-bit two's complement
        h1 = _mm_mix_h1(h1, _mm_mix_k1(b & _M32))
    # fmix
    h1 ^= n
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def murmur3_32_str(s: str, seed: int = SPARK_HASH_SEED) -> int:
    return murmur3_32(s.encode("utf-8"), seed)


# ---------------------------------------------------------------------------
# Bloom bit positions (double hashing over a splitmix64 remix of url_hash)
# ---------------------------------------------------------------------------
_SM_G = 0x9E3779B97F4A7C15


def _splitmix64_py(x: int) -> int:
    x = (x + _SM_G) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


def bloom_positions_py(url_hash: int, k: int, bits: int) -> list[int]:
    """k bit positions for one signed-int64 hash (oracle path)."""
    u = url_hash & _M64
    h1 = _splitmix64_py(u)
    h2 = _splitmix64_py(u ^ 0xDEADBEEFCAFEF00D) | 1
    return [((h1 + j * h2) & _M64) % bits for j in range(k)]


def _splitmix64_np(x: np.ndarray) -> np.ndarray:
    x = x + np.uint64(_SM_G)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def bloom_positions_np(url_hash: np.ndarray, k: int, bits: int) -> np.ndarray:
    """(n, k) uint64 bit positions for an int64 hash array (engine probe)."""
    with np.errstate(over="ignore"):
        u = url_hash.astype(np.int64).view(np.uint64)
        h1 = _splitmix64_np(u)
        h2 = _splitmix64_np(u ^ np.uint64(0xDEADBEEFCAFEF00D)) | np.uint64(1)
        j = np.arange(k, dtype=np.uint64)
        return (h1[:, None] + j[None, :] * h2[:, None]) % np.uint64(bits)


def stable64(s: str) -> int:
    """Unsigned 64-bit seed for synthetic-web RNGs (not a Spark hash)."""
    return xxhash64_str(s, seed=0) & _M64

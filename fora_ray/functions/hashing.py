"""Deterministic hashing + counter-based RNG (SURVEY.md sections 1.4, 2.6).

Everything here is a pure function of its inputs: results are identical
at any parallelism level, which is what makes the Monte-Carlo walk phase
(fora_ray.graph.fora) reproducible regardless of how walks are sharded
across actors — the reference's rand() calls are replaced by a
philox-style counter hash of (seed, stream, counter).
"""

from __future__ import annotations

import hashlib

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_U64 = np.uint64


def splitmix64(x: np.ndarray | int) -> np.ndarray | np.uint64:
    """Vectorized splitmix64 finalizer over uint64 (public-domain PRNG)."""
    with np.errstate(over="ignore"):
        z = (np.asarray(x, dtype=np.uint64) + _GOLDEN)
        z = (z ^ (z >> _U64(30))) * _M1
        z = (z ^ (z >> _U64(27))) * _M2
        z = z ^ (z >> _U64(31))
    return z


def mix64(a, b):
    """Combine two uint64 streams into one (order-sensitive)."""
    with np.errstate(over="ignore"):
        return splitmix64(np.asarray(a, dtype=np.uint64) ^ (np.asarray(b, dtype=np.uint64) + _GOLDEN))


def rng_uniform(keys: np.ndarray) -> np.ndarray:
    """Map uint64 keys -> float64 uniforms in [0, 1). Counter-based: the
    same key always yields the same uniform on every worker."""
    bits = splitmix64(keys) >> _U64(11)          # top 53 bits
    return bits.astype(np.float64) * (1.0 / (1 << 53))


def hash_str_u64(values) -> np.ndarray:
    """Stable 64-bit hash of strings (for partition keys / dedup keys).

    Uses blake2b(digest_size=8) per value — per-row Python loop, but each
    call is C-speed and this is only used on key columns, not content.
    """
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        if v is None:
            out[i] = 0
        else:
            out[i] = int.from_bytes(
                hashlib.blake2b(v.encode() if isinstance(v, str) else v, digest_size=8).digest(),
                "little",
            )
    return out


def sha256_hex(value: str | bytes) -> str:
    if isinstance(value, str):
        value = value.encode()
    return hashlib.sha256(value).hexdigest()


def pack_edge(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Pack (src, dst) int64 pairs into one uint64 key.

    Only valid for ids < 2^32 — callers working past that (the north
    rule's 10^12-file regime) must use the two-column pair paths
    (stages.shuffle.distinct_pairs, triangles strategy='join').  The
    guard is loud on purpose: silent truncation here corrupts results.
    """
    if src.size and (int(src.max()) >= 1 << 32 or int(dst.max()) >= 1 << 32):
        raise ValueError(
            "pack_edge: node id >= 2^32 — use the wide-id pair path "
            "(distinct_pairs / wide_ids=True) instead of packed u64 keys"
        )
    return (src.astype(np.uint64) << _U64(32)) | dst.astype(np.uint64)


def unpack_edge(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return (key >> _U64(32)).astype(np.int64), (key & _U64(0xFFFFFFFF)).astype(np.int64)

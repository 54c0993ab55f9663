"""Deduplication kernels: MinHash signatures, LSH banding, SimHash.

Numpy-vectorized, deterministic (fixed hash family seeds, no process-level
hash randomization). Used by ``extract_ocr_spark.operators.dedup``.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


def _hash_family(n_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) coefficients for n universal hash functions."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.int64)
    return a, b


# Hoisted once per process: rebuilding the RandomState + two randint
# arrays per *document* was pure waste in the hottest dedup kernel.
_DEFAULT_FAMILY = _hash_family(128, 1)


def stable_hash32(token: str) -> int:
    """Process-stable 32-bit hash of a string (crc32: C-speed, never
    PYTHONHASHSEED-dependent; adequate uniformity for MinHash)."""
    return zlib.crc32(token.encode("utf-8")) & 0xFFFFFFFF


def minhash_signature(shingles: list[str], n_perm: int = 128, seed: int = 1) -> list[int]:
    """MinHash signature over a shingle set (n_perm 32-bit mins)."""
    if n_perm == 128 and seed == 1:
        a, b = _DEFAULT_FAMILY
    else:
        a, b = _hash_family(n_perm, seed)
    if not shingles:
        return [int(_MAX_HASH)] * n_perm
    base = np.array([stable_hash32(s) for s in shingles], dtype=np.int64)
    # (n_shingles, n_perm) universal hashing, min over shingles.
    hashed = (base[:, None] * a[None, :] + b[None, :]) % _MERSENNE % _MAX_HASH
    return [int(v) for v in hashed.min(axis=0)]


def lsh_bands(signature: list[int], bands: int = 32) -> list[str]:
    """Split a signature into ``bands`` equal bands; each band hashes to a
    bucket key ``"<band_idx>:<digest>"``. Docs sharing any band key are
    candidate pairs."""
    n = len(signature)
    rows = n // bands
    keys: list[str] = []
    for i in range(bands):
        chunk = signature[i * rows:(i + 1) * rows]
        digest = hashlib.blake2b(
            np.array(chunk, dtype=np.int64).tobytes(), digest_size=8
        ).hexdigest()
        keys.append(f"{i}:{digest}")
    return keys


def estimate_jaccard(sig_a: list[int], sig_b: list[int]) -> float:
    a = np.asarray(sig_a)
    b = np.asarray(sig_b)
    return float((a == b).mean())


def exact_jaccard(shingles_a: list[str], shingles_b: list[str]) -> float:
    sa, sb = set(shingles_a), set(shingles_b)
    if not sa and not sb:
        return 1.0
    union = len(sa | sb)
    return len(sa & sb) / union if union else 0.0


def simhash60(tokens: list[str]) -> int:
    """60-bit SimHash over a token multiset — the ONE simhash scheme in
    the repo, bit-identical to the native Spark path
    (``operators.dedup._simhash_sig``): md5 first-15-hex token hashes
    (60 bits fits a signed int64 on the JVM side), per-bit majority vote
    with ties → 0, empty input → 0.

    Bit expansion is numpy-vectorized over the whole token batch (the
    per-token Python bit loop was the hot spot).
    """
    if not tokens:
        return 0
    hs = np.array(
        [int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
         for t in tokens],
        dtype=np.uint64,
    )
    bits = ((hs[:, None] >> np.arange(60, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    acc = (bits * 2 - 1).sum(axis=0)
    return int(np.bitwise_or.reduce(
        (np.uint64(1) << np.arange(60, dtype=np.uint64))[acc > 0], initial=np.uint64(0)))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_bands(value: int, blocks: int = 5, bits: int = 60) -> list[str]:
    """Manku multi-block bucket keys for a 60-bit simhash: split into
    ``blocks`` equal 12-bit blocks and emit one key per block *pair*
    (C(5,2)=10 keys). Any two simhashes within Hamming distance
    ``blocks - 2`` (= 3) leave ≥2 blocks untouched and so share the exact
    key of that pair — recall is exact by pigeonhole, while two-block
    (24-bit) keys keep bucket collisions near-linear at web scale where
    single-block 12-bit keys (4k buckets) would fan out O(n²/4k) pairs.

    Key encoding is IDENTICAL to ``operators.dedup._simhash_band_keys``
    (``"<i>-<j>:<block_i>,<block_j>"``, decimal, low-order block first):
    kernel-computed keys join native-computed keys directly — there is
    exactly one band-key scheme in the repo (r4 shipped two incompatible
    ones, documented-only; r5 unified them)."""
    base, extra = divmod(bits, blocks)
    vals, off = [], 0
    for i in range(blocks):
        width = base + (1 if i < extra else 0)
        vals.append((value >> off) & ((1 << width) - 1))
        off += width
    return [f"{i}-{j}:{vals[i]},{vals[j]}"
            for i in range(blocks) for j in range(i + 1, blocks)]

"""Pure-numpy hashing kernels used inside the pandas-UDF signature stage.

These are the vectorized re-expression of the reference's per-character
loops:

- ``shingle_hashes``  <- Kmer2Integer polynomial hash over a sliding
  window (pcluster/src/pcluster/util.hpp:244-250; window extraction
  kmer_search.cpp:68-81), computed for ALL positions at once with a
  strided view instead of a char loop.
- ``minhash_signature`` <- E2LSH hash family evaluation
  (hclust/src/hclust/lsh.hpp:29-59) reshaped from "K ints concatenated
  into a string key, L tables" into "num_perm universal-hash minima".
- ``simhash64`` <- KLSH sign-bit signature (pcluster/src/pcluster/
  lsh.cpp:17-49): random-hyperplane bits, except the hyperplanes are
  implicit in the bit-mix of each shingle hash (standard SimHash), so no
  projection matrix ships to executors.
- ``anchor_hashes`` <- content-defined sampling of long char-grams; the
  distributed replacement for the single-node suffix-array sort
  (IGC/shuffle_data/IGC/suffix_array.cpp:15-47): two documents sharing a
  span >= min_span share the same anchors regardless of alignment,
  because anchor *positions* are chosen by content, not by offset.

Everything is deterministic given (text bytes, config) — this module is
also the oracle used by tests to check the Spark UDF output.
"""

from __future__ import annotations

import numpy as np

_MIX_MULT1 = np.uint64(0xFF51AFD7ED558CCD)   # splitmix64 finalizer constants
_MIX_MULT2 = np.uint64(0xC4CEB9FE1A85EC53)
_U64_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
MERSENNE_61 = np.uint64((1 << 61) - 1)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates polynomial-hash outputs."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= _MIX_MULT1
    x ^= x >> np.uint64(33)
    x *= _MIX_MULT2
    x ^= x >> np.uint64(33)
    return x


def _gram_hashes_u64(data: np.ndarray, k: int) -> np.ndarray:
    """64-bit mixed hashes of every length-k byte window (stride 1).

    data: uint8 array of the canonicalized utf-8 text.
    Returns uint64 array of length max(0, len(data)-k+1).
    """
    n = int(data.shape[0])
    if n < k:
        return np.empty(0, dtype=np.uint64)
    w = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    # polynomial hash base 257 with natural uint64 wraparound, then mix
    powers = np.power(np.uint64(257), np.arange(k - 1, -1, -1, dtype=np.uint64))
    raw = (w * powers).sum(axis=1, dtype=np.uint64)
    return _mix64(raw)


def shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct 32-bit shingle hashes of all char k-grams (as uint64 < 2^32).

    32 bits keeps (a*h+b) inside uint64 for the MinHash family; per-doc
    shingle counts (<= ~100k) make birthday collisions negligible for
    Jaccard estimation.
    """
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    h = _gram_hashes_u64(data, k) >> np.uint64(32)
    return np.unique(h)


def minhash_signature(shingles: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """num_perm MinHash values: min over splitmix64(h XOR seed_i).

    splitmix64 is a bijection on uint64, so each seed defines a true
    permutation of the shingle universe (min-wise independence in the
    random-oracle sense — see DedupConfig.minhash_params for why a
    small-coefficient linear family fails). Empty set -> all int64 max.
    Returns int64 (raw uint64 bits reinterpreted; sign irrelevant).
    """
    if shingles.shape[0] == 0:
        return np.full(seeds.shape[0], (1 << 63) - 1, dtype=np.int64)
    # (num_perm, n_shingles) — bounded: n_shingles <= ~100k, num_perm 128
    vals = _mix64(shingles[None, :] ^ seeds[:, None])
    return vals.min(axis=1).view(np.int64)


def simhash64(shingles: np.ndarray) -> int:
    """64-bit SimHash over the (distinct) shingle hash set.

    Each shingle's implicit hyperplane bits are the bits of a second
    mix of its hash (hashes are < 2^32 here, so re-mix to fill 64 bits).
    Returns a Python int reinterpreted as signed int64 for Spark LongType.
    """
    if shingles.shape[0] == 0:
        return 0
    full = _mix64(shingles)
    bits = (full[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    fp = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            fp |= np.uint64(1) << np.uint64(i)
    return int(fp.astype(np.int64).view(np.int64))


def band_hashes(sig: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """Hash each band (r consecutive sig values) to one int64 bucket key.

    Re-expression of the reference's string-concatenated E2LSH keys
    (hclust/src/hclust/lsh.hpp:51-59) as fixed-width ints: polynomial
    combine + mix, vectorized over all bands at once (the reference
    rebuilds L tables serially, hclust.cpp:261-289).
    """
    m = np.ascontiguousarray(sig, dtype=np.int64).view(np.uint64).reshape(
        bands, rows_per_band
    )
    acc = np.zeros(bands, dtype=np.uint64)
    for j in range(rows_per_band):
        acc = acc * np.uint64(0x9E3779B97F4A7C15) + m[:, j]
    return _mix64(acc).astype(np.int64)


def anchor_hashes(
    text: str, gram: int, mod: int
) -> np.ndarray:
    """Content-defined sampled gram hashes for substring dedup.

    Hash every char `gram`-window (stride 1), keep those where
    hash % mod == 0 → expected density 1/mod, positions chosen by
    content so shared spans align across documents. Distinct values.
    """
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    h = _gram_hashes_u64(data, gram)
    if h.shape[0] == 0:
        return np.empty(0, dtype=np.int64)
    kept = h[h % np.uint64(mod) == 0]
    return np.unique(kept).astype(np.int64)


def jaccard(sh_a: np.ndarray, sh_b: np.ndarray) -> float:
    """Exact Jaccard over two distinct-shingle arrays (test oracle).

    Two empty sets score 0.0, matching verify_pairs: the shingle channel
    has no evidence for sub-k docs; the exact channel owns them.
    """
    if sh_a.shape[0] == 0 and sh_b.shape[0] == 0:
        return 0.0
    inter = np.intersect1d(sh_a, sh_b, assume_unique=True).shape[0]
    union = sh_a.shape[0] + sh_b.shape[0] - inter
    return inter / union if union else 1.0

"""Numpy hashing kernels: determinism + statistical sanity.

These kernels are the single source of truth for signatures (the Spark
UDFs call exactly these functions), so determinism here + UDF parity in
test_signatures.py gives the north rule's same-config→same-output anchor.
"""

from __future__ import annotations

import numpy as np

from hsearch_spark.config import DedupConfig
from hsearch_spark.functions import hashing as H


CFG = DedupConfig()
SALT = CFG.minhash_salt()
NP = CFG.num_perm


def test_shingle_hashes_deterministic_and_32bit():
    t = "the quick brown fox jumps over the lazy dog"
    h1 = H.shingle_hashes(t, 5)
    h2 = H.shingle_hashes(t, 5)
    assert np.array_equal(h1, h2)
    assert h1.dtype == np.uint64
    assert (h1 < (1 << 32)).all()
    # distinct + sorted
    assert np.array_equal(h1, np.unique(h1))


def test_shingle_hashes_short_text_empty():
    assert H.shingle_hashes("abc", 5).shape == (0,)
    assert H.shingle_hashes("", 5).shape == (0,)


def test_minhash_salt_deterministic():
    assert DedupConfig().minhash_salt() == SALT
    # different seed → different permutation
    assert DedupConfig(seed=7).minhash_salt() != SALT
    s = H.shingle_hashes("some document text to hash " * 10, 5)
    assert not np.array_equal(
        H.minhash_signature(s, NP, SALT),
        H.minhash_signature(s, NP, DedupConfig(seed=7).minhash_salt()),
    )


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 1 << 32, size=2000, dtype=np.uint64)
    # overlap 80%
    other = np.concatenate(
        [base[:1600], rng.integers(0, 1 << 32, size=400, dtype=np.uint64)]
    )
    sa, sb = np.unique(base), np.unique(other)
    true_j = H.jaccard(sa, sb)
    sig_a = H.minhash_signature(sa, NP, SALT)
    sig_b = H.minhash_signature(sb, NP, SALT)
    est = (sig_a == sig_b).mean()
    assert abs(est - true_j) < 0.12  # 128 perms → se ~ sqrt(j(1-j)/128) ≈ 0.04


def test_minhash_identical_sets_identical_sigs():
    s = H.shingle_hashes("hello world this is a doc " * 20, 5)
    assert np.array_equal(
        H.minhash_signature(s, NP, SALT),
        H.minhash_signature(s.copy(), NP, SALT),
    )


def test_simhash_close_for_similar_far_for_different():
    t1 = "the market price of shares rose sharply in morning trade " * 10
    t2 = t1.replace("sharply", "slowly", 1)
    t3 = "completely unrelated garden forest mountain river text " * 10
    f1 = H.simhash64(H.shingle_hashes(t1, 5))
    f2 = H.simhash64(H.shingle_hashes(t2, 5))
    f3 = H.simhash64(H.shingle_hashes(t3, 5))
    ham12 = bin((f1 ^ f2) & ((1 << 64) - 1)).count("1")
    ham13 = bin((f1 ^ f3) & ((1 << 64) - 1)).count("1")
    # J(t1,t2) ≈ 0.89 → expected hamming ≈ 64·θ/π ≈ 8±3; unrelated ≈ 32
    assert ham12 < 13
    assert ham13 > 20
    assert ham12 + 8 < ham13


def test_minhash_packed_matches_unpacked():
    s = H.shingle_hashes("a document with enough text to shingle nicely", 5)
    packed = H.minhash_signature_packed(s, NP, SALT)
    assert len(packed) == CFG.num_perm * 4
    assert np.array_equal(
        np.frombuffer(packed, dtype=np.uint32),
        H.minhash_signature(s, NP, SALT),
    )
    # empty set: all-ones sentinel
    empty = H.minhash_signature_packed(np.empty(0, dtype=np.uint64), NP, SALT)
    assert np.all(np.frombuffer(empty, dtype=np.uint32) == 0xFFFFFFFF)


def test_minhash_densification_small_sets():
    # fewer shingles than slots: every slot must still be filled, pure
    # function of the set, and two docs sharing their only shingles agree
    tiny = H.shingle_hashes("abcdefgh", 5)  # 4 shingles
    sig = H.minhash_signature(tiny, NP, SALT)
    assert sig.shape == (NP,)
    assert np.array_equal(sig, H.minhash_signature(tiny.copy(), NP, SALT))
    other = H.shingle_hashes("zyxwvuts", 5)
    assert not np.array_equal(sig, H.minhash_signature(other, NP, SALT))


def test_anchor_hashes_alignment_free():
    span = "shared central span of text that is long enough to contain anchors " * 6
    a = "prefix one two three " * 5 + span + " suffix alpha beta"
    b = "totally different lead-in material here " * 7 + span + " other tail"
    anc_a = H.anchor_hashes(a, CFG.anchor_gram, CFG.anchor_mod)
    anc_b = H.anchor_hashes(b, CFG.anchor_gram, CFG.anchor_mod)
    common = np.intersect1d(anc_a, anc_b)
    assert common.shape[0] >= CFG.anchor_min_common


def test_anchor_hashes_disjoint_for_unrelated():
    a = H.anchor_hashes("alpha beta gamma delta epsilon " * 30, CFG.anchor_gram, CFG.anchor_mod)
    b = H.anchor_hashes("one two three four five six " * 30, CFG.anchor_gram, CFG.anchor_mod)
    assert np.intersect1d(a, b).shape[0] == 0


def test_config_hash_stable():
    assert DedupConfig().config_hash() == DedupConfig().config_hash()
    assert DedupConfig().config_hash() != DedupConfig(seed=7).config_hash()

"""Measure OPH band-catch probability vs the independent-slot design curve.

The design curve P(candidate | J) = 1 - (1 - J^r)^b assumes the r slots
of a band are independent MinHash permutations. Our One-Permutation-
Hashing scheme draws all num_perm slots from ONE permutation (plus
cyclic densification for empty bins), so slot agreements are correlated
and the curve is advisory (hsearch_spark/config.py catch_probability
docstring). This tool replaces the theory-only claim with a number:
it synthesizes doc pairs spanning exact Jaccard 0.45-0.98 (random char
substitutions at swept rates over deterministic base docs), computes
signatures with the PRODUCTION kernels (shingle_hashes +
minhash_signature at the pinned config salt), and reports the measured
catch rate per exact-Jaccard bin, for realistic-length pages (~1500
chars, above the ~900-shingle densification threshold) and short docs
(~220 chars, densification-heavy).

Usage: python tools/measure_oph_catch.py [pairs_per_rate]
Driver-side numpy only (statistical property of the kernel, no cluster).
"""

from __future__ import annotations

import os
import string
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hsearch_spark.config import DedupConfig, catch_probability  # noqa: E402
from hsearch_spark.functions import hashing as H  # noqa: E402

ALPHABET = np.frombuffer(
    (string.ascii_lowercase + "    ").encode(), dtype=np.uint8
)


def _band_match(sig_a: np.ndarray, sig_b: np.ndarray, b: int, r: int) -> bool:
    """True iff >= 1 of the b bands has all r slots equal — exactly the
    candidacy event of explode_bands' band-key equality (the key is a
    hash of the r-slot slice, so slice equality == key equality modulo
    negligible xxhash collisions)."""
    a = sig_a[: b * r].reshape(b, r)
    c = sig_b[: b * r].reshape(b, r)
    return bool(np.any(np.all(a == c, axis=1)))


def measure(n_len: int, pairs_per_rate: int, cfg: DedupConfig, rng) -> dict:
    """{bin_lo: (caught, total, mean_J)} over swept mutation rates."""
    bins: dict[float, list] = {}
    # mutation rate p → J roughly (1-p)^(2k); sweep to cover J 0.45-0.98
    for p in np.linspace(0.002, 0.085, 24):
        for _ in range(pairs_per_rate):
            base = rng.choice(ALPHABET, size=n_len)
            mut = base.copy()
            hit = rng.random(n_len) < p
            mut[hit] = rng.choice(ALPHABET, size=int(hit.sum()))
            ta, tb = base.tobytes().decode(), mut.tobytes().decode()
            sa = H.shingle_hashes(ta, cfg.shingle_k)
            sb = H.shingle_hashes(tb, cfg.shingle_k)
            j = H.jaccard(sa, sb)
            if j < 0.40 or j > 0.995:
                continue
            siga = H.minhash_signature(sa, cfg.num_perm, cfg.minhash_salt())
            sigb = H.minhash_signature(sb, cfg.num_perm, cfg.minhash_salt())
            caught = _band_match(siga, sigb, cfg.bands, cfg.rows_per_band)
            lo = np.floor(j * 20) / 20  # 0.05-wide bins
            c, t, js = bins.setdefault(lo, [0, 0, 0.0])
            bins[lo] = [c + int(caught), t + 1, js + j]
    return bins


def main() -> None:
    pairs_per_rate = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    cfg = DedupConfig()
    rng = np.random.default_rng(20260817)
    print(
        f"config: b={cfg.bands} r={cfg.rows_per_band} "
        f"num_perm={cfg.num_perm} k={cfg.shingle_k}"
    )
    for n_len, label in ((1500, "page-length (~1500 chars)"),
                         (220, "short (~220 chars, densified)")):
        print(f"\n== {label} ==")
        print("J bin      pairs  measured  design   delta")
        bins = measure(n_len, pairs_per_rate, cfg, rng)
        for lo in sorted(bins):
            c, t, js = bins[lo]
            meas = c / t
            design = catch_probability(js / t, cfg.bands, cfg.rows_per_band)
            print(
                f"[{lo:.2f},{lo + 0.05:.2f})  {t:5d}   {meas:7.4f}  "
                f"{design:6.4f}  {meas - design:+7.4f}"
            )
        # the headline number: catch at J in [0.75, 0.85) (threshold 0.8)
        sel = [bins[lo] for lo in bins if 0.75 <= lo < 0.85]
        if sel:
            c = sum(x[0] for x in sel)
            t = sum(x[1] for x in sel)
            print(f"catch @ J in [0.75,0.85): {c}/{t} = {c / t:.4f}")


if __name__ == "__main__":
    main()

"""Measure the substring (anchor) channel's span-catch probability vs
its design curve — the anchor twin of measure_oph_catch.py.

Design claim (hsearch_spark/operators/substring.py module docstring): a
shared span of length L contains L - gram + 1 char windows; each
survives the content-defined filter with probability 1/mod, so the
number of shared anchors X ~ Binomial(L - gram + 1, 1/mod) and the pair
is caught iff X >= anchor_min_common. This tool replaces that
theory-only claim with a measured number: it plants byte-identical
spans of swept length L at RANDOM offsets inside otherwise-unrelated
random documents, computes anchors with the PRODUCTION kernel
(functions.hashing.anchor_hashes at the pinned gram/mod), and reports
P(pair caught) per L bin next to the binomial design value.

Reference methodology: measured per-bin accuracy rather than the design
formula alone (hclust/src/progs/motif_both_points.cpp:154-162 distance
bins).

Usage: python tools/measure_anchor_catch.py [pairs_per_len]
Driver-side numpy only (statistical property of the kernel, no cluster).
"""

from __future__ import annotations

import os
import string
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hsearch_spark.config import DedupConfig  # noqa: E402
from hsearch_spark.functions import hashing as H  # noqa: E402

ALPHABET = np.frombuffer(
    (string.ascii_lowercase + "    ").encode(), dtype=np.uint8
)

SPAN_LENGTHS = (100, 125, 150, 175, 200, 250, 300, 400, 600, 1000)


def design_catch(span_len: int, cfg: DedupConfig) -> float:
    """P(X >= min_common), X ~ Bin(span_len - gram + 1, 1/mod)."""
    n = span_len - cfg.anchor_gram + 1
    if n <= 0:
        return 0.0
    p = 1.0 / cfg.anchor_mod
    # P(X < min_common) via the stable log-pmf recurrence
    log_pmf = n * np.log1p(-p)  # k = 0
    miss = np.exp(log_pmf)
    for k in range(1, cfg.anchor_min_common):
        log_pmf += np.log((n - k + 1) / k) + np.log(p) - np.log1p(-p)
        miss += np.exp(log_pmf)
    return 1.0 - miss


def _rand_text(rng: np.random.Generator, n: int) -> np.ndarray:
    return rng.choice(ALPHABET, size=n)


def measure_pair(rng: np.random.Generator, span_len: int, cfg) -> bool:
    """Plant one shared span at independent random offsets in two random
    ~1500-char docs; caught iff the docs share >= min_common anchors —
    exactly substring_edges' gate (groupBy(anchor) pairing + count)."""
    span = _rand_text(rng, span_len)
    docs = []
    for _ in range(2):
        flank = 1500 - span_len
        off = int(rng.integers(0, max(flank, 1)))
        t = np.concatenate(
            [_rand_text(rng, off), span, _rand_text(rng, flank - off)]
        )
        docs.append(t.tobytes().decode())
    a = H.anchor_hashes(docs[0], cfg.anchor_gram, cfg.anchor_mod)
    b = H.anchor_hashes(docs[1], cfg.anchor_gram, cfg.anchor_mod)
    shared = np.intersect1d(a, b, assume_unique=True).shape[0]
    return shared >= cfg.anchor_min_common


def measure(pairs_per_len: int, seed: int = 20260818) -> dict[int, float]:
    cfg = DedupConfig()
    rng = np.random.default_rng(seed)
    out = {}
    for L in SPAN_LENGTHS:
        caught = sum(
            measure_pair(rng, L, cfg) for _ in range(pairs_per_len)
        )
        out[L] = caught / pairs_per_len
    return out


def main() -> None:
    pairs_per_len = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    cfg = DedupConfig()
    print(
        f"config: gram={cfg.anchor_gram} mod={cfg.anchor_mod} "
        f"min_common={cfg.anchor_min_common} min_span={cfg.min_span}"
    )
    print("span L   pairs  measured  design   delta")
    got = measure(pairs_per_len)
    for L in SPAN_LENGTHS:
        d = design_catch(L, cfg)
        print(
            f"{L:6d}  {pairs_per_len:5d}   {got[L]:7.4f}  {d:6.4f}  "
            f"{got[L] - d:+7.4f}"
        )
    print(
        f"catch @ L = min_span ({cfg.min_span}): {got[cfg.min_span]:.4f} "
        f"(design {design_catch(cfg.min_span, cfg):.4f})"
    )


if __name__ == "__main__":
    main()

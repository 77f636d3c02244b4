"""Per-core scaling profile of the OPH signature kernel — no Spark.

Measures what BENCH.md previously only asserted: whether the
local[8]→local[32] efficiency drop comes from the numpy signature
kernel saturating single-socket memory bandwidth, independent of any
Spark scheduling/GC effects.

Method: K worker PROCESSES (no GIL sharing, same as Spark's Python
workers) each compute MinHash+SimHash+anchor signatures over its own
partition of a fixed synthetic corpus; aggregate docs/sec is reported
per K. Perfect compute-bound scaling doubles throughput per doubling
of K; a flattening curve with rising per-doc time is the
bandwidth-saturation signature.

Usage: python tools/profile_kernel_scaling.py [n_docs_per_worker]
Appends a markdown table to stdout; BENCH.md cites the result.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_texts(n: int, seed: int) -> list[bytes]:
    import numpy as np

    rng = np.random.default_rng(seed)
    words = [bytes(rng.integers(97, 123, rng.integers(3, 9)).astype(np.uint8))
             for _ in range(500)]
    texts = []
    for _ in range(n):
        k = int(rng.integers(100, 300))
        texts.append(b" ".join(words[i] for i in rng.integers(0, 500, k)))
    return texts


def _worker(args) -> float:
    wid, n_docs = args
    import numpy as np  # noqa: F401

    from hsearch_spark.config import DedupConfig
    from hsearch_spark.functions import hashing as H

    cfg = DedupConfig()
    salt = cfg.minhash_salt()
    texts = _make_texts(n_docs, seed=1000 + wid)
    t0 = time.monotonic()
    for t in texts:
        import numpy as np

        data = np.frombuffer(t, dtype=np.uint8)
        spad, inv = H._prefix_tables(data)
        sh = np.unique(H._window_hashes(spad, inv, cfg.shingle_k) >> np.uint64(32))
        a = H._window_hashes(spad, inv, cfg.anchor_gram)
        _ = np.unique(a[a % np.uint64(cfg.anchor_mod) == 0])
        H.minhash_signature_packed(sh, cfg.num_perm, salt)
        H.simhash64(sh)
    return time.monotonic() - t0


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    print("| workers | docs/sec total | per-worker docs/sec | efficiency vs 1 |")
    print("|---|---|---|---|")
    base = None
    for k in (1, 2, 4, 8, 16, 32):
        with mp.Pool(k) as pool:
            # use the KERNEL-ONLY durations returned by each worker —
            # wall time around pool.map would also count interpreter
            # start, module imports, and corpus generation, which are
            # setup noise, not kernel scaling
            durs = pool.map(_worker, [(i, n_docs) for i in range(k)])
        total = sum(n_docs / d for d in durs)  # workers run concurrently
        per = total / k
        if base is None:
            base = per
        print(f"| {k} | {total:.0f} | {per:.0f} | {per / base:.3f} |",
              flush=True)


if __name__ == "__main__":
    main()

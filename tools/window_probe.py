"""Window-quality probe: is NOW a clean measurement window?

The sandbox is a shared-tenant VM; hypervisor steal under full load has
measured anywhere from 0.1% to 16.6% of busy CPU across hours (BENCH.md
round-3/round-4 headlines), and every scaling/bench number moves with
it. Run this before a sweep; gate on the printed verdict.

    python tools/window_probe.py [seconds]

Prints steal fraction under a synthetic full-width load plus a fixed
single-process GEMM latency (absolute host-speed yardstick; compare
against the baseline recorded in BENCH.md, not across machines).
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time


def _ticks() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


def _burn(seconds: float) -> None:
    x = 1.0
    t0 = time.time()
    while time.time() - t0 < seconds:
        x = x * 1.0000001 + 1e-9


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    n = mp.cpu_count()
    procs = [mp.Process(target=_burn, args=(seconds,)) for _ in range(n)]
    t0 = _ticks()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    t1 = _ticks()
    d = [a - b for a, b in zip(t1, t0)]
    nonidle = sum(d) - d[3]
    steal = d[7] / nonidle if nonidle else float("nan")

    import numpy as np

    a = np.random.default_rng(1).standard_normal((2000, 2000))
    b = np.random.default_rng(2).standard_normal((2000, 2000))
    a @ b  # warm
    best = min(
        (lambda t: (a @ b, time.monotonic() - t)[1])(time.monotonic())
        for _ in range(5)
    )
    verdict = "CLEAN" if steal < 0.03 else ("NOISY" if steal < 0.08 else "BAD")
    print(
        f"steal_frac_busy={steal:.4f} ({verdict} window, gate < 0.03)  "
        f"gemm_2000_ms={best * 1000:.1f} (BLAS-threaded; compare to "
        f"BENCH.md same-machine baseline)"
    )


if __name__ == "__main__":
    main()

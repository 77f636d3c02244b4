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


def gemm_ms(reps: int = 5, n: int = 2000) -> float:
    """Best-of-`reps` wall time of a fixed n×n GEMM, in ms — the
    host-speed yardstick. Round-4 finding (BENCH.md): the sandbox's
    effective CPU speed flips between a fast and a ~2× degraded mode
    intraday with ZERO /proc/stat steal, pinned 2100 MHz cpuinfo, no
    cgroup pressure, and no GC/disk signal — this is the only in-guest
    indicator that catches it (59 ms fast mode vs 114 ms degraded,
    2026-08-18/19). scaling_leg/bench record it per run so every
    number carries its host-mode weather report."""
    import numpy as np

    a = np.random.default_rng(1).standard_normal((n, n))
    b = np.random.default_rng(2).standard_normal((n, n))
    a @ b  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        a @ b
        best = min(best, time.monotonic() - t0)
    return best * 1000


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

    best = gemm_ms()
    verdict = "CLEAN" if steal < 0.03 else ("NOISY" if steal < 0.08 else "BAD")
    print(
        f"steal_frac_busy={steal:.4f} ({verdict} window, gate < 0.03)  "
        f"gemm_2000_ms={best:.1f} (BLAS-threaded; compare to "
        f"BENCH.md same-machine baseline)"
    )


if __name__ == "__main__":
    main()

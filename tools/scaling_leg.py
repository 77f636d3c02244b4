"""Run ONE leg of the N-vs-4N scaling sweep and dump JSON.

Usage: python tools/scaling_leg.py <cores> <n_docs> <out.json>
Same protocol as bench.py --scaling (warmup, best-of-2 reps on a
checkpointed fixture, assignment hash for the determinism invariant);
split per leg so arbitrarily large corpora fit external runner time
limits. Combine with tools/scaling_combine.py.

Every leg also samples /proc/stat around the timed reps and records the
HYPERVISOR STEAL fraction — the sandbox is a shared-tenant VM and the
measured steal under full load has ranged 9.7%-14.5% across windows
(with the historical since-boot steal/busy ratio near 24%). Steal hits
the wide leg much harder than the narrow one (a 2-core leg rarely
contends; an 8/32-core leg rides the machine ceiling), so a noisy
window silently deflates measured scaling efficiency without touching
correctness. Recording steal per leg makes each sweep row carry its
own weather report instead of leaving bad windows indistinguishable
from regressions.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _time_dedup  # noqa: E402
from hsearch_spark.session import build_session  # noqa: E402


def _cpu_ticks() -> list[int] | None:
    """[user nice sys idle iowait irq softirq steal ...] or None
    (non-Linux)."""
    try:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]
    except (OSError, ValueError):  # pragma: no cover - non-linux
        return None


def _steal_fraction(before: list[int] | None, after: list[int] | None):
    """(steal/total, steal/non-idle) over the interval, or (None, None)."""
    if before is None or after is None:
        return None, None
    d = [a - b for a, b in zip(after, before)]
    total = sum(d)
    nonidle = total - d[3]
    if total <= 0 or nonidle <= 0:
        return None, None
    return round(d[7] / total, 4), round(d[7] / nonidle, 4)


def main() -> None:
    cores, n_docs, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    from tools.window_probe import gemm_ms

    spark = build_session(app_name=f"scaling_leg_{cores}", cores=cores)
    _time_dedup(spark, 2000)  # warmup (JIT, shuffle dirs)
    gemm_before = gemm_ms(reps=3)
    t_before = _cpu_ticks()
    elapsed, n, h = _time_dedup(spark, n_docs, seed=43, reps=2)
    t_after = _cpu_ticks()
    gemm_after = gemm_ms(reps=3)
    spark.stop()
    steal_total, steal_busy = _steal_fraction(t_before, t_after)
    with open(out, "w") as f:
        json.dump(
            {"cores": cores, "n_docs": n, "sec": elapsed,
             "docs_per_sec": n / elapsed, "hash": h,
             "steal_frac_total": steal_total,
             "steal_frac_busy": steal_busy,
             # host-mode yardstick (fast ~59 ms / degraded ~114 ms on
             # this box — BENCH.md round 4); steal alone misses the flip
             "gemm_2000_ms": [round(gemm_before, 1), round(gemm_after, 1)]},
            f,
        )
    extra = (
        f"  steal {steal_busy:.1%} of busy CPU"
        if steal_busy is not None
        else ""
    )
    print(f"local[{cores}]: {elapsed:.1f}s  {n / elapsed:.1f} docs/sec{extra}")


if __name__ == "__main__":
    main()

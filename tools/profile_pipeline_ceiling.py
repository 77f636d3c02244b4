"""Hardware ceiling for SPARK-SHAPED work at 2→8 cores — the missing
decomposition for the large-corpus sweep rows.

tools/profile_kernel_scaling.py measures the numpy kernel's socket
ceiling (0.851 at 2→8 workers), but the kernel's per-doc working set is
tiny; at multi-million-doc corpora the binding resource is shuffle +
heap traffic, which only a real Spark pipeline generates. This tool
measures that ceiling directly:

- solo:  ONE `scaling_leg.py`-protocol dedup run on local[2]
  (n_docs, best-of-2, fixture excluded) — per-process docs/sec with
  the rest of the socket idle.
- quad:  FOUR such runs CONCURRENTLY (4 independent JVMs, 4 × local[2]
  = 8 cores total, disjoint seeds, each with its own heap) — the same
  per-process work under full 8-core socket traffic, with ZERO Spark
  coordination between them (no shared shuffle, no shared driver, no
  shared GC).

ceiling = mean(quad per-process docs/sec) / solo docs/sec. Any
single-job local[2]→local[8] efficiency measured on this box is capped
by this number times Spark's own scaling; pipeline_eff / ceiling
isolates the Spark-attributable fraction. Heaps are pinned equal
(SPARK_DRIVER_MEM) so solo and quad runs differ only in neighbors.

Usage: python tools/profile_pipeline_ceiling.py [n_docs] [heap]
(defaults 500000, 24g → quad uses 4×24g = 96g of the 125g box).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
LEG = os.path.join(HERE, "scaling_leg.py")


def _run_leg(out: str, heap: str, n_docs: int, extra_env: dict | None = None):
    env = dict(os.environ, SPARK_DRIVER_MEM=heap, **(extra_env or {}))
    return subprocess.Popen(
        [sys.executable, LEG, "2", str(n_docs), out],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    heap = sys.argv[2] if len(sys.argv) > 2 else "24g"
    tmp = tempfile.mkdtemp(prefix="ceiling_")

    solo_out = os.path.join(tmp, "solo.json")
    p = _run_leg(solo_out, heap, n_docs)
    p.wait()
    solo = json.load(open(solo_out))
    print(
        f"solo  local[2] @{n_docs}: {solo['docs_per_sec']:.1f} docs/s "
        f"(steal {solo.get('steal_frac_busy')})"
    )

    outs = [os.path.join(tmp, f"quad_{i}.json") for i in range(4)]
    # IDENTICAL work per process (same corpus protocol); scaling_leg's
    # fixed seed keeps runs comparable — what varies is only the three
    # concurrent neighbors. spark.local.dir separation avoids shuffle-
    # file collisions between the four JVMs.
    procs = [
        _run_leg(
            o,
            heap,
            n_docs,
            {"SPARK_LOCAL_DIRS": os.path.join(tmp, f"localdir{i}")},
        )
        for i, o in enumerate(outs)
    ]
    for p in procs:
        p.wait()
    quads = [json.load(open(o)) for o in outs]
    for i, q in enumerate(quads):
        print(
            f"quad[{i}] local[2] @{n_docs}: {q['docs_per_sec']:.1f} docs/s "
            f"(steal {q.get('steal_frac_busy')})"
        )
    mean_quad = sum(q["docs_per_sec"] for q in quads) / 4
    ceiling = mean_quad / solo["docs_per_sec"]
    agg = sum(q["docs_per_sec"] for q in quads)
    print(
        f"hardware ceiling (Spark-shaped, 2→8 cores): {ceiling:.3f}  "
        f"[aggregate quad throughput {agg:.0f} docs/s vs ideal "
        f"{4 * solo['docs_per_sec']:.0f}]"
    )
    # the determinism invariant must hold across all five runs
    hashes = {solo["hash"]} | {q["hash"] for q in quads}
    assert len(hashes) == 1, f"assignment hashes diverged: {hashes}"
    print("assignment hash identical across solo + all quad runs")


if __name__ == "__main__":
    main()

"""Run ONE leg of the N-vs-4N scaling sweep and dump JSON.

Usage: python tools/scaling_leg.py <cores> <n_docs> <out.json>
Same protocol as bench.py --scaling (warmup, best-of-2 reps on a
checkpointed fixture, assignment hash for the determinism invariant);
split per leg so arbitrarily large corpora fit external runner time
limits. Combine with tools/scaling_combine.py.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _time_dedup  # noqa: E402
from hsearch_spark.session import build_session  # noqa: E402


def main() -> None:
    cores, n_docs, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    spark = build_session(app_name=f"scaling_leg_{cores}", cores=cores)
    _time_dedup(spark, 2000)  # warmup (JIT, shuffle dirs)
    elapsed, n, h = _time_dedup(spark, n_docs, seed=43, reps=2)
    spark.stop()
    with open(out, "w") as f:
        json.dump(
            {"cores": cores, "n_docs": n, "sec": elapsed,
             "docs_per_sec": n / elapsed, "hash": h},
            f,
        )
    print(f"local[{cores}]: {elapsed:.1f}s  {n / elapsed:.1f} docs/sec")


if __name__ == "__main__":
    main()

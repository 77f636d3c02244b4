"""Per-stage 2-vs-8 scaling decomposition of the dedup pipeline.

Usage: python tools/profile_stage_scaling.py <cores> <n_docs> <out.json>

Same steady-state protocol as scaling_leg.py (checkpointed fixture,
warmup, best-of-2) but records run_dedup's per-stage wall times
(DedupResult.metrics["timings_sec"]: docs / sigs / candidates / edges /
clusters) per rep and reports each stage's FASTEST time, plus the final
assignment aggregate. Diffing two legs' JSON shows which stage eats the
efficiency: a stage at ratio ~4 scales, a stage at ratio ~1 is serial
coordination cost.

Run both legs back-to-back inside one clean window (tools/window_probe.py
first); steal annotations recorded per leg as in scaling_leg.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_leg import _cpu_ticks, _steal_fraction  # noqa: E402


def main() -> None:
    cores, n_docs, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from pyspark.sql import functions as F

    from hsearch_spark.plans.pipeline import run_dedup
    from hsearch_spark.session import build_session
    from hsearch_spark.sources.pages import pages_dataframe

    spark = build_session(app_name=f"stage_scaling_{cores}", cores=cores)

    def one_run(pages):
        t0 = time.monotonic()
        res = run_dedup(spark, pages)
        t_stages = time.monotonic()
        res.clusters.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.expr("bit_xor(xxhash64(doc_id, cluster_id))"), F.lit(0)
            ).alias("h"),
        ).collect()
        t1 = time.monotonic()
        timings = dict(res.metrics["timings_sec"])
        timings["final_agg"] = round(t1 - t_stages, 3)
        timings["total"] = round(t1 - t0, 3)
        return timings

    # warmup (JIT, shuffle dirs) on a small corpus
    wpages, _ = pages_dataframe(spark, n_docs=2000, seed=7)
    one_run(wpages.localCheckpoint())

    pages, _ = pages_dataframe(spark, n_docs=n_docs, seed=43)
    pages = pages.localCheckpoint()
    t_before = _cpu_ticks()
    reps = [one_run(pages) for _ in range(2)]
    t_after = _cpu_ticks()
    best = {k: min(r[k] for r in reps) for k in reps[0]}
    steal_total, steal_busy = _steal_fraction(t_before, t_after)
    payload = {
        "cores": cores,
        "n_docs": n_docs,
        "best_stage_sec": best,
        "reps": reps,
        "steal_frac_total": steal_total,
        "steal_frac_busy": steal_busy,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload["best_stage_sec"]))
    spark.stop()


if __name__ == "__main__":
    main()

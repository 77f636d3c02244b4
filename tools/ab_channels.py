"""A/B the two edge-channel materialization strategies (plans/pipeline.py):

- fused   (concurrent_channels=False): union the lazy channel plans and
  materialize once — the DAGScheduler overlaps the channels' shuffle-map
  stages inside one job.
- threads (concurrent_channels=True): each channel materialized from its
  own driver thread as a separate job (FAIR scheduler pools).

Usage: python tools/ab_channels.py [n_docs] [cores] [reps]
Prints one JSON line with best-of-reps seconds per strategy and asserts
the cluster-assignment hashes agree (the strategies are an execution
trade-off only, never a semantics change).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hsearch_spark.plans.pipeline import run_dedup  # noqa: E402
from hsearch_spark.session import build_session  # noqa: E402
from hsearch_spark.sources.pages import pages_dataframe  # noqa: E402


def _run(spark, pages, concurrent: bool) -> tuple[float, int]:
    t0 = time.monotonic()
    res = run_dedup(spark, pages, concurrent_channels=concurrent)
    row = res.clusters.agg(
        F.coalesce(
            F.expr("bit_xor(xxhash64(doc_id, cluster_id))"), F.lit(0)
        ).alias("h")
    ).collect()[0]
    return time.monotonic() - t0, int(row["h"])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = build_session(app_name="ab_channels", cores=cores)
    pages, _ = pages_dataframe(spark, n_docs=n_docs, seed=42)
    pages = pages.localCheckpoint()
    _run(spark, pages, True)  # warmup (JIT, shuffle dirs)

    best = {"fused": float("inf"), "threads": float("inf")}
    hashes = {}
    for _ in range(reps):
        for name, flag in (("fused", False), ("threads", True)):
            sec, h = _run(spark, pages, flag)
            best[name] = min(best[name], sec)
            hashes[name] = h
    assert hashes["fused"] == hashes["threads"], (
        "strategies produced different cluster assignments"
    )
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "cores": cores,
                "reps": reps,
                "fused_sec": round(best["fused"], 2),
                "threads_sec": round(best["threads"], 2),
                "fused_speedup": round(best["threads"] / best["fused"], 3),
                "assignment_hash_identical": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

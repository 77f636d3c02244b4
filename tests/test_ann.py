"""IVF approximate nearest-neighbor: recall vs brute force, exactness
at full probe, determinism."""

from __future__ import annotations

import numpy as np

from hsearch_spark.operators.ann import ivf_topk
from hsearch_spark.operators.dedup import cosine_topk_bruteforce


def _blobs(spark, n=400, d=16, n_clusters=8, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)) * 3
    rows = []
    for i in range(n):
        c = i % n_clusters
        v = centers[c] + rng.standard_normal(d) * 0.3
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _topk_sets(df, k):
    out = {}
    for r in df.collect():
        out.setdefault(r["a"], set()).add(r["b"])
    return out


def test_ivf_full_probe_is_exact(spark):
    e = _blobs(spark, n=120)
    exact = _topk_sets(cosine_topk_bruteforce(e, k=5), 5)
    ivf = _topk_sets(ivf_topk(e, k=5, n_lists=10, n_probe=10), 5)
    assert ivf == exact


def test_ivf_recall_reasonable(spark):
    e = _blobs(spark, n=400)
    exact = _topk_sets(cosine_topk_bruteforce(e, k=5), 5)
    ivf = _topk_sets(ivf_topk(e, k=5, n_lists=16, n_probe=4), 5)
    hits = sum(len(ivf.get(a, set()) & nb) for a, nb in exact.items())
    total = sum(len(nb) for nb in exact.values())
    assert hits / total >= 0.8, f"recall@5 {hits / total:.3f}"


def test_ivf_deterministic(spark):
    e = _blobs(spark, n=200)
    r1 = sorted(map(tuple, ivf_topk(e, k=3, n_lists=8, n_probe=2).collect()))
    r2 = sorted(
        map(tuple, ivf_topk(e.repartition(7), k=3, n_lists=8, n_probe=2).collect())
    )
    assert r1 == r2


def test_ivf_zero_vector_and_empty(spark):
    # zero vector must not poison the probe GEMM (NULL from x/0.0)
    e = _blobs(spark, n=60)
    zero = spark.createDataFrame(
        [(999, [0.0] * 16)], "vec_id long, embedding array<double>"
    )
    out = ivf_topk(e.union(zero), k=3, n_lists=8, n_probe=8)
    assert out.where("a = 999").count() == 3
    # empty input returns an empty typed frame, not a crash
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert ivf_topk(empty, k=3, n_lists=4, n_probe=2).count() == 0

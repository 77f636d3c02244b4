"""Hyperplane-LSH embedding near-dup: recall vs the brute-force twin,
hot-bucket output bound (star-R policy), determinism."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hsearch_spark.config import DedupConfig
from hsearch_spark.operators.dedup import embedding_near_dup_pairs


def _near_dup_corpus(spark, n_families=30, dups_per=3, d=16, seed=11):
    """Families of near-identical vectors (true near-dups) + noise."""
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for _ in range(n_families):
        base = rng.standard_normal(d)
        for _ in range(dups_per):
            v = base + rng.standard_normal(d) * 0.02
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(60):  # unrelated noise vectors
        rows.append((vid, [float(x) for x in rng.standard_normal(d)]))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _pairs(df):
    return {(r["a"], r["b"]) for r in df.select("a", "b").collect()}


def _brute_pairs(spark, e, threshold):
    norm = F.sqrt(
        F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    u = e.select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x / norm).alias("v"),
    )
    a = u.select(F.col("id").alias("a"), F.col("v").alias("va"))
    b = u.select(F.col("id").alias("b"), F.col("v").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.crossJoin(b)
        .where(F.col("a") < F.col("b"))
        .select("a", "b", dot.alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def test_recall_vs_bruteforce_twin(spark):
    e = _near_dup_corpus(spark)
    truth = _pairs(_brute_pairs(spark, e, 0.95))
    pred = _pairs(
        embedding_near_dup_pairs(e, threshold=0.95, n_planes=8, n_tables=12)
    )
    assert truth, "fixture produced no true near-dup pairs"
    recall = len(pred & truth) / len(truth)
    assert recall >= 0.99, f"recall {recall:.3f}"
    # verify step is exact → no false positives
    assert pred <= truth


def test_hot_bucket_output_is_bounded(spark):
    # one family of near-identical vectors — every member lands in the
    # same bucket in every table. Unbounded self-join: C(400,2) = 79800
    # pairs. Star-R policy: <= n*R pairs.
    n, r = 400, 4
    rng = np.random.default_rng(5)
    base = rng.standard_normal(16)
    rows = [
        (i, [float(x) for x in base + rng.standard_normal(16) * 1e-3])
        for i in range(n)
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cfg = DedupConfig(max_bucket_all_pairs=16, star_representatives=r)
    out = embedding_near_dup_pairs(
        e, threshold=0.5, n_planes=6, n_tables=4, config=cfg
    )
    n_pairs = out.count()
    assert n_pairs <= n * r, f"{n_pairs} pairs — hot bucket not star-capped"
    # connectivity preserved: every member still reaches a representative
    members = {x for row in out.collect() for x in (row["a"], row["b"])}
    assert len(members) == n


def test_lsh_near_dup_deterministic(spark):
    e = _near_dup_corpus(spark, n_families=10)
    p1 = _pairs(embedding_near_dup_pairs(e, threshold=0.9, n_planes=6, n_tables=8))
    p2 = _pairs(
        embedding_near_dup_pairs(
            e.repartition(13), threshold=0.9, n_planes=6, n_tables=8
        )
    )
    assert p1 == p2

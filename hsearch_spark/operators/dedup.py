"""Exact + embedding-space dedup operators (training-pipeline suite).

- exact dedup: hash-groupBy on the canonical text fingerprint — the
  degenerate-but-dominant case at web scale (ref analog: lexicographic
  record sort for exact grouping, IGC/sort_peptides.cpp:14-33, replaced
  by a hash aggregate: no global sort needed).
- embedding cosine near-dup + ANN top-k: brute-force as the oracle-able
  baseline; LSH-bucketed (random hyperplane = SimHash-over-floats) as
  the scale path — the direct descendant of the reference's KLSH
  (pcluster/src/pcluster/lsh.cpp:17-49), which IS random-hyperplane
  hashing of dense vectors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hsearch_spark.functions.text import fingerprint_col


def exact_duplicate_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (fingerprint, n_docs, keep=min id)."""
    return (
        docs.groupBy(fingerprint_col(F.col(text_col)).alias("fingerprint"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .where(F.col("n_docs") > 1)
    )


def exact_duplicate_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(a, b) pairs of byte-identical docs — pairs each dup with the group
    min (star pattern): O(n) pairs per group, same CC connectivity."""
    keyed = docs.select(
        "doc_id", fingerprint_col(F.col(text_col)).alias("fp")
    )
    mins = keyed.groupBy("fp").agg(
        F.min("doc_id").alias("a"), F.count("*").alias("n")
    ).where(F.col("n") > 1)
    return (
        keyed.join(mins, "fp")
        .where(F.col("doc_id") != F.col("a"))
        .select("a", F.col("doc_id").alias("b"))
    )


# ----------------------- embedding similarity ------------------------------


def _cosine_cols(u: str, v: str) -> tuple[F.Column, F.Column, F.Column]:
    dot = F.aggregate(
        F.zip_with(u, v, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nu = F.sqrt(
        F.aggregate(F.col(u), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    nv = F.sqrt(
        F.aggregate(F.col(v), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dot, nu, nv


def cosine_topk_bruteforce(
    embeddings: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k neighbors per vector — the small-scale oracle
    (ref analog: brute-force all-pairs verifier,
    motif_both_points_noLSH.cpp:36-56). Cross join + window top-k; only
    run at oracle scales.
    """
    lhs = embeddings.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va")
    )
    rhs = embeddings.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb")
    )
    dot, nu, nv = _cosine_cols("va", "vb")
    scored = (
        lhs.crossJoin(rhs)
        .where(F.col("a") != F.col("b"))
        .select("a", "b", (dot / (nu * nv)).alias("cos_sim"))
    )
    w = Window.partitionBy("a").orderBy(
        F.desc("cos_sim"), F.asc("b")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("a", "b", "cos_sim", "rnk")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path: random-hyperplane LSH buckets → within-bucket verify.

    Hyperplanes seeded from config (contrast ref srand(time(NULL)),
    pcluster.cpp:84), broadcast in the UDF closure. Bucket key = n_planes
    sign bits (the reference's KLSH key, lsh.cpp:40-49). Verify = exact
    cosine within bucket, JVM-side.
    """
    first = embeddings.select(F.size(vec_col).alias("d")).first()
    if first is None:
        return embeddings.sparkSession.createDataFrame(
            [], f"a long, b long, cos_sim double"
        )
    dim = first["d"]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    @F.pandas_udf(T.LongType())
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (mat @ planes) > 0  # (batch, n_planes)
        keys = (bits.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)).sum(
            axis=1
        )
        return pd.Series(keys.astype(np.int64))

    bucketed = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        bucket_udf(F.col(vec_col)).alias("bucket"),
    )
    x = bucketed.select(
        F.col("bucket"),
        F.col("id").alias("a"),
        F.col("vec").alias("va"),
    )
    y = bucketed.select(
        F.col("bucket"),
        F.col("id").alias("b"),
        F.col("vec").alias("vb"),
    )
    dot, nu, nv = _cosine_cols("va", "vb")
    return (
        x.join(y, "bucket")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", (dot / (nu * nv)).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
        .dropDuplicates(["a", "b"])
    )

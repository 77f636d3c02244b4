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


def _dot(u: str, v: str) -> F.Column:
    return F.aggregate(
        F.zip_with(u, v, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _unit_normalized(
    df: DataFrame, id_col: str, vec_col: str, out_id: str, out_vec: str
) -> DataFrame:
    """(id, vec/|vec|) — norms computed ONCE per row, not per pair.

    (Computing norms inside the pair join costs 2 extra O(d) interpreted
    HOF evaluations per pair — 3× the per-pair work for nothing.)
    """
    norm = F.sqrt(
        F.aggregate(F.col(vec_col), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return df.select(
        F.col(id_col).alias(out_id),
        F.transform(vec_col, lambda x: x / norm).alias(out_vec),
    )


def cosine_topk_bruteforce(
    embeddings: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k neighbors per vector — the small-scale oracle
    (ref analog: brute-force all-pairs verifier,
    motif_both_points_noLSH.cpp:36-56). Cross join + window top-k; only
    run at oracle scales. For anything bigger use cosine_topk_blocked
    (broadcast matrix) or embedding_near_dup_pairs (LSH).
    """
    lhs = _unit_normalized(embeddings, id_col, vec_col, "a", "va")
    rhs = _unit_normalized(embeddings, id_col, vec_col, "b", "vb")
    scored = (
        lhs.crossJoin(rhs)
        .where(F.col("a") != F.col("b"))
        .select("a", "b", _dot("va", "vb").alias("cos_sim"))
    )
    w = Window.partitionBy("a").orderBy(F.desc("cos_sim"), F.asc("b"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("a", "b", "cos_sim", "rnk")
    )


def cosine_topk_blocked(
    embeddings: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Block-matmul cosine top-k: the reference/query matrix is broadcast
    to executors and each Arrow batch of queries does ONE numpy matmul
    (B,d)@(d,n) instead of n per-pair lambda evaluations.

    This is the standard brute-force-at-scale shape: queries stream,
    reference set broadcasts (here the table itself — must fit in a
    broadcast, ~n*d*8 bytes; beyond that, shard the reference side and
    take top-k of top-ks, or switch to embedding_near_dup_pairs LSH).
    """
    import pandas as pd  # noqa: F811 (executor-side import)

    rows = embeddings.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    bc = embeddings.sparkSession.sparkContext.broadcast((ids, mat))

    schema = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.LongType(), False),
            T.StructField("cos_sim", T.DoubleType(), False),
            T.StructField("rnk", T.IntegerType(), False),
        ]
    )

    def compute(batches):
        ref_ids, ref = bc.value
        for pdf in batches:
            q_ids = pdf[id_col].to_numpy()
            q = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ ref.T  # (B, n)
            out_a, out_b, out_c, out_r = [], [], [], []
            for i in range(sims.shape[0]):
                s = sims[i]
                mask = ref_ids != q_ids[i]
                cand = np.flatnonzero(mask)
                # top-k by (-cos, id): lexsort is stable + deterministic
                ordered = cand[np.lexsort((ref_ids[cand], -s[cand]))][:k]
                out_a.extend([q_ids[i]] * len(ordered))
                out_b.extend(ref_ids[ordered])
                out_c.extend(s[ordered])
                out_r.extend(range(1, len(ordered) + 1))
            yield pd.DataFrame(
                {"a": out_a, "b": out_b, "cos_sim": out_c, "rnk": out_r}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(compute, schema)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 1,
) -> DataFrame:
    """Scale path: random-hyperplane LSH buckets → within-bucket verify.

    Hyperplanes seeded from config (contrast ref srand(time(NULL)),
    pcluster.cpp:84), broadcast in the UDF closure. Bucket key = n_planes
    sign bits (the reference's KLSH key, lsh.cpp:40-49), OR-amplified
    across `n_tables` independent tables (the reference's L-table loop,
    hclust.cpp:261-289, materialized as one array column + posexplode
    instead of L re-scans). Verify = exact cosine within bucket, JVM-side.
    """
    first = embeddings.select(F.size(vec_col).alias("d")).first()
    if first is None:
        return embeddings.sparkSession.createDataFrame(
            [], f"a long, b long, cos_sim double"
        )
    dim = first["d"]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes * n_tables))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (mat @ planes) > 0  # (batch, n_planes * n_tables)
        bits = bits.reshape(len(mat), n_tables, n_planes)
        keys = (bits.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)).sum(
            axis=2
        )  # (batch, n_tables)
        # disambiguate tables: high bits carry the table id
        keys |= np.arange(n_tables, dtype=np.uint64) << np.uint64(48)
        return pd.Series(list(keys.astype(np.int64)))

    bucketed = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.explode(bucket_udf(F.col(vec_col))).alias("bucket"),
    )
    norm = F.sqrt(
        F.aggregate(F.col("vec"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    unit = bucketed.select(
        "bucket", "id", F.transform("vec", lambda x: x / norm).alias("vec")
    )
    x = unit.select("bucket", F.col("id").alias("a"), F.col("vec").alias("va"))
    y = unit.select("bucket", F.col("id").alias("b"), F.col("vec").alias("vb"))
    return (
        x.join(y, "bucket")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", _dot("va", "vb").alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
        .dropDuplicates(["a", "b"])
    )

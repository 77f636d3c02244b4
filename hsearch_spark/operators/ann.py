"""IVF (inverted-file) approximate nearest-neighbor search over embeddings.

The brute-force block-matmul (operators.dedup.cosine_topk_blocked) and
the hyperplane-LSH near-dup (embedding_near_dup_pairs) cover the exact
and LSH ends; this adds the inverted-list family — the standard "coarse
quantizer + probe" scale path (descended from the reference's bucketed
KLSH probe search, hclust/src/hclust/kmer_search.cpp:100-120: hash the
query, search only its buckets).

Plan shape:
- centroids: n_lists vectors picked DETERMINISTICALLY (smallest
  xxhash64(id, seed)) — a seeded uniform sample; k-means would place
  better centroids but needs iterative training, and the IVF plumbing
  (the part Spark cares about) is identical. Centroids are tiny
  (n_lists × d) and broadcast in UDF closures.
- assign: every vector → nearest centroid list (one numpy GEMM per
  Arrow batch). This is the inverted file, partitioned by list_id.
- probe: every query → its n_probe nearest lists (same GEMM), exploded.
- search: probes ⋈ inverted lists on list_id — the ONLY shuffle, an
  equi-join on a n_lists-ary key — then exact cosine (JVM-side
  zip_with/aggregate) and a per-query top-k window.

recall@k rises with n_probe; n_probe == n_lists degenerates to exact
brute force (tested). At 10^9+ vectors, n_lists scales as ~sqrt(n) and
the join touches n_probe/n_lists of the table per query instead of all
of it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _centroids(
    embeddings: DataFrame, n_lists: int, seed: int, id_col: str, vec_col: str
) -> np.ndarray:
    """(n_lists, d) unit-normalized centroid matrix — deterministic
    seeded sample (smallest xxhash64(id, seed)); bounded driver
    materialization of n_lists rows only."""
    rows = (
        embeddings.select(id_col, vec_col)
        .withColumn("_h", F.xxhash64(F.col(id_col), F.lit(seed)))
        .orderBy("_h", id_col)
        .limit(n_lists)
        .collect()
    )
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def ivf_topk(
    embeddings: DataFrame,
    k: int,
    n_lists: int = 64,
    n_probe: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k of every vector against the table.

    Returns (a, b, cos_sim, rnk) like cosine_topk_blocked; rnk ranks the
    candidates actually probed, so recall@k < 1 when n_probe < n_lists.
    """
    if n_probe > n_lists:
        raise ValueError("n_probe must be <= n_lists")
    if embeddings.isEmpty():
        return embeddings.sparkSession.createDataFrame(
            [], "a long, b long, cos_sim double, rnk int"
        )
    cents = _centroids(embeddings, n_lists, seed, id_col, vec_col)

    raw_norm = F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    # zero-vector guard: x/0.0 is NULL under non-ANSI division, and a
    # NULL array element crashes the probe GEMM
    norm = F.when(raw_norm == 0.0, F.lit(1.0)).otherwise(raw_norm)
    unit = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: x.cast("double") / norm).alias("v"),
    )

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_udf(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # already unit vectors
        sims = m @ cents.T  # (batch, n_lists)
        # n_probe nearest lists, deterministic tie-break by list index
        order = np.lexsort(
            (np.broadcast_to(np.arange(cents.shape[0]), sims.shape), -sims),
            axis=1,
        )[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    # both the inverted file and the probe side consume `probed`;
    # persist so normalization + probe GEMM run once (bounded_persist
    # evicts caches from prior calls at this site)
    from hsearch_spark.utils import bounded_persist

    probed = bounded_persist(
        unit.withColumn("lists", probe_udf("v")), "ann.ivf_topk"
    )
    # inverted file: a vector belongs to its single nearest list
    inv = probed.select(
        F.col("id").alias("b"),
        F.col("v").alias("vb"),
        F.element_at("lists", 1).alias("list_id"),
    )
    queries = probed.select(
        F.col("id").alias("a"),
        F.col("v").alias("va"),
        F.explode("lists").alias("list_id"),
    )

    # Per-list GEMM via cogroup: (queries probing list L) × (members of
    # list L) meet in ONE pandas group each — candidate pairs are never
    # materialized as rows, the scoring is a numpy matmul, and only each
    # query's per-list top-k leaves the task (same total-order
    # (-cos, id) selection as the final merge, so nothing in the global
    # top-k is lost). A pathologically popular list bounds the group at
    # |probers| + |members| rows; re-centroiding (more lists) is the
    # production lever against centroid skew.
    def per_list_topk(key, q_pdf, m_pdf):
        if len(q_pdf) == 0 or len(m_pdf) == 0:
            return pd.DataFrame({"a": [], "b": [], "cos_sim": []})
        q_ids = q_pdf["a"].to_numpy(dtype=np.int64)
        q_order = np.argsort(q_ids)  # canonical row order: BLAS micro-
        q_ids = q_ids[q_order]       # kernels round differently per row
        qm = np.stack(q_pdf["va"].to_numpy())[q_order]  # lane → sort both sides
        m_ids = m_pdf["b"].to_numpy(dtype=np.int64)
        order = np.argsort(m_ids)
        m_ids = m_ids[order]
        mm = np.stack(m_pdf["vb"].to_numpy())[order]
        sims = qm @ mm.T
        # self-exclusion, vectorized: pin sims[i, pos(q_id)] = -inf
        pos = np.searchsorted(m_ids, q_ids)
        hit = (pos < len(m_ids)) & (m_ids[np.minimum(pos, len(m_ids) - 1)] == q_ids)
        sims[np.flatnonzero(hit), pos[hit]] = -np.inf
        # top-k per row: stable argsort on -sims breaks ties by column
        # position, and columns are m_id-ascending → exactly the
        # (-cos, id) total order, no per-row Python loop
        kk = min(k, sims.shape[1])
        top = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(np.arange(len(q_ids)), kk)
        cols = top.ravel()
        keep = np.isfinite(sims[rows, cols])
        rows, cols = rows[keep], cols[keep]
        return pd.DataFrame(
            {"a": q_ids[rows], "b": m_ids[cols], "cos_sim": sims[rows, cols]}
        )

    scored = (
        queries.groupBy("list_id")
        .cogroup(inv.groupBy("list_id"))
        .applyInPandas(per_list_topk, "a long, b long, cos_sim double")
    )
    # a member belongs to exactly one list, so (a, b) appears at most
    # once across all probed lists — no pair dedup needed
    w = Window.partitionBy("a").orderBy(F.desc("cos_sim"), F.asc("b"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("a", "b", "cos_sim", "rnk")
    )

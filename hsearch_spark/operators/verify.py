"""Exact-verify join: candidate pairs -> edges with exact Jaccard.

Reference parity: the exact-distance verify gate after the LSH filter
(kmer_search.cpp:106-112; threshold gate hash_search.cpp:593-599). Two
levels, cheapest first (ref two-level filter, SURVEY.md §4):

1. signature-agreement estimate over the 126-slot MinHash arrays
   (~1 KB/doc): the unbiased Jaccard estimator, evaluated JVM-side via
   zip_with/aggregate. Pairs with est < est_prefilter are dropped —
   for a true τ=0.8 pair, P(drop) < 1e-4 at prefilter 0.65.
2. exact Jaccard for the survivors by RE-SHINGLING their texts inside a
   vectorized pandas UDF (numpy sorted-array intersection). Re-shingling
   beats storing shingle arrays: the arrays are ~10 KB/doc (bigger than
   the page text), would dominate the sigs table and every shuffle that
   touches it, while the exact stage only ever needs them for the tiny
   post-prefilter candidate set.

Plan shape at scale: candidates(a,b) joins docs(doc_id, text) twice on
doc_id (shuffle or AQE-broadcast of the candidate side), then one
mapInPandas pass. Texts travel only for surviving candidates.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hsearch_spark.config import DedupConfig
from hsearch_spark.functions import hashing as H

VERIFY_SCHEMA = T.StructType(
    [
        T.StructField("a", T.LongType(), False),
        T.StructField("b", T.LongType(), False),
        T.StructField("jaccard", T.DoubleType(), False),
    ]
)


def exact_jaccard_pairs(
    candidates: DataFrame, docs: DataFrame, config: DedupConfig
) -> DataFrame:
    """(a, b) + docs(doc_id, text) -> (a, b, jaccard) — exact, re-shingled."""
    k = config.shingle_k
    d = docs.select("doc_id", "text")
    ta = d.select(F.col("doc_id").alias("a"), F.col("text").alias("text_a"))
    tb = d.select(F.col("doc_id").alias("b"), F.col("text").alias("text_b"))
    paired = candidates.join(ta, "a").join(tb, "b")
    # AQE coalesces the (byte-small) join output to a couple of partitions,
    # which would serialize the CPU-heavy re-shingling below onto 2-3
    # Python workers; spread pairs across the cluster first — this stage
    # is compute-bound, not byte-bound, so advisory-size coalescing is
    # exactly wrong for it
    paired = paired.repartition(
        candidates.sparkSession.sparkContext.defaultParallelism, "a", "b"
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Per-partition shingle cache: hub docs (one doc in many
        # surviving pairs) re-shingle once per partition instead of once
        # per pair. Bounded FIFO (~cap × 10 KB worst case) so a partition
        # full of distinct docs can't grow it without limit.
        cache: dict[int, np.ndarray] = {}
        cap = 4096

        def shingles(doc_id: int, text) -> np.ndarray:
            s = cache.get(doc_id)
            if s is None:
                s = H.shingle_hashes(str(text), k)
                if len(cache) >= cap:
                    cache.pop(next(iter(cache)))
                cache[doc_id] = s
            return s

        for pdf in batches:
            jac = np.empty(len(pdf), dtype=np.float64)
            it = zip(pdf["a"], pdf["b"], pdf["text_a"], pdf["text_b"])
            for i, (a, b, x, y) in enumerate(it):
                jac[i] = H.jaccard(shingles(a, x), shingles(b, y))
            yield pd.DataFrame(
                {"a": pdf["a"], "b": pdf["b"], "jaccard": jac}
            )

    return paired.select("a", "b", "text_a", "text_b").mapInPandas(
        compute, VERIFY_SCHEMA
    )


def _cogroup_pair_payload(
    pairs: DataFrame,
    payload: DataFrame,
    kernel,
    out_schema,
    num_parts: int,
) -> DataFrame:
    """Doc-once-per-partition pair/payload co-grouping.

    The join-join plan (pairs ⋈ payload on a, then on b) ships payload_a
    once per PAIR through the second exchange — at 1.6M docs the edges
    phase moved 7.6 GB of shuffle per rep, and the event-log profile
    showed the same map stage paying 3× the CPU at 8 cores vs 2 (memory-
    bandwidth amplification on serialize+compress; BENCH.md round 5).
    This plan moves each doc's payload once per PARTITION instead:

      1. pairs get a partition key _p = xxhash64(a, b) % num_parts
         (16-byte rows — the only per-pair exchange);
      2. a (doc_id, _p) need-list (≤ 2 × pairs rows, distinct) is
         BROADCAST, so the payload table never shuffles — each payload
         row is tagged map-side with the partitions that need it;
      3. cogroup by _p: the kernel sees (pairs_pdf, payload_pdf) and
         resolves doc_id → payload row via searchsorted.

    Payload bytes moved = Σ_doc |payload| × #partitions-needing-doc —
    bounded by the per-pair cost, and ≈1× for the singleton-dominant
    pair graphs dedup produces. Inner-join semantics are preserved: a
    pair whose doc is missing from payload is dropped by the kernel.

    Caller must prove the broadcast bound (pairs ≤
    config.verify_cogroup_max_pairs) — verify_pairs falls back to the
    join plan otherwise. Per-group memory is pairs/num_parts × 16 B +
    the payloads its docs need; num_parts scales with the cluster
    (defaultParallelism), keeping groups flat at any corpus size.
    """
    p = pairs.select(
        "a",
        "b",
        F.pmod(F.xxhash64("a", "b"), F.lit(num_parts)).alias("_p"),
    )
    need = (
        p.select(F.col("a").alias("doc_id"), "_p")
        .unionAll(p.select(F.col("b").alias("doc_id"), "_p"))
        .distinct()
        # fresh attribute ids: need derives from p and meets it again in
        # the cogroup — without re-aliasing, Spark's self-join check
        # flags _p as ambiguous
        .toDF("doc_id", "_p")
    )
    pay = payload.join(F.broadcast(need), "doc_id")
    return (
        p.groupBy("_p").cogroup(pay.groupBy("_p")).applyInPandas(kernel, out_schema)
    )


def _pair_payload_indices(pairs_pdf: pd.DataFrame, ids: np.ndarray):
    """(a, b, idx_a, idx_b) for pairs whose BOTH docs exist in ids —
    vectorized searchsorted lookup, inner-join semantics."""
    a = pairs_pdf["a"].to_numpy(dtype=np.int64)
    b = pairs_pdf["b"].to_numpy(dtype=np.int64)
    if ids.size == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z, z
    order = np.argsort(ids, kind="mergesort")
    sids = ids[order]

    def locate(vals):
        pos = np.searchsorted(sids, vals)
        pos_c = np.minimum(pos, sids.size - 1)
        return order[pos_c], sids[pos_c] == vals

    ia, oka = locate(a)
    ib, okb = locate(b)
    ok = oka & okb
    return a[ok], b[ok], ia[ok], ib[ok]


def minhash_estimate_cogrouped(
    candidates: DataFrame, sigs: DataFrame, num_parts: int
) -> DataFrame:
    """minhash_estimate via the doc-once cogroup plan — identical
    estimates (same (xa == xb).mean over the same packed blobs), sig
    blobs moved once per partition instead of once per pair."""

    def kernel(pairs_pdf: pd.DataFrame, sig_pdf: pd.DataFrame) -> pd.DataFrame:
        ids = sig_pdf["doc_id"].to_numpy(dtype=np.int64)
        a, b, ia, ib = _pair_payload_indices(pairs_pdf, ids)
        if a.size == 0:
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype="int64"),
                    "b": pd.Series(dtype="int64"),
                    "jaccard_est": pd.Series(dtype="float64"),
                }
            )
        mat = np.frombuffer(b"".join(sig_pdf["sig"]), dtype=np.uint32).reshape(
            len(sig_pdf), -1
        )
        return pd.DataFrame(
            {"a": a, "b": b, "jaccard_est": (mat[ia] == mat[ib]).mean(axis=1)}
        )

    return _cogroup_pair_payload(
        candidates,
        sigs.select("doc_id", "sig"),
        kernel,
        "a long, b long, jaccard_est double",
        num_parts,
    )


def exact_jaccard_pairs_cogrouped(
    candidates: DataFrame, docs: DataFrame, config: DedupConfig, num_parts: int
) -> DataFrame:
    """exact_jaccard_pairs via the doc-once cogroup plan — identical
    jaccard values (same shingle_hashes/jaccard kernels), each doc's
    text moved once per partition and shingled exactly once per group
    (strictly better than the join plan's bounded FIFO cache)."""
    k = config.shingle_k

    def kernel(pairs_pdf: pd.DataFrame, docs_pdf: pd.DataFrame) -> pd.DataFrame:
        ids = docs_pdf["doc_id"].to_numpy(dtype=np.int64)
        a, b, ia, ib = _pair_payload_indices(pairs_pdf, ids)
        if a.size == 0:
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype="int64"),
                    "b": pd.Series(dtype="int64"),
                    "jaccard": pd.Series(dtype="float64"),
                }
            )
        sh = [H.shingle_hashes(str(t), k) for t in docs_pdf["text"]]
        jac = np.empty(a.size, dtype=np.float64)
        for i in range(a.size):
            jac[i] = H.jaccard(sh[ia[i]], sh[ib[i]])
        return pd.DataFrame({"a": a, "b": b, "jaccard": jac})

    return _cogroup_pair_payload(
        candidates,
        docs.select("doc_id", "text"),
        kernel,
        VERIFY_SCHEMA,
        num_parts,
    )


def verify_pairs(
    candidates: DataFrame,
    sigs: DataFrame,
    docs: DataFrame,
    config: DedupConfig,
    method: str = "minhash",
    pair_rows: int | None = None,
) -> DataFrame:
    """(a, b) -> edges(a, b, jaccard, method) where jaccard >= threshold.

    pair_rows: the caller-known row count of `candidates` (the pipeline
    reads it from the checkpointed stage for free). The doc-once cogroup
    plan runs only when config.verify_plan == "cogroup" AND pair_rows is
    provided and at most verify_cogroup_max_pairs (the need-list
    broadcast is proven bounded by 2 × pair_rows rows); otherwise the
    join-join plan runs — including the default verify_plan="join",
    which measured faster on tmpfs-shuffle hosts at every tested scale
    (see DedupConfig.verify_plan). Survivor sets and values are
    identical either way — pinned by tests/test_verify.py
    cogroup-equality tests and the pipeline's cross-plan
    assignment-hash determinism (hash 4305472057565209187 at 1.6M docs
    under both plans).
    """
    use_cogroup = (
        config.verify_plan == "cogroup"
        and pair_rows is not None
        and 0 < pair_rows <= config.verify_cogroup_max_pairs
    )
    num_parts = max(
        candidates.sparkSession.sparkContext.defaultParallelism * 4, 8
    )
    if config.est_prefilter is not None:
        est = (
            minhash_estimate_cogrouped(candidates, sigs, num_parts)
            if use_cogroup
            else minhash_estimate(candidates, sigs)
        )
        candidates = (
            est.where(F.col("jaccard_est") >= config.est_prefilter)
            .select("a", "b")
        )
    exact = (
        exact_jaccard_pairs_cogrouped(candidates, docs, config, num_parts)
        if use_cogroup
        else exact_jaccard_pairs(candidates, docs, config)
    )
    return (
        exact.where(F.col("jaccard") >= config.jaccard_threshold)
        .withColumn("method", F.lit(method))
    )


def minhash_estimate(candidates: DataFrame, sigs: DataFrame) -> DataFrame:
    """Signature-agreement Jaccard estimate (cheap prefilter / diagnostics).

    est = fraction of the num_perm signature slots that agree — the
    unbiased MinHash estimator, over the packed-uint32 signature blobs
    (one equality compare per 4 bytes in numpy; the whole candidate
    batch is two frombuffer + one vectorized compare).
    """

    @F.pandas_udf(T.DoubleType())
    def est_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series(np.empty(0, dtype=np.float64))
        xa = np.frombuffer(b"".join(a), dtype=np.uint32).reshape(len(a), -1)
        xb = np.frombuffer(b"".join(b), dtype=np.uint32).reshape(len(b), -1)
        return pd.Series((xa == xb).mean(axis=1))

    s = sigs.select("doc_id", "sig")
    sa = s.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a"))
    sb = s.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b"))
    return (
        candidates.join(sa, "a")
        .join(sb, "b")
        .select("a", "b", est_udf("sig_a", "sig_b").alias("jaccard_est"))
    )

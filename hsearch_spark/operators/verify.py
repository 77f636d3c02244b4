"""Exact-verify join: candidate pairs -> edges with exact Jaccard.

Reference parity: the exact-distance verify gate after the LSH filter
(kmer_search.cpp:106-112; threshold gate hash_search.cpp:593-599). Two
levels, cheapest first (ref two-level filter, SURVEY.md §4):

1. (optional, free) MinHash-estimate prefilter when candidate volume is
   huge — not enabled by default; the band join is already selective.
2. exact Jaccard via array_intersect/array_union on the stored shingle
   arrays — pure JVM-side built-ins, whole-stage codegen, no Python.

Plan shape at scale: candidates(a,b) join sigs twice. `sigs` is large,
so both joins are shuffle joins on doc_id — but candidates ≪ corpus
(LSH already pruned), and AQE converts to broadcast when the candidate
side is small. Shingle arrays never travel further than this one stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hsearch_spark.config import DedupConfig


def verify_pairs(
    candidates: DataFrame,
    sigs: DataFrame,
    config: DedupConfig,
    method: str = "minhash",
) -> DataFrame:
    """(a, b) -> edges(a, b, jaccard, method) where jaccard >= threshold.

    Two levels (ref: kmer_search.cpp:100-112 cheap gate → exact verify):
    1. signature-agreement estimate over the 126-slot sig arrays
       (~1 KB/doc — broadcast-size side tables, no shingle movement);
       drop pairs with est < est_prefilter.
    2. exact Jaccard on shingle arrays for the survivors only.
    """
    if config.est_prefilter is not None:
        candidates = minhash_estimate(candidates, sigs).where(
            F.col("jaccard_est") >= config.est_prefilter
        ).select("a", "b")
    sh = sigs.select("doc_id", "shingles")
    sa = sh.select(
        F.col("doc_id").alias("a"), F.col("shingles").alias("sh_a")
    )
    sb = sh.select(
        F.col("doc_id").alias("b"), F.col("shingles").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    # union == 0 ⇒ both docs shorter than shingle_k: the shingle channel
    # has NO evidence — score 0, don't merge. (All zero-shingle docs share
    # the all-sentinel MinHash signature, so without this they'd all land
    # in one bucket and verify to 1.0, collapsing every tiny doc into one
    # cluster. Byte-identical short docs are caught by the exact channel.)
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        candidates.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= config.jaccard_threshold)
        .withColumn("method", F.lit(method))
    )


def minhash_estimate(
    candidates: DataFrame, sigs: DataFrame
) -> DataFrame:
    """Signature-agreement Jaccard estimate (cheap prefilter / diagnostics).

    est = fraction of the num_perm signature slots that agree — the
    unbiased MinHash estimator; zip_with + aggregate, all JVM-side.
    """
    s = sigs.select("doc_id", "sig")
    sa = s.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a"))
    sb = s.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b"))
    agree = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda u, v: (u == v).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        candidates.join(sa, "a")
        .join(sb, "b")
        .select("a", "b", (agree / F.size("sig_a")).alias("jaccard_est"))
    )

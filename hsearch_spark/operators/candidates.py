"""Candidate-pair generation: LSH bucket self-join with explicit skew control.

Reference parity: the per-bucket all-pairs loops (hclust.cpp:186-205,
hclust2.cpp:107-131) and the candidate-set union across L tables with
test-once labels (motif_both_points.cpp:222-243). The reference's only
skew control is a hard output cap (500 hits, pcluster.cpp:115-116); we
make skew a first-class plan decision:

- buckets of size <= max_bucket_all_pairs emit all C(n,2) pairs
  (exactly the reference semantics);
- hot buckets (boilerplate pages all hashing to one band value) emit a
  bounded "star-R" pairing instead: every member pairs with the R
  members having the smallest doc_ids. For connected-components dedup
  this preserves connectivity whenever any representative verifies, at
  O(n*R) pairs instead of O(n^2) — a 10^5-doc boilerplate bucket goes
  from 5e9 pairs to 8e5. Drops are *logged, not silent* (bucket_metrics).

At 100 TB the band self-join is THE shuffle: keys are (band_id,
band_hash) — uniformly-mixed 64-bit hashes, so the shuffle itself is
balanced; only the within-bucket pair blowup needs the cap above.
AQE skew-join handles residual stragglers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hsearch_spark.config import DedupConfig


def bucket_metrics(bands: DataFrame) -> DataFrame:
    """Bucket-size histogram — the skew diagnostic the reference computes
    under `#ifdef BUCKETSIZE` (pcluster.cpp:38-66), as a metrics table."""
    sizes = bands.groupBy("band_id", "band_hash").agg(
        F.count("*").alias("bucket_size")
    )
    return sizes.groupBy("bucket_size").agg(
        F.count("*").alias("n_buckets")
    )


def candidate_pairs(bands: DataFrame, config: DedupConfig) -> DataFrame:
    """bands(doc_id, band_id, band_hash) -> pairs(a, b), a < b, distinct.

    Plan shape: rank members within each bucket once (one shuffle on the
    band key), then a single self-equi-join on (band_id, band_hash)
    with rank predicates expressing both the small-bucket all-pairs and
    the hot-bucket star-R policy — no separate code path, no second
    shuffle, and the join output is pre-bounded (Catalyst sees plain
    conjuncts on the joined row).

    Pair dedup across bands (ref: test-once labels,
    motif_both_points.cpp:222-243) = dropDuplicates BEFORE the expensive
    verify stage — dedup-then-verify, not verify-then-dedup.
    """
    w = Window.partitionBy("band_id", "band_hash").orderBy("doc_id")
    ranked = (
        bands.withColumn("rnk", F.row_number().over(w))
        .withColumn(
            "bsz", F.count("*").over(Window.partitionBy("band_id", "band_hash"))
        )
        .where(F.col("bsz") > 1)
    )
    x, y = ranked.alias("x"), ranked.alias("y")
    small = F.col("x.bsz") <= config.max_bucket_all_pairs
    star = F.col("x.rnk") <= config.star_representatives
    pairs = (
        x.join(
            y,
            on=[
                F.col("x.band_id") == F.col("y.band_id"),
                F.col("x.band_hash") == F.col("y.band_hash"),
                F.col("x.rnk") < F.col("y.rnk"),
                small | star,
            ],
        )
        .select(
            F.least("x.doc_id", "y.doc_id").alias("a"),
            F.greatest("x.doc_id", "y.doc_id").alias("b"),
        )
        .dropDuplicates(["a", "b"])
    )
    return pairs


def dropped_pairs_metrics(bands: DataFrame, config: DedupConfig) -> DataFrame:
    """Per-bucket count of pairs NOT emitted by the star-R policy —
    the no-silent-truncation ledger (SURVEY.md §4 'no silent truncation')."""
    sizes = bands.groupBy("band_id", "band_hash").agg(F.count("*").alias("n"))
    n, r = F.col("n"), F.lit(config.star_representatives)
    all_pairs = n * (n - 1) / 2
    star_pairs = r * n - r * (r + 1) / 2
    return sizes.where(n > config.max_bucket_all_pairs).select(
        "band_id",
        "band_hash",
        "n",
        (all_pairs - star_pairs).cast("long").alias("dropped_pairs"),
    )


def simhash_candidates(sigs: DataFrame, config: DedupConfig) -> DataFrame:
    """SimHash candidate channel: docs sharing any 16-bit fingerprint chunk.

    Pigeonhole: hamming distance <= 3 over 64 bits → at least one of the
    4 chunks is identical. Equi-join on (chunk_id, chunk_value), then the
    cheap bit_count gate (ref two-level filter: kmer_search.cpp:100-112).
    """
    n_chunks = 4
    chunk_cols = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk_id"),
                F.shiftright(F.col("simhash"), i * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("chunk"),
            )
            for i in range(n_chunks)
        ]
    )
    chunks = (
        sigs.select("doc_id", "simhash", F.explode(chunk_cols).alias("c"))
        .select("doc_id", "simhash", "c.chunk_id", "c.chunk")
    )
    x, y = chunks.alias("x"), chunks.alias("y")
    return (
        x.join(
            y,
            on=[
                F.col("x.chunk_id") == F.col("y.chunk_id"),
                F.col("x.chunk") == F.col("y.chunk"),
                F.col("x.doc_id") < F.col("y.doc_id"),
            ],
        )
        .where(
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            )
            <= config.simhash_hamming_max
        )
        .select(
            F.col("x.doc_id").alias("a"),
            F.col("y.doc_id").alias("b"),
        )
        .dropDuplicates(["a", "b"])
    )

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

from pyspark.sql import DataFrame
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


def bucket_pairs_grouped(
    df: DataFrame,
    key_cols: list[str],
    config: DedupConfig,
    max_bucket: int | None = None,
) -> DataFrame:
    """Generic within-bucket pairing: df(doc_id, *key_cols) -> (a, b).

    ONE shuffle (the groupBy), zero self-joins, zero window sorts: each
    bucket aggregates to a sorted doc_id array and pairs are generated
    with nested array transforms (pure Column expressions, codegen'd).
    Buckets over max_bucket_all_pairs emit the star-R pairing (every
    member pairs with the R smallest ids) — connectivity-preserving,
    O(n·R) output. `max_bucket` (e.g. the anchor df cap) drops larger
    buckets entirely (boilerplate semantics, substring.py).

    The per-bucket array is the memory bound to watch: a pathological
    bucket of 10^6 members is an 8 MB aggregation value — acceptable;
    beyond that the key must be salted upstream (operators/skew.py),
    which the bucket_metrics histogram is there to detect.

    (The previous plan — two window functions + a ranked self-join on
    the bucket key — computed the window sort twice, shuffled twice,
    and joined; this is ~2× faster at 50k docs and strictly fewer
    exchanges in the plan.)
    """
    grouped = df.groupBy(*key_cols).agg(
        F.array_sort(F.collect_list("doc_id")).alias("ids")
    )
    n = F.size("ids")
    grouped = grouped.where(n > 1)
    if max_bucket is not None:
        grouped = grouped.where(n <= max_bucket)
    outer_len = F.when(
        n <= config.max_bucket_all_pairs, n - 1
    ).otherwise(F.least(F.lit(config.star_representatives), n - 1))
    pair_structs = F.flatten(
        F.transform(
            F.slice("ids", 1, outer_len),
            lambda x, i: F.transform(
                F.slice(
                    "ids", i + F.lit(2), F.size("ids")
                ),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        grouped.select(F.explode(pair_structs).alias("p"))
        .select("p.a", "p.b")
        .dropDuplicates(["a", "b"])
    )


def candidate_pairs(bands: DataFrame, config: DedupConfig) -> DataFrame:
    """bands(doc_id, band_id, band_hash) -> pairs(a, b), a < b, distinct.

    Pair dedup across bands (ref: test-once labels,
    motif_both_points.cpp:222-243) = dropDuplicates BEFORE the expensive
    verify stage — dedup-then-verify, not verify-then-dedup.
    """
    return bucket_pairs_grouped(bands, ["band_id", "band_hash"], config)


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

"""Incremental dedup: Structured Streaming over newly-crawled pages.

The reference is batch-only (SURVEY.md §2.11); this module is the
forward-looking increment path a production crawl needs: new pages
arrive continuously, and each micro-batch must be deduplicated against
BOTH itself and the already-indexed corpus without recomputing the
corpus.

Design (foreachBatch — the right tool when a batch needs arbitrary
DataFrame ops + idempotent sink writes):

1. persisted state = the `sigs` and `bands` tables of all docs indexed
   so far (parquet in-sandbox, Iceberg in production; appends only).
2. per micro-batch:
   a. extract + signature the new pages (same seeded config — signatures
      are append-compatible forever),
   b. candidates = new-batch self-join  ∪  (new bands ⋈ indexed bands)
      — the probe join is the reference's center-probe pattern
      (kmer_search.cpp:100-121): small new side against the big indexed
      side, shuffle on band_hash,
   c. exact-verify, append verified edges to the edge table,
   d. append the new sigs/bands to state.
3. cluster assignments are recomputed from the cumulative edge table on
   demand (CC is cheap relative to signature+join work); incremental CC
   (merging only affected components) is a straightforward extension —
   new edges only ever merge existing clusters, never split them.

Watermarks/late data: dedup state is keyed by content, not event time —
a "late" page is just a new page; no watermark needed. Exactly-once:
batch_id-keyed append directories make retried batches idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hsearch_spark.config import DedupConfig
from hsearch_spark.functions.signatures import add_signature_columns, explode_bands
from hsearch_spark.functions.text import extract_pages
from hsearch_spark.operators.candidates import candidate_pairs
from hsearch_spark.operators.verify import verify_pairs


class IncrementalDedup:
    """State + the foreachBatch body. Testable without a streaming query
    (process_batch is a pure batch function, as foreachBatch bodies are)."""

    def __init__(
        self, spark: SparkSession, state_dir: str, config: DedupConfig | None = None
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.config = config or DedupConfig()
        os.makedirs(state_dir, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.state_dir, name)

    def _read_state(self, name: str) -> DataFrame | None:
        path = self._path(name)
        try:
            df = self.spark.read.parquet(path)
        except Exception:
            return None
        # batch_id is a physical partition column of the state layout,
        # not part of the logical schema
        return df.drop("batch_id")

    def _append(self, name: str, df: DataFrame, batch_id: int) -> None:
        # batch_id-keyed subdir → idempotent on micro-batch retry
        path = os.path.join(self._path(name), f"batch_id={batch_id}")
        df.write.mode("overwrite").parquet(path)

    def process_batch(self, new_pages: DataFrame, batch_id: int) -> None:
        cfg = self.config
        docs = extract_pages(new_pages)
        sigs = add_signature_columns(docs, cfg).localCheckpoint()
        bands = explode_bands(sigs, cfg).localCheckpoint()

        # within-batch candidates (new × new)
        cands = candidate_pairs(bands, cfg)

        # probe join against the indexed corpus (new × old): the small
        # new side streams against the big state side on the band key
        old_bands = self._read_state("bands")
        if old_bands is not None:
            probe = (
                bands.alias("n")
                .join(
                    old_bands.alias("o"),
                    on=[
                        F.col("n.band_id") == F.col("o.band_id"),
                        F.col("n.band_hash") == F.col("o.band_hash"),
                        F.col("n.doc_id") != F.col("o.doc_id"),
                    ],
                )
                .select(
                    F.least("n.doc_id", "o.doc_id").alias("a"),
                    F.greatest("n.doc_id", "o.doc_id").alias("b"),
                )
                .dropDuplicates(["a", "b"])
            )
            cands = cands.union(probe).dropDuplicates(["a", "b"])

        # verify needs shingles of BOTH sides — state sigs + new sigs
        old_sigs = self._read_state("sigs")
        all_sigs = sigs if old_sigs is None else sigs.unionByName(old_sigs)
        old_docs = self._read_state("docs")
        slim_docs = docs.select("doc_id", "text")
        all_docs = (
            slim_docs
            if old_docs is None
            else slim_docs.unionByName(old_docs)
        )
        edges = verify_pairs(cands, all_sigs, all_docs, cfg)

        self._append("edges", edges, batch_id)
        self._append("sigs", sigs, batch_id)
        self._append("bands", bands, batch_id)
        self._append("docs", docs.select("doc_id", "text"), batch_id)

    def current_clusters(self) -> DataFrame:
        """CC over the cumulative edge table (on-demand materialization)."""
        from hsearch_spark.operators.components import (
            assign_clusters,
            connected_components,
        )

        sigs = self._read_state("sigs")
        edges = self._read_state("edges")
        if sigs is None:
            raise ValueError("no state yet")
        docs = sigs.select("doc_id")
        if edges is None or edges.isEmpty():
            return docs.select(
                "doc_id", F.col("doc_id").alias("cluster_id")
            )
        return assign_clusters(docs, connected_components(edges))

    def start_stream(self, pages_stream: DataFrame, checkpoint_dir: str):
        """Wire process_batch into a real streaming query (file/Kafka
        source upstream). availableNow triggers drain-and-stop batches."""
        return (
            pages_stream.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid)
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

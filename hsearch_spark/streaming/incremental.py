"""Incremental dedup: Structured Streaming over newly-crawled pages.

The reference is batch-only (SURVEY.md §2.11); this module is the
forward-looking increment path a production crawl needs: new pages
arrive continuously, and each micro-batch must be deduplicated against
BOTH itself and the already-indexed corpus without recomputing the
corpus.

Design (foreachBatch — the right tool when a batch needs arbitrary
DataFrame ops + idempotent sink writes):

1. persisted state = the `sigs` and `bands` tables of all docs indexed
   so far (parquet in-sandbox, Iceberg in production; appends only),
   PLUS a bounded `clusters` snapshot (non-singleton assignments only).
   State tables are HASH-BUCKET PARTITIONED (hive layout
   `batch_id=N/state_bucket=K/`): bands by pmod(xxhash64(band_hash),
   B) (the hash is band-index-salted, so it alone is the full band
   key), sigs/docs by pmod(xxhash64(doc_id), B). A micro-batch
   first computes WHICH buckets it touches (≤ B driver-side values) and
   reads only those partitions — at a crawl's steady state (small batch
   vs huge corpus) the probe join scans a fraction of the state instead
   of all of it, and the fraction shrinks as B grows.
2. per micro-batch:
   a. extract + signature the new pages (same seeded config — signatures
      are append-compatible forever),
   b. candidates = new-batch self-join  ∪  (new bands ⋈ indexed bands)
      — the probe join is the reference's center-probe pattern
      (kmer_search.cpp:100-121): small new side against the PRUNED
      indexed side, shuffle on band_hash,
   c. exact-verify (texts pulled only for candidate ids, again
      bucket-pruned), append verified edges to the edge table,
   d. MERGE-ONLY incremental CC: new edges are contracted through the
      existing assignment snapshot (endpoint → its cluster root); edges
      whose endpoints already share a root drop out; connected
      components runs on the tiny contracted remainder only, and the
      resulting root-remap is applied to the snapshot. New edges can
      only ever MERGE clusters, never split them, so this is exact —
      the O(all-edges-ever) CC recompute of the naive design never runs.
   e. append the new sigs/bands/docs to state; rewrite ONLY the cluster-
      snapshot buckets the merge changed (bucket-wise copy-on-write,
      layout clusters/state_bucket=K/batch_id=N — the logical snapshot
      is each bucket's latest version, so a batch whose merges touch 3
      buckets writes 3 bucket versions, not the whole assignment table;
      a batch with no new merges writes nothing).
3. `compact_state()` rewrites the many small per-batch files into one
   partitioned layout (what Iceberg's rewrite_data_files maintenance
   action does) — run it on whatever cadence file counts demand.

Determinism: cluster_id = min(doc_id) of the component is preserved
inductively — old roots are component minima, new docs enter as their
own id, and a merge takes the min of the merged roots.

Watermarks/late data: dedup state is keyed by content, not event time —
a "late" page is just a new page; no watermark needed. Exactly-once:
batch_id-keyed append directories make retried batches idempotent, and
a batch's cluster snapshot is derived from snapshots with batch_id
strictly below its own, so a retry rebuilds the identical snapshot.
"""

from __future__ import annotations

import os
import shutil

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
        self,
        spark: SparkSession,
        state_dir: str,
        config: DedupConfig | None = None,
        n_state_buckets: int = 64,
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.config = config or DedupConfig()
        self.n_state_buckets = n_state_buckets
        os.makedirs(state_dir, exist_ok=True)

    # ---------------- state layout ----------------

    def _path(self, name: str) -> str:
        return os.path.join(self.state_dir, name)

    def _band_bucket(self):
        # band_hash is band-index-salted (explode_bands) — it IS the full
        # (band, value) key, so it alone drives state bucketing
        return F.pmod(
            F.xxhash64("band_hash"), F.lit(self.n_state_buckets)
        ).cast("int")

    def _doc_bucket(self, col: str = "doc_id"):
        return F.pmod(F.xxhash64(col), F.lit(self.n_state_buckets)).cast("int")

    def _read_state(
        self, name: str, buckets: list[int] | None = None
    ) -> DataFrame | None:
        """Read a state table; `buckets` prunes to the named hash-bucket
        partitions (hive partition filter → only those directories are
        listed and scanned)."""
        path = self._path(name)
        try:
            df = self.spark.read.parquet(path)
        except Exception:
            return None
        if buckets is not None and "state_bucket" in df.columns:
            df = df.where(F.col("state_bucket").isin([int(b) for b in buckets]))
        # batch_id / state_bucket are physical partition columns of the
        # state layout, not part of the logical schema
        return df.drop("batch_id", "state_bucket")

    def _append(
        self, name: str, df: DataFrame, batch_id: int, bucket_col=None
    ) -> None:
        # batch_id-keyed subdir → idempotent on micro-batch retry;
        # state_bucket sub-partitioning → probe-time pruning
        path = os.path.join(self._path(name), f"batch_id={batch_id}")
        if bucket_col is not None:
            df.withColumn("state_bucket", bucket_col).write.mode(
                "overwrite"
            ).partitionBy("state_bucket").parquet(path)
        else:
            df.write.mode("overwrite").parquet(path)

    def compact_state(
        self,
        names: tuple[str, ...] = ("bands", "sigs", "docs", "edges", "clusters"),
    ) -> None:
        """Rewrite each state table's many small per-batch files into one
        consolidated batch (`batch_id=-1`), preserving the bucket
        partitioning. The Iceberg analog is the rewrite_data_files
        maintenance action; here it is read → rewrite → atomic-ish swap.
        Snapshot-read semantics make this safe between batches. The
        clusters snapshot compacts bucket-wise (compact_clusters):
        each bucket keeps only its latest version."""
        for name in names:
            if name == "clusters":
                self.compact_clusters()
                continue
            path = self._path(name)
            try:
                df = self.spark.read.parquet(path)
            except Exception:
                continue
            tmp = path + "__compacting"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            out = os.path.join(tmp, "batch_id=-1")
            if "state_bucket" in df.columns:
                df.drop("batch_id").write.partitionBy("state_bucket").parquet(out)
            else:
                df.drop("batch_id").write.parquet(out)
            shutil.rmtree(path)
            os.rename(tmp, path)

    # ---------------- clusters snapshot ----------------
    #
    # The snapshot is BUCKET-WISE COPY-ON-WRITE: layout
    # clusters/state_bucket=K/batch_id=N/ where each bucket dir holds
    # versioned full copies of ONLY that doc-hash bucket's rows, and the
    # logical snapshot is "each bucket's highest batch_id". A micro-batch
    # rewrites only the buckets its merge actually changes — at a crawl's
    # steady state (small batch, huge corpus) that is a handful of
    # buckets, not the whole assignment table (the Iceberg analog is a
    # partition-granular copy-on-write MERGE). Older bucket versions stay
    # until compact_state() collapses them (retry of batch N derives from
    # versions strictly below N).

    def _snapshot_bucket_paths(
        self, below_batch: int | None = None, buckets: list[int] | None = None
    ) -> list[str]:
        root = self._path("clusters")
        if not os.path.isdir(root):
            return []
        want = None if buckets is None else {int(b) for b in buckets}
        paths = []
        for d in sorted(os.listdir(root)):
            if not d.startswith("state_bucket="):
                continue
            k = int(d.split("=", 1)[1])
            if want is not None and k not in want:
                continue
            ids = [
                int(b.split("=", 1)[1])
                for b in os.listdir(os.path.join(root, d))
                if b.startswith("batch_id=")
            ]
            ids = [i for i in ids if below_batch is None or i < below_batch]
            if ids:
                paths.append(os.path.join(root, d, f"batch_id={max(ids)}"))
        return paths

    def _latest_snapshot(
        self, below_batch: int | None = None, buckets: list[int] | None = None
    ):
        """(doc_id, cluster_id) assignments | None — the union of each
        bucket's latest version, optionally restricted to versions
        strictly below `below_batch` (retry idempotence: batch N derives
        from state before N) and/or to the named doc-hash `buckets`
        (probe-time pruning: the root lookup for a batch's edges only
        needs the endpoints' buckets)."""
        paths = self._snapshot_bucket_paths(below_batch, buckets)
        if not paths:
            return None
        return self.spark.read.parquet(*paths).select("doc_id", "cluster_id")

    def _write_snapshot_buckets(self, df: DataFrame, batch_id: int) -> None:
        """Write (doc_id, cluster_id) rows as new versions of exactly the
        buckets they hash into: one partitioned Spark write to a staging
        dir, then per-bucket directory moves into the versioned layout."""
        root = self._path("clusters")
        staging = self._path(f"clusters__staging_{batch_id}")
        if os.path.exists(staging):
            shutil.rmtree(staging)
        df.withColumn("state_bucket", self._doc_bucket()).write.partitionBy(
            "state_bucket"
        ).parquet(staging)
        for d in os.listdir(staging):
            if not d.startswith("state_bucket="):
                continue
            target_parent = os.path.join(root, d)
            os.makedirs(target_parent, exist_ok=True)
            target = os.path.join(target_parent, f"batch_id={batch_id}")
            if os.path.exists(target):  # micro-batch retry
                shutil.rmtree(target)
            os.rename(os.path.join(staging, d), target)
        shutil.rmtree(staging)

    def _write_snapshot(self, df: DataFrame, batch_id: int) -> None:
        """Full-snapshot write (bootstrap / tests): every row's bucket
        gets a version at batch_id."""
        self._write_snapshot_buckets(df, batch_id)

    def compact_clusters(self) -> None:
        """Collapse each snapshot bucket to a single batch_id=-1 version
        (its current latest). Run between batches, like compact_state:
        a later retry of an already-folded batch re-derives the identical
        snapshot because merges are idempotent (re-contracting an edge
        through roots that already reflect it yields no remap)."""
        root = self._path("clusters")
        if not os.path.isdir(root):
            return
        latest = self._latest_snapshot()
        if latest is None:
            return
        staging = self._path("clusters__compacting")
        if os.path.exists(staging):
            shutil.rmtree(staging)
        latest.withColumn("state_bucket", self._doc_bucket()).write.partitionBy(
            "state_bucket"
        ).parquet(staging)
        shutil.rmtree(root)
        os.makedirs(root)
        for d in os.listdir(staging):
            if not d.startswith("state_bucket="):
                continue
            target_parent = os.path.join(root, d)
            os.makedirs(target_parent, exist_ok=True)
            os.rename(
                os.path.join(staging, d),
                os.path.join(target_parent, "batch_id=-1"),
            )
        shutil.rmtree(staging)

    def _merge_clusters(self, edges: DataFrame, batch_id: int) -> None:
        """Merge-only incremental CC with bucket-granular writes.
        Snapshot rows are (doc_id, cluster_id) for NON-singleton members
        only (member != root); root(x) = coalesce(lookup(x), x). New
        edges are contracted through the roots (lookup read PRUNED to
        the endpoints' buckets); same-root edges vanish; CC runs on the
        tiny remainder; and only the buckets the remap actually touches
        — buckets holding members of a remapped cluster, plus buckets
        receiving brand-new rows — are rewritten. A batch whose edges
        are all already-known writes NOTHING."""
        from hsearch_spark.operators.components import connected_components

        e = edges.select("a", "b")
        end_buckets = [
            r[0]
            for r in e.select(
                F.explode(
                    F.array(self._doc_bucket("a"), self._doc_bucket("b"))
                ).alias("db")
            )
            .distinct()
            .collect()
        ]
        lookup = self._latest_snapshot(below_batch=batch_id, buckets=end_buckets)
        if lookup is not None:
            ra = lookup.select(
                F.col("doc_id").alias("a"), F.col("cluster_id").alias("_ra")
            )
            rb = lookup.select(
                F.col("doc_id").alias("b"), F.col("cluster_id").alias("_rb")
            )
            e = (
                e.join(ra, "a", "left")
                .join(rb, "b", "left")
                .select(
                    F.coalesce("_ra", "a").alias("a"),
                    F.coalesce("_rb", "b").alias("b"),
                )
            )
        contracted = e.where(F.col("a") != F.col("b")).dropDuplicates(["a", "b"])
        remap = connected_components(contracted)  # (doc_id=old root, cluster_id=new)
        new_rows = remap.where(
            F.col("doc_id") != F.col("cluster_id")
        ).localCheckpoint()
        if new_rows.isEmpty():
            return  # every edge was already known — zero snapshot I/O
        prev = self._latest_snapshot(below_batch=batch_id)
        if prev is None:
            self._write_snapshot_buckets(new_rows, batch_id)
            return
        rm = new_rows.select(
            F.col("doc_id").alias("cluster_id"),
            F.col("cluster_id").alias("_new"),
        )
        # members of remapped clusters: a column-pruned scan of the
        # snapshot's cluster_id column (at 10^12-doc scale a persisted
        # root→bucket index would prune this too; the rewrite itself is
        # already bucket-granular)
        changed_prev = prev.join(
            F.broadcast(rm.select("cluster_id")), "cluster_id", "left_semi"
        )
        touched = [
            r[0]
            for r in changed_prev.select(self._doc_bucket().alias("db"))
            .union(new_rows.select(self._doc_bucket().alias("db")))
            .distinct()
            .collect()
        ]
        in_touched = self._latest_snapshot(below_batch=batch_id, buckets=touched)
        if in_touched is None:  # new rows land only in never-written buckets
            content = new_rows
        else:
            updated = in_touched.join(F.broadcast(rm), "cluster_id", "left").select(
                "doc_id",
                F.coalesce("_new", "cluster_id").alias("cluster_id"),
            )
            content = updated.unionByName(new_rows).dropDuplicates(["doc_id"])
        self._write_snapshot_buckets(content, batch_id)

    # ---------------- the micro-batch body ----------------

    def process_batch(self, new_pages: DataFrame, batch_id: int) -> None:
        cfg = self.config
        docs = extract_pages(new_pages)
        sigs = add_signature_columns(docs, cfg).localCheckpoint()
        bands = (
            explode_bands(sigs, cfg)
            .select("doc_id", "band_hash")  # band-salted hash IS the key
            .localCheckpoint()
        )

        # within-batch candidates (new × new)
        cands = candidate_pairs(bands, cfg)

        # probe join against the indexed corpus (new × old): the small
        # new side streams against the big state side on the band key.
        # Bucket pruning first: the batch touches ≤ n_state_buckets
        # band-hash buckets; collect them (bounded driver list) and read
        # only those partitions of the state.
        touched = [
            r[0]
            for r in bands.select(self._band_bucket().alias("sb"))
            .distinct()
            .collect()
        ]
        old_bands = self._read_state("bands", buckets=touched)
        if old_bands is not None:
            probe = (
                bands.alias("n")
                .join(
                    old_bands.alias("o"),
                    on=[
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
        cands = cands.localCheckpoint()

        # verify needs sigs + texts of BOTH sides — but only for docs
        # that actually appear in candidate pairs: prune state reads to
        # the candidates' doc-hash buckets, then semi-join down to the
        # exact id set (texts never travel for untouched corpus docs).
        needed = cands.select(
            F.explode(F.array("a", "b")).alias("doc_id")
        ).distinct()
        need_buckets = [
            r[0]
            for r in needed.select(self._doc_bucket().alias("db"))
            .distinct()
            .collect()
        ]
        old_sigs = self._read_state("sigs", buckets=need_buckets)
        if old_sigs is not None:
            old_sigs = old_sigs.join(needed, "doc_id", "left_semi")
        all_sigs = sigs if old_sigs is None else sigs.unionByName(old_sigs)
        old_docs = self._read_state("docs", buckets=need_buckets)
        slim_docs = docs.select("doc_id", "text")
        if old_docs is not None:
            old_docs = old_docs.join(needed, "doc_id", "left_semi")
        all_docs = (
            slim_docs if old_docs is None else slim_docs.unionByName(old_docs)
        )
        edges = verify_pairs(cands, all_sigs, all_docs, cfg).localCheckpoint()

        self._append("edges", edges, batch_id)
        self._append("sigs", sigs, batch_id, bucket_col=self._doc_bucket())
        self._append("bands", bands, batch_id, bucket_col=self._band_bucket())
        self._append(
            "docs",
            docs.select("doc_id", "text"),
            batch_id,
            bucket_col=self._doc_bucket(),
        )
        self._merge_clusters(edges, batch_id)

    def current_clusters(self) -> DataFrame:
        """Full assignment table from the maintained snapshot — NO CC
        recompute over the cumulative edge table (merge-only CC already
        folded every batch's edges in). Singletons map to themselves."""
        sigs = self._read_state("sigs")
        if sigs is None:
            raise ValueError("no state yet")
        docs = sigs.select("doc_id")
        snap = self._latest_snapshot()
        if snap is None:
            return docs.select("doc_id", F.col("doc_id").alias("cluster_id"))
        return (
            docs.join(snap, "doc_id", "left")
            .select(
                "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
            )
        )

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

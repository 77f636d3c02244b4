"""Incremental dedup: batch-equivalence (streamed result == one-shot
batch result) and a real Structured Streaming query over a file source.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hsearch_spark.plans.pipeline import run_dedup
from hsearch_spark.sources.pages import generate_pages
from hsearch_spark.streaming.incremental import IncrementalDedup

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _halves(spark, n=200, seed=5):
    fx = generate_pages(n, seed)
    pdf = fx.pdf
    h1 = spark.createDataFrame(pdf.iloc[: n // 2], schema=SCHEMA)
    h2 = spark.createDataFrame(pdf.iloc[n // 2 :], schema=SCHEMA)
    full = spark.createDataFrame(pdf, schema=SCHEMA)
    return h1, h2, full


def test_incremental_equals_batch(spark, tmp_path):
    h1, h2, full = _halves(spark)
    inc = IncrementalDedup(spark, str(tmp_path / "state"))
    inc.process_batch(h1, 0)
    inc.process_batch(h2, 1)
    streamed = {
        r["doc_id"]: r["cluster_id"] for r in inc.current_clusters().collect()
    }
    # batch reference: full pipeline WITHOUT the substring channel
    # (incremental path indexes minhash+exact only, by design)
    batch = run_dedup(spark, full, enable_substring_channel=False)
    expected = {
        r["doc_id"]: r["cluster_id"] for r in batch.clusters.collect()
    }
    assert streamed == expected


def test_batch_retry_idempotent(spark, tmp_path):
    h1, h2, _ = _halves(spark, n=100, seed=9)
    inc = IncrementalDedup(spark, str(tmp_path / "state"))
    inc.process_batch(h1, 0)
    c1 = sorted(
        (r["doc_id"], r["cluster_id"]) for r in inc.current_clusters().collect()
    )
    inc.process_batch(h1, 0)  # simulated micro-batch retry
    c2 = sorted(
        (r["doc_id"], r["cluster_id"]) for r in inc.current_clusters().collect()
    )
    assert c1 == c2


def test_probe_reads_pruned_state_partitions(spark, tmp_path):
    """Scale guard: batch N's probe join must NOT scan the full band
    state. The state layout hash-partitions bands by state_bucket; a
    small batch touches only a few buckets, and the pruned read's scan
    must carry a state_bucket partition filter (directory-level pruning,
    the parquet analog of Iceberg partition pruning)."""
    h1, h2, _ = _halves(spark, n=100, seed=21)
    inc = IncrementalDedup(spark, str(tmp_path / "state"), n_state_buckets=64)
    inc.process_batch(h1, 0)

    # a 3-doc follow-up batch touches <= 3 * bands buckets << 64
    tiny = h2.limit(3)
    from hsearch_spark.functions.signatures import add_signature_columns, explode_bands
    from hsearch_spark.functions.text import extract_pages

    bands = explode_bands(
        add_signature_columns(extract_pages(tiny), inc.config), inc.config
    )
    touched = [
        r[0]
        for r in bands.select(inc._band_bucket().alias("sb")).distinct().collect()
    ]
    assert 0 < len(touched) < inc.n_state_buckets

    pruned = inc._read_state("bands", buckets=touched)
    jqe = pruned._jdf.queryExecution()
    plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        jqe, "formatted"
    )
    scan = next(
        block for block in plan.split("\n\n") if "PartitionFilters" in block
    )
    pf_line = next(
        ln for ln in scan.splitlines() if "PartitionFilters" in ln
    )
    assert "state_bucket" in pf_line, pf_line


def test_current_clusters_never_reads_edges(spark, tmp_path):
    """Merge-only incremental CC: the maintained snapshot IS the answer —
    current_clusters() must not re-run connected components over the
    cumulative edge table (the O(corpus)-per-call anti-pattern). Assert
    the query reads no file from the edges state."""
    h1, h2, _ = _halves(spark, n=100, seed=23)
    inc = IncrementalDedup(spark, str(tmp_path / "state"))
    inc.process_batch(h1, 0)
    inc.process_batch(h2, 1)
    files = inc.current_clusters().inputFiles()
    assert files, "expected a file-backed plan"
    assert not any("/edges/" in f for f in files), files


def test_merge_only_cc_contracts_known_edges(spark, tmp_path):
    """An edge between two docs already sharing a root must vanish in
    contraction (no snapshot rewrite); a genuinely new edge merges."""
    inc = IncrementalDedup(spark, str(tmp_path / "state"))
    snap = spark.createDataFrame(
        [(2, 1), (3, 1)], "doc_id long, cluster_id long"
    )
    inc._write_snapshot(snap, 0)

    edges = spark.createDataFrame(
        [(2, 3), (4, 5)], "a long, b long"
    )
    inc._merge_clusters(edges, 1)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in inc._latest_snapshot().collect()
    }
    # 2,3 untouched (edge contracted away); 5 newly merged under root 4
    assert got == {2: 1, 3: 1, 5: 4}


def test_compact_state_preserves_results(spark, tmp_path):
    """Compaction rewrites many small per-batch files into one batch dir
    while keeping the bucket partitioning and every downstream answer."""
    import glob

    h1, h2, _ = _halves(spark, n=100, seed=25)
    inc = IncrementalDedup(spark, str(tmp_path / "state"))
    inc.process_batch(h1, 0)
    inc.process_batch(h2, 1)
    before = sorted(
        (r["doc_id"], r["cluster_id"]) for r in inc.current_clusters().collect()
    )
    n_files_before = len(
        glob.glob(str(tmp_path / "state" / "bands" / "**" / "*.parquet"),
                  recursive=True)
    )
    inc.compact_state()
    n_files_after = len(
        glob.glob(str(tmp_path / "state" / "bands" / "**" / "*.parquet"),
                  recursive=True)
    )
    assert n_files_after <= n_files_before
    dirs = {
        d.name
        for d in (tmp_path / "state" / "bands").iterdir()
        if d.name.startswith("batch_id=")
    }
    assert dirs == {"batch_id=-1"}
    # clusters snapshot history is bounded too: every bucket keeps only
    # its folded batch_id=-1 version, superseded per-batch versions gone
    clusters_root = tmp_path / "state" / "clusters"
    for bucket in clusters_root.iterdir():
        if not bucket.name.startswith("state_bucket="):
            continue
        versions = {d.name for d in bucket.iterdir()
                    if d.name.startswith("batch_id=")}
        assert versions == {"batch_id=-1"}, (bucket.name, versions)
    after = sorted(
        (r["doc_id"], r["cluster_id"]) for r in inc.current_clusters().collect()
    )
    assert after == before
    # state stays appendable post-compaction
    extra = _halves(spark, n=20, seed=27)[0]
    inc.process_batch(extra, 2)
    assert inc.current_clusters().count() == 110


def test_real_streaming_query_file_source(spark, tmp_path):
    """End-to-end readStream(parquet dir) → foreachBatch → state."""
    h1, h2, _ = _halves(spark, n=80, seed=11)
    src = tmp_path / "incoming"
    h1.coalesce(1).write.mode("append").parquet(str(src))
    h2.coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    inc = IncrementalDedup(spark, str(tmp_path / "state"))
    q = inc.start_stream(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    clusters = inc.current_clusters()
    assert clusters.count() == 80
    # duplicate families must have merged across batches: fewer clusters
    # than docs
    assert clusters.select("cluster_id").distinct().count() < 80


def test_snapshot_rewrites_only_touched_buckets(spark, tmp_path):
    """Bucket-wise copy-on-write: a micro-batch whose merges touch a few
    doc-hash buckets must version ONLY those buckets — every other
    bucket's latest version stays at the earlier batch_id (no whole-
    snapshot rewrite), and a batch with no new merges writes nothing."""
    import os

    h1, h2, _ = _halves(spark, n=200, seed=31)
    inc = IncrementalDedup(spark, str(tmp_path / "state"))
    inc.process_batch(h1, 0)
    root = tmp_path / "state" / "clusters"
    buckets_b0 = {
        d.name: sorted(os.listdir(root / d.name))
        for d in root.iterdir()
        if d.name.startswith("state_bucket=")
    }
    assert buckets_b0, "batch 0 must create snapshot buckets"

    # batch 1: new docs (disjoint families) merge among themselves — the
    # rewrite must be confined to the new rows' buckets
    inc.process_batch(h2, 1)
    buckets_b1 = {
        d.name: sorted(os.listdir(root / d.name))
        for d in root.iterdir()
        if d.name.startswith("state_bucket=")
    }
    rewritten = {
        k for k, v in buckets_b1.items() if "batch_id=1" in v
    }
    untouched_survivors = {
        k for k, v in buckets_b1.items()
        if k in buckets_b0 and "batch_id=1" not in v
    }
    assert rewritten, "batch 1 merges must version some buckets"
    assert untouched_survivors, (
        "a disjoint batch must leave some batch-0 buckets unversioned "
        f"(rewritten={len(rewritten)}, total={len(buckets_b1)})"
    )

    # batch 2 replays batch 1's pages under a NEW batch id: every edge is
    # already known → contraction empties the remap → zero snapshot I/O
    inc.process_batch(h2, 2)
    buckets_b2 = {
        d.name: sorted(os.listdir(root / d.name))
        for d in root.iterdir()
        if d.name.startswith("state_bucket=")
    }
    assert buckets_b2 == buckets_b1, "known-edge batch must write nothing"

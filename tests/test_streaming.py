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

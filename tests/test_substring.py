"""Substring-dedup stage: planted shared spans found, boilerplate DF cap,
repeated-window counter vs plain python oracle.
"""

from __future__ import annotations

from hsearch_spark.config import DedupConfig
from hsearch_spark.functions.signatures import add_signature_columns
from hsearch_spark.operators.substring import repeated_window_counts, substring_edges

CFG = DedupConfig()


def _sigs(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return add_signature_columns(docs, CFG)


def test_planted_span_detected(spark):
    span = "this long shared span of copied text appears inside both documents verbatim " * 4
    texts = [
        "unique preamble alpha beta gamma " * 6 + span + "tail one",
        "different opening content entirely " * 6 + span + "other tail",
        "no shared content at all in this one " * 12,
    ]
    got = substring_edges(_sigs(spark, texts), CFG).collect()
    assert {(r["a"], r["b"]) for r in got} == {(0, 1)}


def test_boilerplate_df_cap_drops_hot_anchor(spark):
    cfg = DedupConfig(anchor_df_max=3)
    boiler = "site wide navigation header shared across every page of the site " * 5
    texts = [boiler + f"unique body content {i} " * 20 for i in range(8)]
    got = substring_edges(_sigs(spark, texts), cfg).collect()
    assert got == []  # boilerplate anchor df=8 > 3 → no edges


def test_repeated_window_counts_oracle(spark):
    texts = ["abcdefghij" * 3, "abcdefghij" * 3, "zzzzzzzzzzyyyyyyyyyy"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["win"]: r["n_occurrences"]
        for r in repeated_window_counts(docs, window=10, stride=10).collect()
    }
    assert got["abcdefghij"] == 6
    assert got["zzzzzzzzzz"] == 1

"""Cogroup-vs-join equality for the verify stage.

The doc-once cogroup plan (operators/verify._cogroup_pair_payload) must
produce byte-identical survivor sets and values to the join-join plan it
replaces on the hot path — these tests pin that equality at both verify
levels (signature estimate, exact jaccard) and end-to-end through
verify_pairs. Reference parity: the two-level verify gate,
kmer_search.cpp:100-112.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hsearch_spark.config import DedupConfig
from hsearch_spark.functions.signatures import add_signature_columns, explode_bands
from hsearch_spark.functions.text import extract_pages
from hsearch_spark.operators.candidates import candidate_pairs
from hsearch_spark.operators.verify import (
    exact_jaccard_pairs,
    exact_jaccard_pairs_cogrouped,
    minhash_estimate,
    minhash_estimate_cogrouped,
    verify_pairs,
)
from hsearch_spark.sources.pages import pages_dataframe


def _fixture(spark, n_docs=250, seed=17):
    config = DedupConfig()
    pages, _ = pages_dataframe(spark, n_docs=n_docs, seed=seed)
    docs = extract_pages(pages).localCheckpoint()
    sigs = add_signature_columns(docs, config).localCheckpoint()
    cands = candidate_pairs(explode_bands(sigs, config), config).localCheckpoint()
    return config, docs, sigs, cands


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_minhash_estimate_cogrouped_equals_join(spark):
    _, _, sigs, cands = _fixture(spark)
    join_rows = _rows(minhash_estimate(cands, sigs), ["a", "b", "jaccard_est"])
    cog_rows = _rows(
        minhash_estimate_cogrouped(cands, sigs, num_parts=16),
        ["a", "b", "jaccard_est"],
    )
    assert len(join_rows) > 0
    assert cog_rows == join_rows  # exact float equality: same kernel op


def test_exact_jaccard_cogrouped_equals_join(spark):
    config, docs, _, cands = _fixture(spark)
    join_rows = _rows(exact_jaccard_pairs(cands, docs, config), ["a", "b", "jaccard"])
    cog_rows = _rows(
        exact_jaccard_pairs_cogrouped(cands, docs, config, num_parts=16),
        ["a", "b", "jaccard"],
    )
    assert len(join_rows) > 0
    assert cog_rows == join_rows


def test_verify_pairs_cogroup_and_join_plans_identical(spark):
    import dataclasses

    config, docs, sigs, cands = _fixture(spark)
    n = cands.count()
    cog_config = dataclasses.replace(config, verify_plan="cogroup")
    assert 0 < n <= config.verify_cogroup_max_pairs
    cog = verify_pairs(cands, sigs, docs, cog_config, pair_rows=n)
    join = verify_pairs(cands, sigs, docs, config, pair_rows=n)
    cols = ["a", "b", "jaccard", "method"]
    assert _rows(cog, cols) == _rows(join, cols)
    assert cog.count() > 0


def test_cogroup_drops_pairs_with_missing_payload(spark):
    """Inner-join semantics: a pair whose doc has no payload row is
    dropped by the cogroup kernel exactly as the join plan drops it."""
    config, docs, sigs, cands = _fixture(spark, n_docs=120, seed=5)
    some = [r.a for r in cands.select("a").distinct().limit(3).collect()]
    docs_holey = docs.where(~F.col("doc_id").isin(some))
    sigs_holey = sigs.where(~F.col("doc_id").isin(some))
    join_rows = _rows(
        exact_jaccard_pairs(cands, docs_holey, config), ["a", "b", "jaccard"]
    )
    cog_rows = _rows(
        exact_jaccard_pairs_cogrouped(cands, docs_holey, config, num_parts=8),
        ["a", "b", "jaccard"],
    )
    assert cog_rows == join_rows
    est_join = _rows(minhash_estimate(cands, sigs_holey), ["a", "b", "jaccard_est"])
    est_cog = _rows(
        minhash_estimate_cogrouped(cands, sigs_holey, num_parts=8),
        ["a", "b", "jaccard_est"],
    )
    assert est_cog == est_join

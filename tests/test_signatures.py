"""Signature UDF output == pure-numpy oracle (same functions, but proves
the Arrow round-trip and batching don't perturb anything), plus band
explosion shape.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hsearch_spark.config import DedupConfig
from hsearch_spark.functions import hashing as H
from hsearch_spark.functions.signatures import add_signature_columns, explode_bands

CFG = DedupConfig()


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_signature_udf_matches_numpy_oracle(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog and keeps running",
        "completely different content about rivers and mountains here",
        "",  # empty edge case
        "short",
        "the quick brown fox jumps over the lazy dog and keeps running",  # dup of 0
    ]
    sigs = {
        r["doc_id"]: r
        for r in add_signature_columns(_docs(spark, texts), CFG).collect()
    }
    salt = CFG.minhash_salt()
    for i, t in enumerate(texts):
        sh = H.shingle_hashes(t, CFG.shingle_k)
        assert bytes(sigs[i]["sig"]) == H.minhash_signature_packed(
            sh, CFG.num_perm, salt
        )
        assert np.array_equal(
            np.frombuffer(bytes(sigs[i]["sig"]), dtype=np.uint32),
            H.minhash_signature(sh, CFG.num_perm, salt),
        )
        assert sigs[i]["simhash"] == H.simhash64(sh)
        assert sigs[i]["n_shingles"] == sh.shape[0]
    # identical text → identical signature
    assert list(sigs[0]["sig"]) == list(sigs[4]["sig"])
    assert sigs[0]["simhash"] == sigs[4]["simhash"]


def test_signatures_partitioning_invariant(spark):
    texts = [f"document number {i} " + "filler words here " * (i % 7 + 3) for i in range(50)]
    d = _docs(spark, texts)
    s1 = {r["doc_id"]: list(r["sig"]) for r in add_signature_columns(d, CFG).collect()}
    s2 = {
        r["doc_id"]: list(r["sig"])
        for r in add_signature_columns(d.repartition(13), CFG).collect()
    }
    assert s1 == s2


def test_explode_bands_shape_and_semantics(spark):
    # docs 0 and 2 identical, doc 1 unrelated: identical signatures must
    # agree on every band key; unrelated ones on none (w.h.p.). Texts are
    # long enough (shingles ≫ num_perm bins) that OPH densification never
    # triggers — tiny docs with a few shared shingles CAN share a
    # densified band (they become candidates and exact-verify rejects
    # them; cheapness, not correctness).
    texts = [
        "a reasonably long text for banding purposes with many words " * 30,
        "zq zx qv jk wy fb gh pm dn rs tl cu ei oa different corpus " * 30,
        "a reasonably long text for banding purposes with many words " * 30,
    ]
    sigs = add_signature_columns(_docs(spark, texts), CFG)
    rows = explode_bands(sigs, CFG).collect()
    assert len(rows) == len(texts) * CFG.bands
    by_doc = {
        d: {r["band_id"]: r["band_hash"] for r in rows if r["doc_id"] == d}
        for d in range(3)
    }
    assert sorted(by_doc[0]) == list(range(CFG.bands))  # all band ids present
    assert by_doc[0] == by_doc[2]
    assert all(by_doc[0][i] != by_doc[1][i] for i in range(CFG.bands))
    # band keys are salted by band_id: same slice value in different bands
    # must not collide into the same bucket key space
    assert len({h for h in by_doc[0].values()}) == CFG.bands

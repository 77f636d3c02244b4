"""Substring-dedup stage: planted shared spans found, boilerplate DF cap,
repeated-window counter vs plain python oracle.
"""

from __future__ import annotations

from hsearch_spark.config import DedupConfig
from hsearch_spark.functions.signatures import add_signature_columns
from hsearch_spark.operators.substring import (
    repeated_window_counts,
    seed_suffix_pairs,
    substring_edges,
)

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


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_seed_suffix_pairs_shared_span(spark):
    """J3 equi-key join: docs sharing a long span pair up; the pair
    count reflects multiple strided (seed, suffix) agreements."""
    span = "the quick brown fox jumps over the lazy dog again and again " * 4
    texts = [
        "doc one unique head " + span + " doc one tail",
        "completely different head here " + span + " other tail",
        "nothing shared in this third document at all whatsoever " * 6,
    ]
    got = seed_suffix_pairs(_docs_df(spark, texts)).collect()
    assert {(r["a"], r["b"]) for r in got} == {(0, 1)}
    assert all(r["n_common_seeds"] >= 2 for r in got)


def test_seed_suffix_narrowing_prunes_diverging_suffix(spark):
    """The reference's range-narrowing semantics: sharing the SEED
    alone is not enough — the next suffix_len chars must match too
    (hash_search.cpp lower/upper_bound on compressed suffixes). Two
    docs that repeat the same 16-char seed but always diverge in the
    following 4 chars must NOT pair."""
    # 24-char blocks = 16-char shared seed + 8 diverging chars: every
    # 20-char window spans >= 4 filler chars, so full-window equality
    # never holds across docs, while windows starting at a seed run
    # share the 16-char seed exactly — the seed-only join would pair
    # these docs; the (seed, suffix) key must not
    seed = "abcdefghijklmnop"  # 16 chars
    texts = [
        (seed + "11111111") * 10,
        (seed + "22222222") * 10,
    ]
    got = seed_suffix_pairs(_docs_df(spark, texts)).collect()
    assert got == []


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


def test_anchor_span_extension_reports_maximal_span(spark):
    """V2 oracle: a planted shared span is recovered with its FULL
    length and correct byte offsets by ungapped extension from one
    shared anchor, whatever each document's offset phase."""
    from hsearch_spark.operators.substring import anchor_span_edges

    span = (
        "this long shared span of copied text appears inside both "
        "documents verbatim " * 4
    )  # 308 chars, > min_span=200
    # flanks end/begin with DIFFERENT bytes so the planted span is the
    # exact maximal ungapped match (a shared trailing space would
    # legitimately widen the span by one)
    head_a = "unique preamble alpha beta gamma " * 6 + "Q"
    head_b = "different opening content entirely xx " * 6 + "Z"
    texts = [
        head_a + span + "tail one",
        head_b + span + "other tail",
        "no shared content at all in this one " * 12,
    ]
    got = anchor_span_edges(_docs_df(spark, texts), CFG).collect()
    assert {(r["a"], r["b"]) for r in got} == {(0, 1)}
    (r,) = got
    # extension is maximal: exactly the planted span (the flanks differ
    # at the very first byte on each side, so no accidental widening)
    assert r["span_len"] == len(span)
    assert r["a_start"] == len(head_a)
    assert r["b_start"] == len(head_b)


def test_anchor_span_extension_spans_to_text_edges(spark):
    """Extension clamps correctly when the shared span touches the
    start of one text and the end of the other (boundary arithmetic)."""
    from hsearch_spark.operators.substring import anchor_span_edges

    # non-periodic span: a repeated literal has only period-many distinct
    # windows (~period/anchor_mod anchors), which can undershoot the
    # anchor_min_common gate; numbered segments keep every window unique
    span = "".join(
        f"shared copied region segment {i} of text verbatim " for i in range(8)
    )
    texts = [
        span + "unique tail material for document zero " * 4,
        "unique head material for document one " * 4 + span,
    ]
    got = anchor_span_edges(_docs_df(spark, texts), CFG).collect()
    assert {(r["a"], r["b"]) for r in got} == {(0, 1)}
    (r,) = got
    assert r["span_len"] == len(span)
    assert r["a_start"] == 0
    assert r["b_start"] == len(texts[1]) - len(span)


def test_anchor_span_extension_survives_pre_span_repeat(spark):
    """Repeated-boilerplate failure mode (web text): a chunk of the
    shared span's content ALSO occurs before the span in one document.
    First-occurrence-only seeding would pair non-corresponding offsets
    (the pre-span repeat in doc 0 vs the in-span occurrence in doc 1),
    collapse the extension, and silently drop or shrink the pair. The
    multi-seed extension must still recover the FULL planted span at
    the correct offsets."""
    from hsearch_spark.operators.substring import anchor_span_edges

    span = (
        "this long shared span of copied text appears inside both "
        "documents verbatim " * 4
    )  # 308 chars > min_span=200
    # the repeat is the span's own first 120 chars, planted pre-span in
    # doc 0 only — every anchor in that prefix now has its FIRST doc-0
    # occurrence outside the true span
    repeat = span[:120]
    head_a = "unique preamble alpha beta gamma " * 3 + repeat + " filler Q"
    head_b = "different opening content entirely xx " * 6 + "Z"
    texts = [
        head_a + span + "tail one",
        head_b + span + "other tail",
        "no shared content at all in this one " * 12,
    ]
    got = anchor_span_edges(_docs_df(spark, texts), CFG).collect()
    assert {(r["a"], r["b"]) for r in got} == {(0, 1)}
    (r,) = got
    assert r["span_len"] == len(span)
    assert r["a_start"] == len(head_a)
    assert r["b_start"] == len(head_b)


def test_anchor_span_edges_accepts_precomputed_sigs(spark, monkeypatch):
    """Passing `sigs=` must skip the internal add_signature_columns call
    (pipeline context: the corpus is signatured exactly once) and yield
    the same spans as the standalone path."""
    from hsearch_spark.functions import signatures as sig_mod
    from hsearch_spark.operators.substring import anchor_span_edges

    span = (
        "this long shared span of copied text appears inside both "
        "documents verbatim " * 4
    )
    texts = [
        "unique preamble alpha beta gamma " * 6 + "Q" + span + "tail one",
        "different opening content entirely xx " * 6 + "Z" + span + "end",
    ]
    docs = _docs_df(spark, texts)
    expected = sorted(
        map(tuple, anchor_span_edges(docs, CFG).collect())
    )

    sigs = add_signature_columns(docs, CFG)

    def _boom(*a, **k):  # any re-signature is a double corpus scan
        raise AssertionError("anchor_span_edges re-signatured the corpus")

    monkeypatch.setattr(sig_mod, "add_signature_columns", _boom)
    got = sorted(
        map(tuple, anchor_span_edges(docs, CFG, sigs=sigs).collect())
    )
    assert got == expected


def test_anchor_catch_floor_at_min_span():
    """Measured span-catch probability at L = min_span stays >= 0.98
    (design 0.9964 under X ~ Bin(L-gram+1, 1/mod) >= min_common; curve
    measured in BENCH.md via tools/measure_anchor_catch.py). Pinned so a
    config or kernel change that silently degrades the substring
    channel's catch rate fails here, not in production."""
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "measure_anchor_catch.py",
    )
    spec = importlib.util.spec_from_file_location("measure_anchor_catch", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    cfg = DedupConfig()
    rates = mod.measure(pairs_per_len=200, seed=7)
    assert rates[cfg.min_span] >= 0.98
    # and the design formula itself agrees with the claim
    assert mod.design_catch(cfg.min_span, cfg) >= 0.99


def test_seed_suffix_pairs_matches_bruteforce_oracle(spark):
    """Run-kernel seed channel vs a plain-python (seed, suffix) window
    oracle — df-gate, min_common, and pair counts all exact. Pins the
    round-5 rewrite (xxhash64-folded key + shared Arrow run kernel) to
    the declarative semantics it replaced, including that a 64-bit key
    fold introduces no spurious pairs at test scale."""
    from collections import Counter

    seed_len, suffix_len, stride, min_common, df_max = 16, 4, 1, 2, 3
    span = "the quick brown fox jumps over the lazy dog once more " * 3
    boiler = "shared boilerplate navigation chrome on every page here " * 3
    texts = [
        "doc zero head " + span + " doc zero tail",
        "a different doc one heading " + span + " other tail",
        boiler + "unique body two " * 8,
        boiler + "unique body three " * 8,
        boiler + "unique body four " * 8,
        boiler + "unique body five " * 8,  # boiler df=4 > df_max=3
        "nothing shared in this last document at all " * 6,
    ]
    width = seed_len + suffix_len
    per_doc = {
        i: {
            t[s : s + width]
            for s in range(0, max(len(t) - width + 1, 0), stride)
        }
        for i, t in enumerate(texts)
    }
    df = Counter(w for s in per_doc.values() for w in s)
    counts = Counter()
    for w in {x for s in per_doc.values() for x in s}:
        if not (2 <= df[w] <= df_max):
            continue
        docs_with = sorted(i for i, s in per_doc.items() if w in s)
        for x in range(len(docs_with)):
            for y in range(x + 1, len(docs_with)):
                counts[(docs_with[x], docs_with[y])] += 1
    oracle = {p: n for p, n in counts.items() if n >= min_common}
    got = {
        (r["a"], r["b"]): r["n_common_seeds"]
        for r in seed_suffix_pairs(
            _docs_df(spark, texts),
            seed_len=seed_len,
            suffix_len=suffix_len,
            stride=stride,
            min_common=min_common,
            df_max=df_max,
        ).collect()
    }
    assert got == oracle
    assert got, "fixture must produce at least one surviving pair"
    # the boilerplate-only docs must not pair (df-gate dropped their key)
    assert all(a in (0, 1) and b in (0, 1) for (a, b) in got)


def test_substring_edges_matches_bruteforce_oracle(spark):
    """Arrow run-detection kernel vs a plain-python pair-count oracle
    over the same per-doc anchor sets (including df-gate and min_common
    semantics), on texts with shared spans, boilerplate, and noise."""
    from collections import Counter

    from hsearch_spark.functions.hashing import anchor_hashes

    cfg = DedupConfig(anchor_df_max=4, anchor_min_common=2)
    span = "a verbatim copied stretch of content that is long enough to carry anchors " * 3
    boiler = "boilerplate navigation repeated on every single page of this site " * 3
    texts = [
        boiler + span + "unique tail zero " * 10,
        boiler + "unique filler one " * 10 + span,
        boiler + "completely unrelated body two " * 14,
        boiler + "another unrelated body three " * 14,
        boiler + "yet another unrelated body four " * 14,
        span + "no boilerplate on this one " * 10,
    ]
    per_doc = {
        i: set(anchor_hashes(t, cfg.anchor_gram, cfg.anchor_mod).tolist())
        for i, t in enumerate(texts)
    }
    df = Counter(a for s in per_doc.values() for a in s)
    counts = Counter()
    for a in {x for s in per_doc.values() for x in s}:
        if not (2 <= df[a] <= cfg.anchor_df_max):
            continue
        docs_with = sorted(i for i, s in per_doc.items() if a in s)
        for x in range(len(docs_with)):
            for y in range(x + 1, len(docs_with)):
                counts[(docs_with[x], docs_with[y])] += 1
    oracle = {
        p: n for p, n in counts.items() if n >= cfg.anchor_min_common
    }
    got = {
        (r["a"], r["b"]): r["n_common_anchors"]
        for r in substring_edges(_sigs(spark, texts), cfg).collect()
    }
    assert got == oracle
    assert got, "fixture must produce at least one surviving pair"

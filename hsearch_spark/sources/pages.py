"""Deterministic synthetic `pages` corpus with planted duplicate families.

Fixture methodology mirrors the reference's: build test corpora from
labeled truth clusters, permute, and make membership recoverable from
the rows themselves (hclust/src/hclust/shuffle_kmers.cpp:13-65 names
rows `motif<i>_seq<j>`; here the url path carries the family id).

Schema = BASELINE.json input_hint exactly:
(url string, warc_ts timestamp, html binary, text string, lang string).

Families (FIXTURES.md §1):
- exact:       byte-identical text under different urls   (~10%)
- near:        1-10% token-edit copies of a family prototype (~20%)
- substring:   long shared span (≥ min_span) inside distinct docs (~10%)
- boiler:      one hot family sharing a big header/footer  (~15%) — skew
- unique:      pairwise-dissimilar negatives               (rest)

All generation is numpy-seeded; same (n_docs, seed) → byte-identical
corpus on any machine. Truth pairs/clusters are derived analytically
from the planted families (exact + near + substring are dup families;
boilerplate shares structure but NOT enough Jaccard to be a dup at
τ=0.8 — it exists to stress the skew path, not the recall gate).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_VOCAB = (
    "data spark shuffle partition cluster quality filter token stream batch "
    "window join scan merge sort hash group query row column table index key "
    "value page text corpus sample model train learn web crawl parse link "
    "site news article report story update market price trade share stock "
    "game score team player match season travel city road river mountain "
    "valley forest garden house light night morning coffee bread water glass "
    "paper letter number system network signal device screen memory engine"
).split()


@dataclass(frozen=True)
class PagesFixture:
    pdf: pd.DataFrame            # the pages table
    truth_pairs: pd.DataFrame    # (a_url, b_url, kind)
    truth_clusters: pd.DataFrame  # (url, cluster_url)


def _sentence(rng: np.random.Generator, n: int) -> str:
    return " ".join(rng.choice(_VOCAB, size=n))


def _web_sentence(rng: np.random.Generator, n: int) -> str:
    """Sentence over a ~130k-term vocabulary (base words × numeric
    suffixes), matching real web text's low background Jaccard: with a
    100-word vocab every pair of 'unique' docs shares ~30% of its char
    5-grams, so candidate volume grows O(n²) — a fixture artifact, not
    web behavior. Suffixed terms push background J under ~0.12."""
    words = rng.choice(_VOCAB, size=n)
    tags = rng.integers(0, 1000, size=n)
    use_tag = rng.random(n) < 0.7
    return " ".join(
        f"{w}{t}" if u else w for w, t, u in zip(words, tags, use_tag)
    )


def generate_pages(n_docs: int = 500, seed: int = 42) -> PagesFixture:
    rng = np.random.default_rng(seed)
    n_exact_fam = max(1, n_docs // 50)      # ~10% docs in 5-member families
    n_near_fam = max(1, n_docs // 25)       # ~20% docs in 5-member families
    n_sub_fam = max(1, n_docs // 40)        # ~10% docs in 4-member families
    n_boiler = max(4, (n_docs * 15) // 100)  # one hot family

    rows: list[dict] = []
    pairs: list[tuple[str, str, str]] = []
    clusters: list[tuple[str, str]] = []
    uid = 0

    def url(family: str, fam_i: int, member: int) -> str:
        return f"https://site{fam_i % 7}.example/{family}/f{fam_i}/p{member}"

    def add(u: str, text: str, lang: str = "en") -> None:
        nonlocal uid
        boiler = f"<header>site nav {uid % 7}</header>"
        html = f"<html><head><title>t{uid}</title></head><body>{boiler}<p>{text}</p></body></html>"
        rows.append(
            {"url": u, "_ts_off": uid, "html": html.encode(), "text": text, "lang": lang}
        )
        uid += 1

    def family_pairs(urls: list[str], kind: str) -> None:
        root = min(urls)
        for u in urls:
            clusters.append((u, root))
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                a, b = sorted((urls[i], urls[j]))
                pairs.append((a, b, kind))

    # exact families: identical text, 5 members
    for f in range(n_exact_fam):
        text = _web_sentence(rng, 120)
        urls = [url("exact", f, m) for m in range(5)]
        for u in urls:
            add(u, text)
        family_pairs(urls, "exact")

    # near families: prototype + token edits at 1-6% rate (keeps Jaccard
    # of char-5-gram sets above τ=0.8), 5 members
    for f in range(n_near_fam):
        proto = _web_sentence(rng, 150).split()
        urls = [url("near", f, m) for m in range(5)]
        for m, u in enumerate(urls):
            toks = list(proto)
            if m > 0:
                n_edit = max(1, int(len(toks) * rng.uniform(0.01, 0.04)))
                for pos in rng.choice(len(toks), size=n_edit, replace=False):
                    toks[pos] = str(rng.choice(_VOCAB))
            add(u, " ".join(toks))
        family_pairs(urls, "near")

    # substring families: shared long span (~300 chars) inside distinct docs
    for f in range(n_sub_fam):
        span = _web_sentence(rng, 55)  # ≈ 300+ chars
        urls = [url("substring", f, m) for m in range(4)]
        for u in urls:
            pre = _web_sentence(rng, 60)
            post = _web_sentence(rng, 60)
            add(u, f"{pre} {span} {post}")
        family_pairs(urls, "substring")

    # boilerplate hot family: big shared header/footer around unique bodies.
    # NOT a dup family (body dominates, Jaccard < τ) — skew stressor only.
    boiler_head = _sentence(rng, 40)
    boiler_foot = _sentence(rng, 40)
    for m in range(n_boiler):
        u = url("boiler", 0, m)
        body = _web_sentence(rng, 200)
        add(u, f"{boiler_head} {body} {boiler_foot}")

    # unique negatives
    langs = np.array(["en", "en", "en", "en", "de", "fr"])
    while uid < n_docs:
        u = url("unique", uid, 0)
        add(u, _web_sentence(rng, int(rng.integers(80, 240))), str(rng.choice(langs)))

    pdf = pd.DataFrame(rows)
    pdf["warc_ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        pdf.pop("_ts_off"), unit="s"
    )
    # deterministic shuffle (ref: shuffle_kmers.cpp:39-57, seeded here)
    pdf = pdf.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    pdf = pdf[["url", "warc_ts", "html", "text", "lang"]]

    truth_pairs = pd.DataFrame(pairs, columns=["a_url", "b_url", "kind"])
    truth_clusters = pd.DataFrame(clusters, columns=["url", "cluster_url"])
    return PagesFixture(pdf, truth_pairs, truth_clusters)


def pages_dataframe(
    spark: SparkSession, n_docs: int = 500, seed: int = 42
) -> tuple[DataFrame, PagesFixture]:
    fx = generate_pages(n_docs, seed)
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    return spark.createDataFrame(fx.pdf, schema=schema), fx

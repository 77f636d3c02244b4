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

At 100 TB the band self-join is THE shuffle: the key is band_hash — a
band-index-salted, uniformly-mixed 64-bit hash, so the shuffle itself
is balanced; only the within-bucket pair blowup needs the cap above.
AQE skew-join handles residual stragglers.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hsearch_spark.config import DedupConfig


def bucket_metrics(bands: DataFrame) -> DataFrame:
    """Bucket-size histogram — the skew diagnostic the reference computes
    under `#ifdef BUCKETSIZE` (pcluster.cpp:38-66), as a metrics table.
    Bucket identity is band_hash alone: the hash is already salted by
    band index (explode_bands), so it IS the (band, value) key."""
    sizes = bands.groupBy("band_hash").agg(
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
    input_rows: int | None = None,
) -> DataFrame:
    """Generic within-bucket pairing: df(doc_id, *key_cols) -> (a, b).

    Buckets up to max_bucket_all_pairs emit exact all-pairs C(n,2) from
    a sorted doc_id array via nested array transforms (pure Column
    expressions, codegen'd). Buckets over that emit the star-R pairing
    (every member pairs with the R smallest ids) — connectivity-
    preserving, O(n·R) output. `max_bucket` drops larger buckets
    entirely (boilerplate semantics, substring.py).

    Memory is HARD-BOUNDED per bucket regardless of bucket size: the
    aggregation only ever sees the `keep_limit` smallest doc_ids of each
    bucket (a rank-limit window — Spark pushes `row_number() <= const`
    down as WindowGroupLimit, so each task keeps a bounded heap per key
    *before* the shuffle, and the post-shuffle sort is external/spill-
    able). A 10^8-member boilerplate bucket therefore aggregates a
    ≤ keep_limit-element array, not a multi-GB one.

    Hot buckets (> max_bucket_all_pairs members) still connect EVERY
    member: the star-R pairing is produced by BROADCAST-joining the R
    smallest ids of each hot bucket (reps — a few rows per hot bucket,
    tiny by construction) back against the original input — no second
    shuffle of the big table, no row of the big side ever held in an
    array. Output is O(n·R) per hot bucket, connectivity-preserving,
    drops nothing. Shuffle budget: ONE exchange for the rank-limit
    window (+ the groupBy reuses its partitioning) and ONE for the
    cross-band pair dedup — same as the unbounded collect_list plan
    this replaces. The input is scanned twice (window branch + star
    branch); both scans are column-pruned and the in-pipeline input is
    a cheap explode of checkpointed signatures.
    """
    cap = config.max_bucket_all_pairs
    r = config.star_representatives
    keep_limit = max(cap, r, max_bucket or 0) + 1
    # canonical single long key: every production channel already keys on
    # one 64-bit hash column (band_hash / combo_key / bucket); a legacy
    # multi-column key is folded with xxhash64 — a cross-bucket collision
    # merely co-buckets two groups, adding candidates the verify gate
    # re-checks (never losing any), same argument as the band_hash keying
    key = key_cols[0] if len(key_cols) == 1 else "_bk"
    if len(key_cols) == 1:
        base = df.select(key_cols[0], "doc_id")
    else:
        base = df.select(
            F.xxhash64(*key_cols).alias("_bk"), "doc_id"
        )
    w = Window.partitionBy(key).orderBy("doc_id")
    kept = base.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= keep_limit
    )

    # ONE vectorized Arrow pass over the window's output replaces
    # [groupBy + collect_list arrays + higher-order pair explode +
    # second scan for the hot branch]: the per-group JVM machinery paid
    # ~60 µs per bucket over an almost-all-singleton key space — 535
    # executor-CPU-s at 400k docs / 8.4M band rows, the pipeline's
    # single largest CPU sink after the substring rewrite (event-log
    # task metrics, BENCH.md round 4). The kernel consumes rows ALREADY
    # sorted by (key, doc_id) — WindowExec's required sort order, which
    # mapInArrow preserves — so run detection is one boundary scan, no
    # sort (a vectorized order check guards the assumption and falls
    # back to lexsort if a future plan change breaks it). Per-bucket
    # state stays HARD-BOUNDED exactly as before: WindowGroupLimit caps
    # each bucket at keep_limit rows pre-shuffle, so a 10^8-member
    # boilerplate bucket reaches the kernel as ≤ keep_limit rows.
    # Output is a mixed table: all-pairs rows (a, b, key=null) for
    # buckets ≤ cap, representative rows (a=rep, b=null, key) for hot
    # buckets — the hot branch still BROADCAST-joins reps against the
    # full input, connecting every member without re-shuffling it.
    import numpy as np
    import pyarrow as pa

    def runs_mixed(batches):
        ks, ds = [], []
        for batch in batches:
            ks.append(batch.column(0).to_numpy(zero_copy_only=False))
            ds.append(batch.column(1).to_numpy(zero_copy_only=False))
        out_a, out_b, out_k = [], [], []
        if ks:
            k = np.concatenate(ks)
            d = np.concatenate(ds)
            if k.size:
                brk = k[1:] != k[:-1]
                if not np.all(brk | (d[1:] > d[:-1])):
                    # defensive: input no longer (key, doc_id)-sorted
                    order = np.lexsort((d, k))
                    k, d = k[order], d[order]
                    brk = k[1:] != k[:-1]
                new = np.empty(k.size, dtype=bool)
                new[0] = True
                new[1:] = brk
                starts = np.flatnonzero(new)
                lens = np.diff(np.append(starts, k.size))
                if max_bucket is not None:
                    # truncated buckets (len == keep_limit) exceed
                    # max_bucket by construction (keep_limit > max_bucket)
                    keep = lens <= max_bucket
                    starts, lens = starts[keep], lens[keep]
                # small buckets → exact all-pairs, grouped by run length
                hi = min(cap, int(lens.max()) if lens.size else 0)
                for length in range(2, hi + 1):
                    sel = starts[lens == length]
                    if sel.size == 0:
                        continue
                    ii, jj = np.triu_indices(length, 1)
                    out_a.append(d[(sel[:, None] + ii[None, :]).ravel()])
                    out_b.append(d[(sel[:, None] + jj[None, :]).ravel()])
                    out_k.append(np.full(sel.size * ii.size, 0, np.int64))
                n_pairs = sum(x.size for x in out_a)
                pair_valid = n_pairs
                # hot buckets → min(r, len) smallest ids as reps
                hsel = starts[lens > cap]
                hlen = lens[lens > cap]
                if hsel.size:
                    rr = min(r, keep_limit)
                    cols = np.arange(rr)
                    idx = hsel[:, None] + cols[None, :]
                    mask = cols[None, :] < np.minimum(hlen, rr)[:, None]
                    out_a.append(d[idx[mask]])
                    out_b.append(np.zeros(int(mask.sum()), np.int64))
                    out_k.append(k[idx[mask]])
                # null masks: pairs have null key, reps have null b
                a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
                b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
                kk = np.concatenate(out_k) if out_k else np.empty(0, np.int64)
                valid_b = np.zeros(a.size, dtype=bool)
                valid_b[:pair_valid] = True
                # bounded output batches (~64k rows) instead of one
                # partition-sized RecordBatch: at extreme key
                # cardinalities a single batch could approach Arrow's
                # per-array bound; slicing costs nothing (zero-copy
                # views) and keeps downstream consumers' memory flat
                if a.size:
                    chunk = 1 << 16
                    for off in range(0, a.size, chunk):
                        sl = slice(off, off + chunk)
                        yield pa.RecordBatch.from_arrays(
                            [
                                pa.array(a[sl], type=pa.int64()),
                                pa.array(b[sl], type=pa.int64(),
                                         mask=~valid_b[sl]),
                                pa.array(kk[sl], type=pa.int64(),
                                         mask=valid_b[sl]),
                            ],
                            names=["a", "b", key],
                        )
                    return
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.empty(0, np.int64), type=pa.int64()),
                pa.array(np.empty(0, np.int64), type=pa.int64()),
                pa.array(np.empty(0, np.int64), type=pa.int64()),
            ],
            names=["a", "b", key],
        )

    mixed = kept.select(key, "doc_id").mapInArrow(
        runs_mixed, f"a long, b long, {key} long"
    )
    # Both the pairs branch and the hot-reps branch consume `mixed`;
    # persist it so the window + kernel run ONCE (one InMemoryRelation
    # for both consumers). `mixed` is bounded: ≤ C(cap, 2) pair rows per
    # small bucket + ≤ R rep rows per hot bucket. Lineage is preserved
    # (fault-tolerant), unlike localCheckpoint; bounded_persist evicts
    # caches from prior calls at this site (streaming runs this once per
    # micro-batch).
    from hsearch_spark.utils import bounded_persist

    mixed = bounded_persist(mixed, "candidates.bucket_pairs_grouped")
    small_pairs = mixed.where(F.col(key).isNull()).select("a", "b")
    reps = mixed.where(F.col(key).isNotNull()).select(key, "a")
    # hot buckets: R smallest ids are the representatives; broadcast
    # them back against the FULL membership so every member gets an edge
    # without re-shuffling the big side. The broadcast hint is honored
    # unconditionally (NOT auto-dropped at size), so it is GUARDED — a
    # corpus whose reps exceed config.max_broadcast_reps (adversarial
    # simhash combo keys fanning out hot buckets) degrades to a plain
    # shuffle join instead of failing on driver/broadcast memory. The
    # guard is TIERED so the common case costs zero extra jobs:
    # 1. proven bound — every hot bucket holds > cap members, so
    #    #hot <= input_rows/(cap+1) and reps rows <= R*that. Callers
    #    know input_rows exactly and for free (bands = b × #sigs,
    #    simhash combos = C(blocks, blocks-h) × #sigs, LSH keys =
    #    n_tables × #vectors); when the bound clears the limit the
    #    broadcast is safe with NO runtime action.
    # 2. exact count — only when the bound can't clear (10^9+-row
    #    corpora, where one extra job is noise against the pipeline):
    #    count rep rows on the already-persisted bounded `mixed`.
    # The decision is physical only — emitted pairs are identical on
    # both paths (pinned by test_broadcast_guard_fallback_same_pairs);
    # per-bucket memory bounds hold either way.
    bound = None if input_rows is None else r * (input_rows // (cap + 1))
    if bound is not None and bound <= config.max_broadcast_reps:
        broadcast_safe = True
    else:
        broadcast_safe = reps.count() <= config.max_broadcast_reps
    if broadcast_safe:
        reps = F.broadcast(reps)
    large_pairs = (
        base.join(reps, key)
        .where(F.col("a") < F.col("doc_id"))
        .select("a", F.col("doc_id").alias("b"))
    )
    return small_pairs.union(large_pairs).dropDuplicates(["a", "b"])


def candidate_pairs(
    bands: DataFrame, config: DedupConfig, input_rows: int | None = None
) -> DataFrame:
    """bands(doc_id, band_hash, ...) -> pairs(a, b), a < b, distinct.

    Pair dedup across bands (ref: test-once labels,
    motif_both_points.cpp:222-243) = dropDuplicates BEFORE the expensive
    verify stage — dedup-then-verify, not verify-then-dedup.
    `input_rows` (= config.bands × #docs, when the caller knows #docs)
    lets the broadcast guard prove safety without a runtime count.

    The shuffle key is band_hash ALONE: explode_bands salts each band's
    hash with its band index, so band_hash already encodes (band, value)
    and shipping a separate band_id column through the pipeline's
    largest exchange would be pure overhead (UnsafeRow 32 → 24 bytes,
    −25% on this shuffle). A cross-band 64-bit collision (≈ (b·n)²/2⁶⁵
    expected — ~10⁷ at 10¹² docs, zero at sandbox scale) merely co-
    buckets unrelated docs, adding candidate pairs the exact-verify gate
    re-checks anyway — never a correctness risk. The explicit select
    prunes any extra band columns BEFORE the exchange."""
    return bucket_pairs_grouped(
        bands.select("doc_id", "band_hash"),
        ["band_hash"],
        config,
        input_rows=input_rows,
    )


def dropped_pairs_metrics(
    df: DataFrame,
    key_cols: list[str] | None = None,
    config: DedupConfig | None = None,
) -> DataFrame:
    """Per-bucket count of pairs NOT emitted by the star-R policy —
    the no-silent-truncation ledger (SURVEY.md §4 'no silent
    truncation'). Works for any keyed channel: MinHash bands
    (default key ["band_hash"], band-salted), SimHash combos
    (["combo_key"]), etc."""
    if isinstance(key_cols, DedupConfig):  # legacy (bands, config) call
        key_cols, config = None, key_cols
    if config is None:
        raise TypeError("config is required")
    key_cols = key_cols or ["band_hash"]
    sizes = df.groupBy(*key_cols).agg(F.count("*").alias("n"))
    n, r = F.col("n"), F.lit(config.star_representatives)
    all_pairs = n * (n - 1) / 2
    star_pairs = r * n - r * (r + 1) / 2
    return sizes.where(n > config.max_bucket_all_pairs).select(
        *key_cols,
        "n",
        (all_pairs - star_pairs).cast("long").alias("dropped_pairs"),
    )


def simhash_keyed(
    sigs: DataFrame, config: DedupConfig
) -> tuple[DataFrame, int]:
    """(doc_id, combo_key) block-permutation keying for the SimHash
    channel + the per-doc key count — shared by simhash_candidates and
    the dropped-pairs ledger (both must see the identical key space)."""
    h = config.simhash_hamming_max
    nb = config.simhash_blocks
    bits = config.simhash_bits
    widths = [bits // nb + (1 if i < bits % nb else 0) for i in range(nb)]
    offsets = [sum(widths[:i]) for i in range(nb)]

    def block(i: int) -> F.Column:
        return F.shiftrightunsigned(F.col("simhash"), offsets[i]).bitwiseAND(
            F.lit((1 << widths[i]) - 1)
        )

    combos = list(itertools.combinations(range(nb), nb - h))
    keys = F.array(
        *[
            F.xxhash64(F.lit(ci), *[block(i) for i in combo])
            for ci, combo in enumerate(combos)
        ]
    )
    return sigs.select("doc_id", F.explode(keys).alias("combo_key")), len(combos)


def simhash_candidates(
    sigs: DataFrame, config: DedupConfig, input_rows: int | None = None
) -> DataFrame:
    """SimHash candidate channel — block-permutation scheme (Manku, Jain,
    Das Sarma, "Detecting Near-Duplicates for Web Crawling", WWW'07).

    Split the `simhash_bits` fingerprint into `simhash_blocks` nearly
    equal blocks; for every combination of (blocks - hamming_max) blocks,
    key the doc on xxhash64(combo_id, those block values). Pigeonhole: a
    pair within hamming_max has its differing bits in <= hamming_max
    blocks, so SOME combination of the remaining blocks is identical on
    both sides → candidate. With the defaults (64 bits, 6 blocks, h=3)
    that is C(6,3) = 20 tables keyed on ~32 bits of fingerprint —
    ~2^32 distinct buckets per table, vs the 65k-bucket ceiling of the
    previous 16-bit-chunk scheme, which at 10^9 docs made every bucket
    ~15k docs and the self-join O(n²/65k).

    Hot-bucket caveat (shared with the MinHash band channel): buckets
    over max_bucket_all_pairs degrade to the star-R pairing, so the
    pigeonhole guarantee holds UNCONDITIONALLY only for buckets within
    the all-pairs cap; in a hot bucket a member-member pair survives iff
    a representative also passes the hamming gate (true for the
    boilerplate near-identical families that cause hot buckets, not
    guaranteed for adversarial structures). That trade is deliberate —
    the reference's own hot-bucket policy is a hard output cap
    (pcluster.cpp:115-116) — and the not-emitted volume is observable
    via dropped_pairs_metrics(keyed, ["combo_key"], config).
    Final gate: exact bit_count(a ^ b) <= hamming_max
    (ref two-level filter: kmer_search.cpp:100-112).

    `input_rows` = row count of `sigs` (i.e. #docs), when the caller
    knows it — lets the broadcast guard prove safety without a runtime
    count (combo-key rows are exactly C(blocks, blocks-h) per doc).
    """
    keyed, n_combos = simhash_keyed(sigs, config)
    # keyed has exactly n_combos rows per doc → the guard's proven
    # bound needs only #docs from the caller
    pairs = bucket_pairs_grouped(
        keyed,
        ["combo_key"],
        config,
        input_rows=None if input_rows is None else input_rows * n_combos,
    )
    sim = sigs.select("doc_id", "simhash")
    sa = sim.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sim_a"))
    sb = sim.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sim_b"))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .where(
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
            <= config.simhash_hamming_max
        )
        .select("a", "b")
    )

"""Explicit skew handling: salted repartition + two-phase aggregation.

The reference caps hot buckets positionally (500 hits per query,
pcluster.cpp:115-116) and profiles bucket sizes under #ifdef BUCKETSIZE
(pcluster.cpp:38-66). At web scale, hot keys are structural
(boilerplate-heavy pages all hashing to one band value; one site
contributing 10^8 pages), so the engine makes skew a first-class plan
decision:

- `salted_agg` — two-phase aggregation: key -> (key, salt) partial
  aggregate (map-side combine shards the hot key across s reducers) ->
  final aggregate on key. Identical results to a direct groupBy, bounded
  per-reducer load.
- `salted_repartition` — spread a hot partition key for downstream
  per-partition work.
- `key_skew_metrics` — the diagnostic feeding the salt-factor choice
  (the bucket-size histogram of H6, generalized).

The band-join and anchor-join operators bound their own skew
semantically (star-R pairing, anchor df cap — candidates.py,
substring.py); these utilities cover aggregation-shaped skew.
AQE's skewJoin handles residual join-side stragglers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def key_skew_metrics(df: DataFrame, *keys: str) -> DataFrame:
    """Per-key row counts + share of total — pick salt factor from p99/max."""
    total = df.count()
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n_rows"))
        .withColumn("share", F.col("n_rows") / F.lit(total))
        .orderBy(F.desc("n_rows"))
    )


def salted_repartition(
    df: DataFrame, key: str, salt_factor: int, num_partitions: int | None = None
) -> DataFrame:
    """Repartition on (key, salt) so one hot key spreads over salt_factor
    partitions. Salt is a pure function of stable row content when a
    `doc_id`-like column exists (deterministic), else of all columns.
    The partition count is explicit — an advisory repartition would be
    AQE-coalesced right back into few partitions on small inputs,
    defeating the spread."""
    salt_src = "doc_id" if "doc_id" in df.columns else None
    salt: Column = (
        F.pmod(F.xxhash64(salt_src), F.lit(salt_factor))
        if salt_src
        else F.pmod(F.xxhash64(*df.columns), F.lit(salt_factor))
    )
    n = num_partitions or max(
        salt_factor, df.sparkSession.sparkContext.defaultParallelism
    )
    return (
        df.withColumn("_salt", salt)
        .repartition(n, F.col(key), F.col("_salt"))
        .drop("_salt")
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_factor: int = 16,
) -> DataFrame:
    """Two-phase (salted partial -> final) aggregation.

    aggs: {out_col: "sum(col)" | "count(*)" | "max(col)" | "min(col)"}
    — the decomposable aggregates (sum/count/min/max) re-aggregate
    exactly; avg is expressed by the caller as sum+count.

    Results are identical to df.groupBy(keys).agg(...); the difference
    is purely physical: phase 1 shards each hot key across salt_factor
    reducers, so no single task aggregates a whole hot key.

    The salt is a pure function of the NON-key columns (falling back to
    the keys when there are none) — never monotonically_increasing_id(),
    whose value depends on partition layout and row order: a stage retry
    after executor loss would re-salt rows differently, making phase-1
    output indeterminate (Spark must rollback-and-recompute indeterminate
    stages, and it forfeits the determinism the rest of the repo
    guarantees). Content-derived salts survive retries bit-identically.
    Rows of a hot key with identical non-key content collapse onto one
    salt, but identical rows also collapse in the partial aggregate
    map-side, so the per-reducer load stays bounded either way.
    """
    non_keys = [c for c in df.columns if c not in keys]
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in (non_keys or keys)]),
        F.lit(salt_factor),
    ).alias("_salt")

    partial_exprs = []
    final_exprs = []
    for out, spec in aggs.items():
        fn, _, col = spec.partition("(")
        col = col.rstrip(")")
        fn = fn.strip().lower()
        p = f"_p_{out}"
        if fn == "count":
            partial_exprs.append(F.count("*").alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate: {spec}")

    phase1 = df.select(*df.columns, salt).groupBy(*keys, "_salt").agg(
        *partial_exprs
    )
    return phase1.groupBy(*keys).agg(*final_exprs)

"""Connected components over the verified-edge table — pure DataFrame loop.

Reference parity: union-find over candidate ids
(pcluster/src/pcluster/union_find.cpp:16-43). The reference's
single-node disjoint-set (with its union-by-non-root bug,
union_find.cpp:31-33 — see SURVEY.md §2.12) is replaced by the
alternating large-star / small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14): provably convergent,
shuffle-key = node id, O(log n) rounds, no driver-side state beyond the
loop counter. Dedup graphs are shallow (stars within buckets), so in
practice 3-5 rounds.

Each round truncates lineage — without it the lineage doubles every
iteration and the planner blows up (the distributed analog of the
reference's in-RAM root[] mutation). Two modes:
- store=None: localCheckpoint (fast, executor-local blocks — fine for
  local mode / tests, NOT fault-tolerant: a lost executor kills the run)
- store=StageStore: every iteration persists its edge table to the
  store ("cc/iter_NNN" stages) — a crashed run resumes from the last
  completed iteration, and lost executors recompute from durable
  parquet instead of dying (north-rule resumability at cluster scale).

Deterministic canonical labels: cluster_id = min(doc_id) of the
component — independent of partitioning, row order, and cluster size
(north-rule determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fresh(df: DataFrame) -> DataFrame:
    """Re-project u,v with new attribute ids. Self-unions of the same
    (checkpointed) plan share attribute ids across branches, which trips
    a NoSuchElementException in Spark 4.1's Union constraint rewriting;
    aliasing each branch separately avoids it."""
    return df.select(F.col("u").alias("u"), F.col("v").alias("v"))


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every larger neighbor of u to min(Γ⁺(u))."""
    nbrs = _fresh(edges).union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = nbrs.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("u", "mn").alias("m"))
    return (
        nbrs.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Point each edge large→small; connect all small neighbors to the min."""
    d = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    return (
        _fresh(
            d.join(mins, "u").select(
                F.col("v").alias("u"), F.col("m").alias("v")
            )
        )
        .union(mins.select("u", F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame, max_iter: int = 25, store=None
) -> DataFrame:
    """edges(a, b) -> assignments(doc_id, cluster_id), cluster_id = component min.

    Only nodes that appear in edges are returned; the pipeline left-joins
    back to the full doc set (singletons keep their own id).

    `store` (a sources.io.StageStore) makes every iteration durable and
    resume-aware: iteration i persists as stage "cc/iter_{i:03d}"; a
    re-run after a mid-CC crash reads completed iterations back and
    continues from the first missing one (the loop is deterministic, so
    the replayed termination check decides identically).

    Driver-action budget (the serial fraction that caps N→4N scaling —
    each collect is a full stage barrier the whole cluster idles behind):
    - store=None: ONE job per iteration — the checkpoint is LAZY
      (eager=False) and the count+hash convergence aggregate is the
      action that materializes it, instead of an eager-checkpoint job
      followed by a separate aggregate job.
    - store=StageStore: the parquet write is the only per-iteration job;
      the row count is read back from the _LINEAGE.json sidecar (already
      computed for lineage metrics) for FREE, and the content hash —
      needed only to confirm convergence — is computed solely when two
      consecutive counts agree, i.e. once or twice per run near
      convergence, over an already-small converged edge table.
    """

    def _hash(df: DataFrame) -> int:
        row = df.agg(
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h")
        ).collect()[0]
        return int(row["h"])

    def _persist(df: DataFrame, name: str) -> tuple[DataFrame, int, int | None]:
        """Materialize one iteration; returns (frame, n_rows, hash|None).
        hash is None when deferred (store path — computed on demand)."""
        if store is not None:
            out = store.materialize(name, lambda: df)
            return out, int(store.metrics[name]["rows"]), None
        out = df.localCheckpoint(eager=False)
        row = out.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).collect()[0]
        return out, int(row["n"]), int(row["h"])

    e, n, h = _persist(
        edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct(),
        "cc/iter_000",
    )
    if n == 0:
        spark = edges.sparkSession
        return spark.createDataFrame([], "doc_id long, cluster_id long")

    prev_e, prev_n, prev_h = e, n, h
    for i in range(max_iter):
        e, n, h = _persist(_small_star(_large_star(prev_e)), f"cc/iter_{i + 1:03d}")
        if n == prev_n:
            # counts agree — confirm with content hashes (computed lazily
            # on the store path; both frames are materialized and small)
            h = _hash(e) if h is None else h
            prev_h = _hash(prev_e) if prev_h is None else prev_h
            if h == prev_h:
                break
        prev_e, prev_n, prev_h = e, n, h
    # converged: every edge is (member, component_min)
    members = e.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    roots = e.select(F.col("v").alias("doc_id"), F.col("v").alias("cluster_id"))
    return members.union(roots).distinct()


def assign_clusters(
    docs: DataFrame, assignments: DataFrame
) -> DataFrame:
    """Full assignment table: docs(doc_id, ...) ⟕ CC output; singletons map
    to themselves (ref: every unseen point becomes its own center,
    hclust2.cpp:107-118 state 0→1)."""
    return (
        docs.select("doc_id")
        .join(assignments, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
    )

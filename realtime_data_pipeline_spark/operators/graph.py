"""Iterative graph operators: connected components by min-label
propagation — the dedup-clustering endgame (near-dup PAIRS become
duplicate GROUPS so a pipeline can keep one canonical doc per group).

This is the one genuinely iterative algorithm in the engine.  Each
iteration is fully distributed (a join + groupBy min); only the
convergence test touches the driver (a count).  Lineage is cut per
iteration with localCheckpoint — without it the plan doubles every
round and the job dies on plan-compile time long before data size
matters.  The same loop shape is how GraphX/GraphFrames implement
label propagation; iteration count is bounded by the component
diameter (near-dup clusters are shallow — a handful of rounds).

At 100 TB: edges are the MinHash candidate pairs (already sparse,
cost ∝ LSH bucket collisions); labels are (node, bigint) — two
columns, shuffle-partitioned on node.  Replace localCheckpoint with a
checkpoint dir (or write labels to a table per round) on a real
cluster for fault tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 60,
    steps_per_job: int = 4,
) -> DataFrame:
    """Min-label propagation over an undirected edge list.

    Returns (node, component) where component = the smallest node id
    reachable from `node` — the unique fixpoint, independent of
    iteration order.  Nodes with no edges are absent (singletons carry
    no dedup signal); union them in with component = node if needed.

    Convergence is CHECKED, not assumed: hitting `max_iter` with
    labels still moving raises instead of returning silently-wrong
    clusters (in a dedup pipeline an unconverged component map deletes
    the wrong documents).  The sf0.1 embedding graph needs 26 rounds —
    the old default of 25 truncated it and happened to be saved only
    because round 25 was the final productive one.

    A pointer-jumping variant (component ← label(label(node)) per
    round) was prototyped and measured: it converges a diameter-40
    path in 7 rounds vs 40, but on the real embedding graph it cut
    rounds only 26 → 20 while per-round wall time doubled from round
    ~17 on (same executed plan, same 1.6k-row inputs — environmental,
    reproduced across SMJ/broadcast physical plans and with/without
    Observation), netting 22 s vs 15.6 s.  Rejected; revisit only if
    profiles show diameter, not per-round overhead, dominating.

    ``steps_per_job`` (r14 optimization): propagation rounds FUSED
    into one checkpointed job, on a RAMP-UP schedule (1, 1, 2, then
    ``steps_per_job`` per block).  The dominant per-block cost at
    every measured scale is fixed — driver round-trip + checkpoint
    materialization — not the vocab-sized shuffle, so running k
    rounds of the same join+min inside one job divides that overhead
    by k while executing identical per-round dataflow (the stages
    pipeline inside the job without driver synchronization).  The
    ramp-up exists because fusing can OVERSHOOT: a block executes
    all its rounds even when the fixpoint lands mid-block, and
    shallow graphs (near-dup clusters are mostly pairs/triples,
    diameter 1-2) would pay k-1 wasted propagation rounds per block
    — measured as a 3.4 s → 4.6 s corpus_curation_stats REGRESSION
    under a flat k=3 before the ramp.  With blocks 1,1,2,k,... a
    diameter-1 graph runs exactly the old loop (2 rounds, 2 jobs)
    while the 26-round sf0.1 embedding graph drops from 27 jobs to
    ~10 for ≤6 overshot no-op rounds.  The fused convergence test is
    EXACT, not approximate: labels are monotone non-increasing, so a
    block leaves every label unchanged iff each round in it did.
    The diameter bound stays round-accurate (max_iter counts ROUNDS,
    not jobs).
    """
    if steps_per_job < 1:
        raise ValueError(f"steps_per_job must be >= 1: {steps_per_job}")
    from pyspark.sql import Observation

    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym = sym.distinct().persist()

    # Convergence metric: sum(component) over the fixed node set.
    # Labels are monotone non-increasing under min-propagation, so the
    # sum STRICTLY decreases whenever any label moves and is constant
    # exactly at the fixpoint — one decimal scalar per job replaces
    # the per-round moved-flag comparison, and it needs no reference
    # to the block's start labels, so any number of fused rounds share
    # one test.  The initial sum rides the same job that materializes
    # the initial checkpoint.  decimal(38,0) holds any plausible sum
    # (~1e19 max-bigint labels before precision 38 saturates) but is
    # NOT unconditionally overflow-proof: non-ANSI decimal sum returns
    # NULL on overflow, and coercing two overflowed NULLs to 0 would
    # read as converged — so a NULL sum over a NON-EMPTY node set
    # raises instead (ADVICE r14).  The count rides the same metric.
    def _metrics(tag: str):
        return Observation(tag), (
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )

    def _obs_sum(obs: "Observation") -> int:
        m = obs.get
        if m["s"] is None and m["n"]:
            raise ArithmeticError(
                "connected_components convergence sum overflowed "
                "decimal(38,0) — label-sum convergence is unsound here; "
                "shrink labels or partition the graph"
            )
        return m["s"] or 0  # None only for an empty node set

    obs0, metrics0 = _metrics("cc_init")
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .observe(obs0, *metrics0)
        .localCheckpoint()
    )
    prev_sum = _obs_sum(obs0)

    def _one_round(lbl: DataFrame) -> DataFrame:
        # Candidate label for each node: min over neighbours' labels.
        neigh_min = (
            sym.join(lbl, sym.u == lbl.node)
            .groupBy(F.col("v").alias("node2"))
            .agg(F.min("component").alias("neigh_component"))
        )
        return lbl.join(neigh_min, lbl.node == F.col("node2"), "left").select(
            "node",
            F.least(
                F.col("component"),
                F.coalesce("neigh_component", "component"),
            ).alias("component"),
        )

    rounds_done = 0
    block_idx = 0
    while True:
        # ramp-up: 1, 1, 2, then steps_per_job rounds per block
        block = min(steps_per_job, 2 ** max(0, block_idx - 1))
        block_idx += 1
        stepped = labels
        for _ in range(block):
            stepped = _one_round(stepped)
        rounds_done += block
        # The convergence metric rides the SAME job that materializes
        # the checkpoint (observe → CollectMetrics), so each block
        # is ONE distributed job — a separate join+count would double
        # the per-block latency, which at diameter D is 2D/k driver
        # round-trips of pure overhead.
        obs, metrics = _metrics(f"cc_round_{rounds_done}")
        labels = stepped.observe(obs, *metrics).localCheckpoint()
        new_sum = _obs_sum(obs)
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
        # A changed block proves its FIRST round changed (no-op rounds
        # are absorbing under monotone propagation), i.e. at least
        # rounds_done - block + 1 productive rounds so far — raise
        # exactly when that count reaches max_iter, the same
        # guarantee the unfused loop gave.
        if rounds_done - block + 1 >= max_iter:
            sym.unpersist()
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "iterations — component diameter exceeds the bound; "
                "raise max_iter (results would be silently wrong "
                "clusters)"
            )
    sym.unpersist()
    return labels

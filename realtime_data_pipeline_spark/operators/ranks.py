"""Scale-safe global ranking: range-partitioned two-pass row numbering.

A bare ``Window.orderBy(...)`` (no partitionBy) is the classic scale
killer — Spark moves EVERY row into one task and sorts there; at 100 TB
that task never finishes.  The reference has no global ranking at all
(SURVEY §2.4 "window functions: none"), but the engine's distribution
queries (ntile / percent_rank / cume_dist) need a total order, so this
operator provides one with bounded per-task work:

1. ``repartitionByRange(P, *order_cols)`` — shuffle rows into P
   partitions whose key ranges are ascending in partition id (the same
   machinery ``df.sort`` uses), each partition smallish.
2. Per-partition ``row_number`` — ``Window.partitionBy(partition_id)``,
   so the sort is local to each task.
3. Per-partition row counts → cumulative offsets.  This is a P-row
   (NOT N-row) driver-side cumsum — O(hundreds) on a real cluster —
   broadcast-joined back.  global row number = offset[pid] + local rn.

The ranged input is pinned with a (lazy) ``localCheckpoint`` for the
duration: the offsets pass and the result pass MUST observe the same
range boundaries, and ``repartitionByRange`` samples boundaries per
job — materializing one sampled partitioning serves both (also what
you'd do at scale: one shuffle, two cheap passes over it).  r15: this
was a ``persist()`` before, which leaked a CacheManager entry per call
on the success path (no caller can know when the returned lazy plan is
done).  Checkpoint blocks are instead released by the ContextCleaner
when the plan is garbage-collected — bounded in long-lived sessions
without an unpersist hook.  Lineage truncation means a lost block
fails the job rather than resampling boundaries mid-query (fail-stop,
never silently wrong ranks).

With a total order (callers must include a unique tie-break column),
row_number == rank == dense_rank, so percent_rank and cume_dist are
pure arithmetic on (rn, N) and SQL NTILE is arithmetic on
(rn, N, n_tiles) — no second global window anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"
_LOCAL_RN = "__rank_local_rn"


def with_global_row_number(
    df: DataFrame,
    order_cols: list[str],
    rn_col: str = "global_rn",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Append a 1-based global row number under the total order
    ``order_cols`` (which must be a TOTAL order — include a unique key).

    Returns ``(dataframe, total_row_count)`` — the count falls out of
    the offsets pass for free.
    """
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # lazy checkpoint: materialized by the pass-1 collect below, reused
    # (same blocks, same sampled range boundaries) by pass 2 — see the
    # module docstring for why this is a checkpoint, not a persist.
    ranged = df.repartitionByRange(
        p, *[F.col(c) for c in order_cols]
    ).localCheckpoint(eager=False)
    sized = ranged.withColumn(_PID, F.spark_partition_id())
    # Pass 1: per-partition sizes → cumulative offsets (P rows).
    counts = dict(
        sized.groupBy(_PID).count().collect()
    )  # {pid: n} — O(P), never O(N)
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()],
            f"{_PID} int, __rank_offset long",
        )
    )
    # Pass 2: local sort + offset add.  The window partitions by
    # physical partition id, so each task sorts only its own range.
    w = Window.partitionBy(_PID).orderBy(*[F.col(c) for c in order_cols])
    out = (
        sized.withColumn(_LOCAL_RN, F.row_number().over(w))
        .join(offset_df, _PID)
        .withColumn(rn_col, F.col("__rank_offset") + F.col(_LOCAL_RN))
        .drop(_PID, _LOCAL_RN, "__rank_offset")
    )
    return out, acc


def with_global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    weight_col: str,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Append the INCLUSIVE global running sum of ``weight_col`` under
    the total order ``order_cols`` — the same range-partitioned
    two-pass machinery as `with_global_row_number`, summing a weight
    instead of counting rows (row_number is the weight=1 special
    case).  Lets callers that only need rank BOUNDS of pre-aggregated
    tie groups (AUC rank sums, cumulative-distribution tables) run
    the global order over ONE ROW PER GROUP: the range exchange and
    per-partition sort touch the grouped relation, never the raw
    rows, and the upstream groupBy ships map-side partials (guide
    "aggregate before you shuffle").

    Returns ``(dataframe, grand_total)``.

    ``weight_col`` must be an INTEGRAL column (ADVICE r14): the offsets
    cross the driver through a declared ``long`` schema and the running
    sum feeds rank arithmetic — a double/decimal weight would truncate
    offsets silently or change the grand_total type under the caller.
    """
    itype = df.schema[weight_col].dataType.typeName()
    if itype not in ("byte", "short", "integer", "long"):
        raise TypeError(
            f"with_global_running_sum requires an integral weight_col; "
            f"{weight_col!r} is {itype} (cast or pre-scale it first)"
        )
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # lazy checkpoint, not persist — same contract as
    # with_global_row_number above.
    ranged = df.repartitionByRange(
        p, *[F.col(c) for c in order_cols]
    ).localCheckpoint(eager=False)
    sized = ranged.withColumn(_PID, F.spark_partition_id())
    # Pass 1: per-partition weight sums → cumulative offsets (P rows).
    sums = dict(
        sized.groupBy(_PID).agg(F.sum(weight_col).alias("s")).collect()
    )  # {pid: sum} — O(P), never O(N)
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid] or 0
    offset_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()],
            f"{_PID} int, __rank_offset long",
        )
    )
    # Pass 2: local running sum + offset add (task-local sort only).
    w = (
        Window.partitionBy(_PID)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        sized.withColumn(_LOCAL_RN, F.sum(weight_col).over(w))
        .join(offset_df, _PID)
        .withColumn(out_col, F.col("__rank_offset") + F.col(_LOCAL_RN))
        .drop(_PID, _LOCAL_RN, "__rank_offset")
    )
    return out, acc


def ntile_expr(rn: Column, total: int, n_tiles: int) -> Column:
    """SQL NTILE(n) from a global row number: the first ``total % n``
    tiles get ``total // n + 1`` rows, the rest ``total // n`` — exactly
    the standard's distribution, computed without any window."""
    q, r = divmod(total, n_tiles)
    big = r * (q + 1)  # rows covered by the (q+1)-sized tiles
    return (
        F.when(rn <= F.lit(big), F.floor((rn - 1) / F.lit(q + 1)))
        .otherwise(F.lit(r) + F.floor((rn - 1 - F.lit(big)) / F.lit(max(q, 1))))
        .cast("int")
        + 1
    )


def percent_rank_expr(rn: Column, total: int) -> Column:
    """percent_rank under a TOTAL order: (rank-1)/(N-1)."""
    return (rn - 1).cast("double") / F.lit(max(total - 1, 1))


def cume_dist_expr(rn: Column, total: int) -> Column:
    """cume_dist under a TOTAL order: rank/N."""
    return rn.cast("double") / F.lit(total)

"""Slowly-changing-dimension Type 2: validity-interval history tables
and their incremental merge.

The lakehouse dimension pattern the reference's last-write-wins Mongo
upsert cannot express (SURVEY §1.4.3 — history discarded on every
write): each tracked key keeps ONE ROW PER VALUE EPISODE with
``effective_from`` / ``effective_to`` validity bounds, the open episode
carrying ``effective_to IS NULL`` / ``is_current = true``.  Downstream
joins pick the row whose interval contains the fact's timestamp — the
standard Kimball SCD2 contract.

Two operators:

* ``scd2_from_history`` — batch-build the dimension from a full change
  log (gaps-and-islands collapse of consecutive equal values, then each
  episode's ``effective_to`` = the NEXT episode's start).  One
  key-exchange end to end: the change-flag lag window, the running-sum
  episode ids, the episode rollup, and the next-start lead window all
  share HashPartitioning(key) (subset-key clustering).

* ``scd2_merge`` — incremental maintenance: fold a batch of new change
  rows into an existing dimension without touching closed history.
  Closed episodes pass through untouched (at 100 TB they are the
  ~immutable bulk, ideally partition-pruned by ``is_current``); only
  each key's OPEN episode is re-derived together with the batch's new
  rows.  The algebraic contract — pinned by a slicing property test —
  is exactly::

      scd2_merge(scd2_from_history(log <= T), log in (T, T2])
          == scd2_from_history(log <= T2)

  i.e. merging any suffix of the change log is equivalent to a fresh
  rebuild, so incremental refreshes never drift from the batch truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_history(
    df: DataFrame,
    key: str,
    attr: str,
    ts_col: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse a change log (one row per observation) into the SCD2
    dimension.  ``(ts_col, tiebreak)`` must totally order each key's
    rows.  Consecutive observations with equal ``attr`` merge into one
    episode; ``effective_from`` = first observation of the episode,
    ``effective_to`` = next episode's start (NULL for the open one).
    """
    order = [ts_col] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order])
    prev = F.lag(attr).over(w)
    flg = F.when(prev.isNull() | (prev != F.col(attr)), 1).otherwise(0)
    run = (
        df.select(key, attr, *order)
        .withColumn("__flg", flg)
        .withColumn(
            "__ep",
            F.sum("__flg").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    # attr is constant within an episode by construction — min() is just
    # the deterministic way to pick it
    eps = run.groupBy(key, "__ep").agg(
        F.min(attr).alias(attr),
        F.min(ts_col).alias("effective_from"),
    )
    # __ep (the episode sequence) breaks effective_from ties: when a
    # key's attribute flaps within one timestamp, episodes share a
    # start and bare orderBy(effective_from) would make lead()
    # nondeterministic (found by the hypothesis model test)
    we = Window.partitionBy(key).orderBy("effective_from", "__ep")
    return eps.select(
        key,
        attr,
        "effective_from",
        F.lead("effective_from").over(we).alias("effective_to"),
    ).withColumn("is_current", F.col("effective_to").isNull())


def scd2_merge(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    attr: str,
    ts_col: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Fold a batch of change rows (same schema as the original log)
    into an existing SCD2 dimension.  Closed episodes (``effective_to``
    NOT NULL) pass through untouched; each key's open episode is
    replayed together with the batch's rows for that key, so a batch
    may contain multiple change points per key.  Late rows older than a
    key's open episode are rejected (they would rewrite closed
    history — route those through a full rebuild instead).
    """
    order = [ts_col] + ([tiebreak] if tiebreak else [])
    closed = dim.where(~F.col("is_current"))
    open_eps = dim.where(F.col("is_current"))

    guard = changes.alias("c").join(
        open_eps.select(key, F.col("effective_from").alias("__open_from")),
        key,
        "left",
    )
    late = guard.where(F.col(ts_col) < F.col("__open_from"))
    # fail loudly instead of silently corrupting closed history
    n_late = late.limit(1).count()
    if n_late:
        raise ValueError(
            "scd2_merge: change rows predate a key's open episode — "
            "closed history would need rewriting; run scd2_from_history "
            "on the full log instead"
        )

    # replay = open episode (as a pseudo change row at its start) + batch
    # the pseudo row's missing tiebreak becomes NULL (sorts first under
    # Spark's nulls-first ascending default, so it stays the episode head
    # even when a batch row shares its timestamp)
    replay = open_eps.select(
        key, attr, F.col("effective_from").alias(ts_col)
    ).unionByName(changes.select(key, attr, *order), allowMissingColumns=True)
    rebuilt = scd2_from_history(
        replay, key, attr, ts_col=ts_col, tiebreak=tiebreak
    )
    # a replayed key's first episode keeps its original effective_from
    # (it IS the old open episode); all other episodes are new
    return closed.unionByName(rebuilt)

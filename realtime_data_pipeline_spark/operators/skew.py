"""Skew-mitigation join: key salting.

At 100 TB a handful of hot keys (power-law users, null-ish defaults)
can put one shuffle partition orders of magnitude above the rest and
stall the stage on a single task.  AQE's skew-join splitting
(spark.sql.adaptive.skewJoin, on in our session factory) handles this
at runtime for sort-merge joins; explicit salting is the declarative
fallback that also works for streaming joins and older planners.

Mechanics: every LEFT row gets a uniform salt in [0, n_salts); the
RIGHT side is replicated once per salt value; the join key becomes
(key, salt).  A hot key's rows now spread over n_salts shuffle
partitions.  The salt only routes rows — the join RESULT is identical
to the unsalted join (the parity oracle for `salted_segment_counts`
checks exactly that).

Cost model: replicates the right side n_salts× — use when right is
small-but-above-broadcast-threshold, or bound the replication to the
known-hot keys only (split hot/cold, salt the hot slice, union).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on `keys` with left-side salting and right-side
    replication.  Semantics identical to `left.join(right, keys, how)`
    for row-preserving join types (inner / left / left_semi)."""
    salt = (F.rand(seed=42) * n_salts).cast("int")
    l = left.withColumn(SALT, salt)
    r = right.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    # MERGE hint (r7 broadcast audit): the operator's documented use
    # case is a right side ABOVE the broadcast threshold (if it fit a
    # broadcast you would broadcast and need no salt), but the
    # replicated side's static size estimate is explode-derived
    # garbage and the planner chose to broadcast it at toy scale —
    # which routes zero rows through the salted exchange and turns
    # the demonstration into a no-op.  The hint makes the salted
    # shuffle join the plan that actually runs at every scale.
    return l.join(r.hint("merge"), keys + [SALT], how).drop(SALT)

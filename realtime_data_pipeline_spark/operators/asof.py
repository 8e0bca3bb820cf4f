"""As-of (backward) join — attach to each left row the most recent
right row with the same key and right.ts <= left.ts.

The reference has no as-of operator (its only temporal tool is the
sliding window, consumer/consumer.py:117); this is a north-star
extension for event-attribution workloads.

Spark-first design: a naive implementation is a range join
(`l.key = r.key AND r.ts <= l.ts` + argmax), which Catalyst plans as a
broadcast-nested-loop / cartesian per key — quadratic in events per
key and hopeless at 100 TB.  Instead we use the union-and-scan shape:

    union both sides (right rows carry a payload struct, left rows a
    null payload) → ONE shuffle on the key → per-key sort on
    (ts, side, payload) → `last(payload, ignorenulls=True)` over an
    unbounded-preceding running window → keep left rows.

Cost is one shuffle + one sort over |L|+|R| rows, the same plan shape
Spark uses for any window function, and it inherits AQE skew handling.
Ties: at equal ts the right row sorts BEFORE the left row (inclusive
as-of); equal-ts right rows resolve to the greatest payload struct, so
callers get deterministic output by leading the payload with a unique
tie-break column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ASOF_COL = "asof"
_TS, _SIDE, _PAYLOAD = "__asof_ts", "__asof_side", "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Backward as-of join; returns all left columns plus a struct
    column `asof` with fields (`ts`, *payload_cols) from the matched
    right row (null struct when no right row precedes).

    `payload_cols[0]` should be unique per (key, ts) for fully
    deterministic results — it is the tie-break among equal-ts right
    rows.
    """
    payload = F.struct(
        *[F.col(c) for c in payload_cols],
        F.col(right_ts).alias("ts"),
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        payload.alias(_PAYLOAD),
    )
    payload_type = r.schema[_PAYLOAD].dataType
    l = left.select(
        *left.columns,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(payload_type).alias(_PAYLOAD),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(_TS, _SIDE, _PAYLOAD)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn(ASOF_COL, F.last(_PAYLOAD, ignorenulls=True).over(w))
        .where(F.col(_SIDE) == 1)
        .drop(_TS, _SIDE, _PAYLOAD)
    )

"""Streaming SCD Type-2 maintenance: keep a validity-interval
dimension current from a change stream via foreachBatch + scd2_merge.

The streaming face of operators/scd.py: each micro-batch of change
rows folds into the dimension with ``scd2_merge`` (closed episodes
untouched, open episodes replayed with the batch), so after the stream
drains the dimension equals a batch ``scd2_from_history`` over the full
log — the same convergence contract the batch oracle checks.

Exactly-once under redelivery (the UpsertTable/corpus_sink discipline):
the dimension is written as BATCH-KEYED versions ``v{batch_id}``, each
computed from the newest version strictly OLDER than the batch — a
replayed micro-batch deterministically recomputes its own version from
the same predecessor and overwrites it, never compounding.  Readers
take the highest complete version.  A version directory is committed
by parquet's own _SUCCESS marker; a crash mid-write leaves a torn
directory that the replay overwrites.  ``vacuum_versions`` bounds the
store to the newest ``retain_versions`` snapshots after every commit
(the incremental-dedup/corpus-sink retention discipline — one snapshot
per micro-batch forever is the growth bug this module refuses to have).

At 100 TB the closed-episode bulk is immutable and should live
partition-separated (``is_current``) so each merge rewrites only the
open slice; here both slices ride in one versioned snapshot for
simplicity — the operator itself (scd2_merge) already touches only the
open episodes.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from realtime_data_pipeline_spark.operators import scd

_V_RE = re.compile(r"^v(\d+)$")


def _versions(dim_dir: str) -> list[int]:
    if not os.path.isdir(dim_dir):
        return []
    out = []
    for name in os.listdir(dim_dir):
        m = _V_RE.match(name)
        if m and os.path.exists(os.path.join(dim_dir, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def read_scd2_dim(spark: SparkSession, dim_dir: str) -> DataFrame | None:
    """Newest committed dimension snapshot, or None before any batch."""
    vs = _versions(dim_dir)
    if not vs:
        return None
    return spark.read.parquet(os.path.join(dim_dir, f"v{vs[-1]}"))


def vacuum_versions(dim_dir: str, keep_last: int) -> int:
    """Drop all but the newest ``keep_last`` committed versions (the
    corpus_sink/UpsertTable retention discipline — without this the
    store grows one snapshot per micro-batch forever).  Returns the
    number of versions removed.  Retention bounds REPLAY depth the
    same way checkpoint retention does: a redelivered batch older than
    the vacuum window cannot find its predecessor and must go through
    a batch rebuild — keep_last must exceed the source's redelivery
    horizon (maxBatchesToRetain-style sizing)."""
    import shutil

    vs = _versions(dim_dir)
    doomed = vs[:-keep_last] if keep_last > 0 else []
    for v in doomed:
        shutil.rmtree(os.path.join(dim_dir, f"v{v}"), ignore_errors=True)
    return len(doomed)


def start_scd2_merge_query(
    stream: DataFrame,
    dim_dir: str,
    checkpoint_dir: str,
    key: str,
    attr: str,
    ts_col: str = "ts",
    tiebreak: str | None = None,
    query_name: str = "scd2_merge",
    trigger_available_now: bool = False,
    retain_versions: int = 3,
):
    """foreachBatch maintenance of an SCD2 dimension from a change
    stream.  Batches must arrive in non-decreasing event time overall
    (scd2_merge rejects rows that predate a key's open episode — route
    genuinely late data through a batch rebuild).  ``retain_versions``
    bounds store growth: older snapshots vacuum after each commit
    (vacuum runs AFTER the new version is committed, so the newest
    predecessor always survives for the next batch and for redelivery
    within the retention window)."""
    spark = stream.sparkSession

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # predecessor = newest version strictly older than this batch —
        # a redelivered batch recomputes from the SAME input state
        older = [v for v in _versions(dim_dir) if v < batch_id]
        prev = (
            spark.read.parquet(os.path.join(dim_dir, f"v{older[-1]}"))
            if older
            else None
        )
        if prev is None:
            dim = scd.scd2_from_history(
                batch_df, key, attr, ts_col=ts_col, tiebreak=tiebreak
            )
        else:
            dim = scd.scd2_merge(
                prev, batch_df, key, attr, ts_col=ts_col, tiebreak=tiebreak
            )
        dim.write.mode("overwrite").parquet(
            os.path.join(dim_dir, f"v{batch_id}")
        )
        if retain_versions:
            vacuum_versions(dim_dir, retain_versions)

    wtr = (
        stream.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if trigger_available_now:
        wtr = wtr.trigger(availableNow=True)
    return wtr.start()

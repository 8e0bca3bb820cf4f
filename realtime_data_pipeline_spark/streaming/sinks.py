"""Keyed-upsert sink — the reference's Mongo upsert semantics
(consumer/consumer.py:147-174: operationType=update, upsertDocument,
composite idFieldList) re-implemented Mongo-free as a foreachBatch
MERGE into a versioned parquet table.

Why versioned directories: Spark cannot safely overwrite a parquet
path it is reading in the same job.  Each merge writes a new
`v=<n>` directory and then atomically flips a `_CURRENT` pointer
file; readers resolve the pointer.  Checkpoint replay of a micro-batch
re-merges the same rows under the same keys — idempotent, exactly the
property the reference gets from Mongo upsert (SURVEY §1.4.3).

At scale this slot is filled by a real table format (Delta/Iceberg
MERGE INTO, which is the same keyed upsert executed with file-level
pruning); the interface here is format-agnostic on purpose.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CURRENT = "_CURRENT"


class UpsertTable:
    """A parquet table with composite-key upsert and snapshot reads."""

    def __init__(self, spark: SparkSession, path: str, key_cols: list[str]):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)

    # -- pointer management -------------------------------------------------
    def _current_version(self) -> int | None:
        try:
            with open(os.path.join(self.path, _CURRENT)) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _flip(self, version: int) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, _CURRENT + ".tmp")
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(self.path, _CURRENT))

    def _vdir(self, version: int) -> str:
        return os.path.join(self.path, f"v={version}")

    # -- reads --------------------------------------------------------------
    def read(self) -> DataFrame | None:
        v = self._current_version()
        if v is None:
            return None
        return self.spark.read.parquet(self._vdir(v))

    # -- merge --------------------------------------------------------------
    def merge(self, batch: DataFrame) -> None:
        """Upsert: delete-matching-keys then insert (last write wins).

        Within one batch, duplicate keys collapse to an arbitrary single
        row via dropDuplicates on the key — the streaming engine never
        emits duplicate finalized windows in one batch, so this only
        guards replay edge cases.
        """
        batch = batch.dropDuplicates(self.key_cols)
        current = self.read()
        if current is None:
            merged = batch
        else:
            merged = current.join(
                batch.select(self.key_cols), self.key_cols, "left_anti"
            ).unionByName(batch)
        v_new = (self._current_version() or 0) + 1
        merged.write.mode("overwrite").parquet(self._vdir(v_new))
        self._flip(v_new)
        self._vacuum(keep=2)

    def _vacuum(self, keep: int) -> None:
        import shutil

        v = self._current_version() or 0
        for name in os.listdir(self.path):
            if name.startswith("v="):
                try:
                    ver = int(name.split("=", 1)[1])
                except ValueError:
                    continue
                if ver <= v - keep:
                    shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)


def upsert_sink(table: UpsertTable):
    """foreachBatch hook: merge each micro-batch by composite key (W4)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        table.merge(batch_df)

    return _sink


def start_upsert_query(
    agg: DataFrame,
    table: UpsertTable,
    checkpoint_dir: str,
    query_name: str,
    trigger_available_now: bool = False,
    output_mode: str = "append",
):
    """W3+W4: streaming write into the keyed-upsert table, checkpointed
    for exactly-once-ish replay (consumer/consumer.py:147-159).

    append (default) emits finalized windows only; update is for
    arbitrary-stateful operators (applyInPandasWithState) that re-emit
    a key's latest value each batch — the keyed merge makes either mode
    last-write-wins idempotent.
    """
    writer = (
        agg.writeStream.outputMode(output_mode)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(upsert_sink(table))
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

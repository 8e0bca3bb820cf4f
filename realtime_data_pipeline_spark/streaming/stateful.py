"""Custom stateful streaming operators via applyInPandasWithState.

The reference keeps all streaming state inside Spark's built-in
windowed aggregation (consumer/consumer.py:116-140); these are the
north-star "custom stateful operator" slot — per-key state the built-in
operators cannot express, held in the state store, updated with
Arrow-batched pandas (never row-at-a-time Python).

Scale posture: state is one tiny tuple per key, partitioned by the
grouping key across executors; with high key cardinality switch the
session to the RocksDB state store provider.  Output mode is `update`
(each batch re-emits only keys it touched), paired with the keyed
upsert sink for last-write-wins serving.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "user_id string, total_interactions long"
_STATE_SCHEMA = "cnt long"


def _update_running_total(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (cnt,) = state.get if state.exists else (0,)
    for pdf in batches:
        cnt += len(pdf)
    state.update((cnt,))
    yield pd.DataFrame({"user_id": [key[0]], "total_interactions": [cnt]})


def running_user_totals(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Lifetime interaction count per user, updated incrementally per batch.

    Unlike the windowed aggregations, this state never expires — it is
    a running *all-time* counter, which `groupBy(window(...))` cannot
    express (every window is time-bounded).  Equivalent batch semantics:
    `events.groupBy(user_id).count()` — the parity oracle.
    """
    return events.groupBy(key_col).applyInPandasWithState(
        _update_running_total,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- transformWithStateInPandas (Spark 4 stateful-processor API) -----------
#
# DELIBERATELY NOT IMPLEMENTED here (r6 downgrade → r7 removal).  The
# TransformWithStateInPySpark runner speaks protobuf to the JVM, and
# this container has no google.protobuf (no network, no installs —
# re-probed r7), so a StatefulProcessor subclass could never execute:
# it would be permanently-dead unverified code.  The custom-stateful
# operator slot is carried entirely by the applyInPandasWithState
# implementation above — the dependency-free API for the same
# semantics (per-key state store tuples, Arrow-batched updates,
# update-mode emission), fully tested, with
# streaming_running_user_totals driver-hash-checked.  If the runtime
# ever gains protobuf, the port is mechanical: the
# _update_running_total kernel becomes a StatefulProcessor with a
# ValueState handle (init/handleInputRows/close), and the RocksDB
# provider below already satisfies its state-store requirement.


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

"""Adversarial UNICODE-fixture parity, EVENTS edition (VERDICT r7 #5).

test_unicode_value_parity plants multiscript values in documents.text
/ lang / source, but the event table's hot string columns —
event_type (the reference's interaction_type) and the JSON props item
key — never carried non-ASCII, and they ride groupBy keys, window
partitions, pivot/grouping-sets dimensions, SCD2 change detection,
transition-matrix keys, and the from_json Kafka wire path in roughly
half the registry.  Same harness pattern as the documents edition:
rebuild the sf0.001 star schema with multiscript values
deterministically injected into events, then re-run the
driver-strength byte-exact compare for every oracle-carrying query
whose oracle reads the events table, plus the event-fed streaming
twins (wire format, state stores, SCD2 sink).

Injected value classes (cycled): CJK, RTL arabic, astral emoji
(surrogate-pair hazards), the case-mapping trap (İ / ß — diverges
between ICU and DuckDB IF any operator ever case-folds a key),
fullwidth latin, and an ideographic-space-glued value (one KEY, not
two, under every byte-based groupBy).  props variants additionally
cover JSON \\uXXXX ESCAPED unicode (both engines must unescape to the
same item key) and unicode in a NON-extracted key (must be ignored
identically).
"""

from __future__ import annotations

import re

import duckdb as _duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from realtime_data_pipeline_spark.plans.registry import REGISTRY
from realtime_data_pipeline_spark.tables import TABLE_NAMES

from conftest import SF_DIR
from test_oracle_parity import assert_frames_match

_EVENT_TYPES = [
    "购买",
    "نقرة",
    "İstanbul",
    "ß-view",
    "🛒",
    "ｃｌｉｃｋ",
    "点击　glue",
]

_PROPS = [
    '{"k": "项目"}',
    '{"k": "\\u9879\\u76ee-42"}',  # JSON-escaped unicode item
    '{"k": "🛒"}',
    '{"k": "بند", "メモ": "x"}',  # unicode in a non-extracted key too
    '{"k": "İß"}',
]


def _mutate(name: str, t: pa.Table) -> pa.Table:
    n = t.num_rows
    cols = {f.name: t[f.name] for f in t.schema}
    if name == "events":
        event_type = cols["event_type"].to_pylist()
        props = cols["props"].to_pylist()
        for i in range(0, n, 7):
            event_type[i] = _EVENT_TYPES[(i // 7) % len(_EVENT_TYPES)]
        for i in range(0, n, 13):
            props[i] = _PROPS[(i // 13) % len(_PROPS)]
        cols["event_type"] = pa.array(
            event_type, type=t.schema.field("event_type").type
        )
        cols["props"] = pa.array(props, type=t.schema.field("props").type)
    return pa.table(cols, schema=t.schema)


# every oracle-carrying batch query whose oracle reads the events
# table (the mutation only touches events, so only those can move)
_QUERIES = sorted(
    name
    for name, spec in REGISTRY.items()
    if spec.oracle is not None
    and "streaming" not in (spec.tags or ())
    and re.search(r"\bevents\b", spec.oracle)
)

# event-fed streaming twins: unicode event types / item keys must
# survive the to_json -> text stream -> from_json wire path, the
# session/replay state stores, the stream-static enrichment join, and
# the SCD2 change-detection sink
_QUERIES += [
    "streaming_json_wire_counts",
    "streaming_replay_user_counts",
    "streaming_session_counts",
    "streaming_enriched_segment_counts",
    "streaming_scd2_user_segments",
]


@pytest.fixture(scope="module")
def unicode_events_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_unicode_events")
    for name in TABLE_NAMES:
        t = pq.read_table(f"{SF_DIR}/{name}.parquet")
        if name == "events":
            t = _mutate(name, t)
        pq.write_table(t, f"{d}/{name}.parquet")
    return str(d)


@pytest.fixture(scope="module")
def unicode_events_duck(unicode_events_sf_dir):
    con = _duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{unicode_events_sf_dir}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _QUERIES)
def test_parity_survives_unicode_event_values(
    spark, unicode_events_sf_dir, unicode_events_duck, name
):
    spec = REGISTRY[name]
    assert_frames_match(
        name,
        spec.fn(spark, unicode_events_sf_dir).toPandas(),
        unicode_events_duck.execute(spec.oracle).df(),
    )

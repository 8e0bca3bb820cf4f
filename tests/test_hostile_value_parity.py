"""Adversarial VALUE-fixture parity: the NULL-injection harness
(test_null_fixture_parity) covers missing data, but round 6's fuzzy
ANSI crash (a one-token document blowing up an ordinal array
subscript) showed a second latent-break class — hostile PRESENT
values the fixtures never contain.  This harness rebuilds the sf0.001
star schema with degenerate values deterministically injected into
the hot columns and re-runs the driver-strength compare:

  documents.text  — empty, whitespace-only, single-token, two-token
                    strings (break tokenizers, shingles, prefixes);
  documents.lang  — empty string (NOT NULL — a distinct hazard:
                    equi-joins keep it, NULL filters don't drop it);
  events.props    — malformed JSON, empty string, empty object
                    (get_json_object / json_extract must both yield
                    NULL, not throw);
  events.value    — 0.0 and negative (ratio and sign edge cases);
  events          — duplicated (user_id, ts) with distinct event_id
                    (window tie-breaks, SCD2 same-ts episodes).
"""

from __future__ import annotations

import duckdb as _duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from realtime_data_pipeline_spark.plans.registry import REGISTRY
from realtime_data_pipeline_spark.tables import TABLE_NAMES

from conftest import SF_DIR
from test_oracle_parity import assert_frames_match

_TEXTS = ["", "   ", "solo", "two tokens", "a b"]
_PROPS = ["not json at all", "", "{}", '{"k": null}']


def _mutate(name: str, t: pa.Table) -> pa.Table:
    n = t.num_rows
    cols = {f.name: t[f.name] for f in t.schema}
    if name == "documents":
        text = cols["text"].to_pylist()
        lang = cols["lang"].to_pylist()
        for i in range(0, n, 7):
            text[i] = _TEXTS[(i // 7) % len(_TEXTS)]
        for i in range(0, n, 11):
            lang[i] = ""
        cols["text"] = pa.array(text, type=t.schema.field("text").type)
        cols["lang"] = pa.array(lang, type=t.schema.field("lang").type)
        # n_chars must stay consistent with the mutated text — several
        # queries treat it as derived
        cols["n_chars"] = pa.array(
            [len(x) if x is not None else None for x in text],
            type=t.schema.field("n_chars").type,
        )
    elif name == "events":
        props = cols["props"].to_pylist()
        value = cols["value"].to_pylist()
        for i in range(0, n, 13):
            props[i] = _PROPS[(i // 13) % len(_PROPS)]
        for i in range(0, n, 17):
            value[i] = 0.0
        for i in range(0, n, 19):
            value[i] = -5.0
        cols["props"] = pa.array(props, type=t.schema.field("props").type)
        cols["value"] = pa.array(value, type=t.schema.field("value").type)
        # duplicate (user_id, ts) under fresh event_ids: replicate the
        # first 20 rows with event_id shifted beyond the id space
        head = {k: v.to_pylist()[:20] for k, v in cols.items()}
        max_id = max(cols["event_id"].to_pylist()) + 1
        head["event_id"] = [max_id + i for i in range(len(head["event_id"]))]
        # a different event_type on the clone makes same-ts ties
        # VISIBLE (SCD2 band flaps, transition matrices)
        head["event_type"] = [
            "click" if et != "click" else "view"
            for et in head["event_type"]
        ]
        cols = {
            k: pa.concat_arrays(
                [
                    pa.array(v.to_pylist(), type=t.schema.field(k).type)
                    if not isinstance(v, pa.ChunkedArray)
                    else pa.concat_arrays(v.chunks),
                    pa.array(head[k], type=t.schema.field(k).type),
                ]
            )
            for k, v in cols.items()
        }
    return pa.table(cols, schema=t.schema)


_QUERIES = sorted(
    name
    for name, spec in REGISTRY.items()
    if spec.oracle is not None and "streaming" not in (spec.tags or ())
)

# streaming twins replayed once over the hostile values: malformed
# JSON must flow through the wire path (to_json -> text stream ->
# from_json) as NULL item_ids, never a parse crash, and the
# partitioned corpus sink must collapse '' langs to NULL exactly as
# its nullif-guarded oracle declares
_QUERIES += [
    "streaming_json_wire_counts",
    "streaming_replay_user_counts",
    "streaming_corpus_materialized_stats",
    # stateful driver-window twins: degenerate texts flow through the
    # persistent signature store / SCD2 sink too
    "streaming_incremental_dedup",
    "streaming_scd2_user_segments",
    # VERDICT r6 #4: the remaining driver-window streaming twins —
    # session windows over same-ts duplicate storms, and the
    # stream-static enrichment join over degenerate keys
    "streaming_session_counts",
    "streaming_enriched_segment_counts",
    # staged round-8 rotate-in: the streaming heavy-hitter state over
    # empty/1-token documents
    "streaming_frequent_terms",
]


@pytest.fixture(scope="module")
def hostile_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_hostile")
    for name in TABLE_NAMES:
        t = pq.read_table(f"{SF_DIR}/{name}.parquet")
        if name in ("documents", "events"):
            t = _mutate(name, t)
        pq.write_table(t, f"{d}/{name}.parquet")
    return str(d)


@pytest.fixture(scope="module")
def hostile_duck(hostile_sf_dir):
    con = _duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{hostile_sf_dir}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _QUERIES)
def test_parity_survives_hostile_values(
    spark, hostile_sf_dir, hostile_duck, name
):
    spec = REGISTRY[name]
    assert_frames_match(
        name,
        spec.fn(spark, hostile_sf_dir).toPandas(),
        hostile_duck.execute(spec.oracle).df(),
    )

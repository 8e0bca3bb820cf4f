"""Adversarial NULL-fixture parity: the driver's testdata has so far
carried few NULLs, so a query whose Spark/DuckDB parity silently
depends on that (ADVICE r4: "breaks if a regenerated testdata round
ever contains such a row") is a latent correctness failure.  This
harness rebuilds the sf0.001 star schema with NULLs deterministically
injected into every nullable hot column and re-runs the EXACT
driver-strength compare (same normalizer as test_oracle_parity) for
the round-5 query families over the hostile data.

Known engine divergences this flushes out:
  * window ORDER BY a NULLable column — Spark defaults NULLS FIRST
    ascending, DuckDB defaults NULLS LAST;
  * NULL group keys — Spark groupBy buckets them, SQL equi-joins drop
    them;
  * NULL-propagating arithmetic inside conditional sums.
"""

from __future__ import annotations

import duckdb as _duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from realtime_data_pipeline_spark.plans.registry import REGISTRY
from realtime_data_pipeline_spark.tables import TABLE_NAMES

from conftest import SF_DIR
from test_oracle_parity import assert_frames_match

# column -> every Nth row nulled (primes, so combinations overlap)
_NULL_RULES = {
    "events": {"value": 5, "props": 17, "user_id": 13, "ts": 19},
    "documents": {"text": 7, "lang": 11, "source": 23},
    # ADVICE r5: embedding_health_report exists to COUNT NULL
    # embeddings, yet no fixture contained one — the DuckDB
    # list_prepend-on-NULL hazard was invisible
    "embeddings": {"embedding": 7, "label": 11},
}

# ADVICE r6: whole-NULL vectors were injected above, but an embedding
# CONTAINING a NULL element is a distinct hazard class — Arrow float64
# conversion turns the element into NaN, and Spark ranks NaN ABOVE
# every double while the SQL twin's NULL ranks last.  Every 29th
# embedding row (co-prime with the whole-NULL stride 7) gets one
# element nulled at a row-dependent position.
_ELEMENT_NULL_STRIDE = 29

# every oracle-carrying batch query — streaming replays exercise the
# same operators through their batch twins and are skipped for runtime
# EXCEPT the cheapest few (below), which close the loop on the
# streaming twins themselves (VERDICT r5 item 5)
_QUERIES = sorted(
    name
    for name, spec in REGISTRY.items()
    if spec.oracle is not None and "streaming" not in (spec.tags or ())
)

# cheapest streaming-tagged queries, replayed once over the hostile
# fixtures: the batch oracles they share with their twins do not prove
# the STREAMING path (json wire decode, watermarked replay, keyed
# upsert) survives NULL-riddled input
_STREAMING_NULL_QUERIES = [
    "streaming_json_wire_counts",
    "streaming_replay_user_counts",
    "streaming_dedup_user_counts",
    # the round-6 driver-window streaming rotate-ins: the persistent
    # signature store, the SCD2 maintenance sink, and the enriched
    # stream-static join each hold state that NULL-riddled input
    # could corrupt in ways their batch twins cannot show
    "streaming_incremental_dedup",
    "streaming_scd2_user_segments",
    "streaming_enriched_segment_counts",
    # VERDICT r6 #4: the last driver-window streaming twin missing
    # from this replay list — session-window merge state over
    # NULL-riddled user ids and timestamps
    "streaming_session_counts",
    # staged round-8 rotate-in: update-mode additive term counts must
    # converge to the batch MG oracle over NULL-riddled documents
    "streaming_frequent_terms",
]
_QUERIES += _STREAMING_NULL_QUERIES


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_nulls")
    for name in TABLE_NAMES:
        t = pq.read_table(f"{SF_DIR}/{name}.parquet")
        rules = _NULL_RULES.get(name, {})
        if rules:
            n = t.num_rows
            cols = {}
            for field in t.schema:
                col = t[field.name]
                if field.name in rules:
                    k = rules[field.name]
                    mask = pa.array([i % k == 0 for i in range(n)])
                    col = pc.if_else(mask, pa.nulls(n, field.type), col)
                cols[field.name] = col
            t = pa.table(cols, schema=t.schema)
        if name == "embeddings":
            emb_field = t.schema.field("embedding")
            vecs = t["embedding"].to_pylist()
            for i in range(0, len(vecs), _ELEMENT_NULL_STRIDE):
                if vecs[i]:  # skip whole-NULL rows from the rule above
                    vecs[i] = list(vecs[i])
                    vecs[i][i % len(vecs[i])] = None
            t = t.set_column(
                t.schema.get_field_index("embedding"),
                emb_field,
                pa.array(vecs, type=emb_field.type),
            )
        pq.write_table(t, f"{d}/{name}.parquet")
    return str(d)


@pytest.fixture(scope="module")
def null_duck(null_sf_dir):
    con = _duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{null_sf_dir}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _QUERIES)
def test_parity_survives_null_injection(spark, null_sf_dir, null_duck, name):
    spec = REGISTRY[name]
    assert_frames_match(
        name,
        spec.fn(spark, null_sf_dir).toPandas(),
        null_duck.execute(spec.oracle).df(),
    )


# time-sensitive sequence/calendar operators, re-checked with the
# session timezone ALSO hostile — NULL handling and tz-immunity can
# interact (a NULL-ordering fix that leaned on a tz-dependent cast
# would pass each audit separately and fail their combination)
_TZ_SENSITIVE = [
    "scd2_user_segment_history",
    "scd2_pointintime_enrichment",
    "pagerank_top_items",
    "item_covisitation_pairs",
    "event_transition_matrix",
    "event_type_islands",
    "daily_anomaly_report",
    "hourly_seasonality_profile",
    "user_feature_vectors",
    "purchase_window_views",
]


@pytest.mark.parametrize("name", _TZ_SENSITIVE)
def test_parity_survives_nulls_under_hostile_timezone(
    spark, null_sf_dir, null_duck, name
):
    saved = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
        spec = REGISTRY[name]
        assert_frames_match(
            name,
            spec.fn(spark, null_sf_dir).toPandas(),
            null_duck.execute(spec.oracle).df(),
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)

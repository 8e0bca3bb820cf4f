"""Unit + model checks for the plans/lake.py wave: snapshot diff
classification, range-join boundary semantics, a pure-Python
fixed-point PageRank twin, and a brute-force pairwise AUC oracle.
"""

from __future__ import annotations

import datetime as dt
import json

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from realtime_data_pipeline_spark.operators import snapshot
from realtime_data_pipeline_spark.plans.registry import REGISTRY

from conftest import SF_DIR


# ---------------------------------------------------------------------------
# snapshot_diff classification
# ---------------------------------------------------------------------------


def test_snapshot_diff_classifies_all_four_statuses(spark):
    a = spark.createDataFrame(
        [(1, "fp1", "en"), (2, "fp2", "en"), (3, "fp3", "de")],
        "doc_id long, fp string, lang string",
    )
    b = spark.createDataFrame(
        [(1, "fp1", "en"), (2, "fp2-CHANGED", "en"), (4, "fp4", "fr")],
        "doc_id long, fp string, lang string",
    )
    rows = {
        r["doc_id"]: (r["status"], r["lang"])
        for r in snapshot.snapshot_diff(
            a, b, key="doc_id", fingerprint="fp", carry=["lang"]
        ).collect()
    }
    assert rows == {
        1: ("unchanged", "en"),
        2: ("changed", "en"),
        3: ("removed", "de"),
        4: ("added", "fr"),
    }


# ---------------------------------------------------------------------------
# purchase_window_views: planted window-boundary semantics
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def _write_events(tmp_path, rows):
    t0 = dt.datetime(2024, 1, 10, 0, 0, 0)
    recs = []
    for i, (etype, item, offset_us) in enumerate(rows):
        recs.append(
            {
                "event_id": i,
                "ts": t0 + dt.timedelta(microseconds=offset_us),
                "user_id": i % 3,
                "event_type": etype,
                "value": 1.0,
                "props": json.dumps({"k": item}),
            }
        )
    pdf = pd.DataFrame(recs)
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
        f"{tmp_path}/events.parquet",
    )
    return str(tmp_path)


def test_range_join_window_boundaries(spark, tmp_path):
    # purchase at offset 2*DAY; the 24h look-back is [DAY, 2*DAY)
    p = 2 * _DAY_US
    d = _write_events(
        tmp_path,
        [
            ("purchase", 7, p),
            ("view", 7, p - _DAY_US),  # exactly at lower bound -> IN
            ("view", 7, p - _DAY_US - 1),  # 1us below -> OUT
            ("view", 7, p - 1),  # 1us before purchase -> IN
            ("view", 7, p),  # at purchase instant -> OUT
            # 12h before: inside the range but in the PREVIOUS calendar
            # bucket relative to the purchase's own bucket -> the
            # 2-bucket explode must catch it
            ("view", 7, p - _DAY_US // 2),
            ("view", 8, p - 1000),  # other item -> OUT
        ],
    )
    rows = REGISTRY["purchase_window_views"].fn(spark, d).collect()
    assert len(rows) == 1
    assert rows[0]["n_prior_views"] == 3


# ---------------------------------------------------------------------------
# pagerank_top_items: independent pure-Python fixed-point twin
# ---------------------------------------------------------------------------


def _python_pagerank(sf_dir, total=10**12, iters=3, top=20):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev["item"] = ev["props"].map(lambda s: str(json.loads(s)["k"]))
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    edges = set()
    for _, grp in ev.groupby("user_id"):
        items = grp["item"].tolist()
        for a, b in zip(items, items[1:]):
            if a is not None and b is not None and a != b:
                edges.add((a, b))
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    outdeg = {}
    for a, _ in edges:
        outdeg[a] = outdeg.get(a, 0) + 1
    pr = {v: total // n for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for a, b in edges:
            s[b] += pr[a] // outdeg[a]
        pr = {v: (15 * total) // (100 * n) + (85 * s[v]) // 100 for v in nodes}
    ranked = sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    return dict(ranked)


def test_pagerank_matches_python_model_exactly(spark):
    got = {
        r["item"]: r["pr_fp"]
        for r in REGISTRY["pagerank_top_items"].fn(spark, SF_DIR).collect()
    }
    want = _python_pagerank(SF_DIR)
    assert got == want


# ---------------------------------------------------------------------------
# model_eval_report: brute-force pairwise AUC oracle
# ---------------------------------------------------------------------------


def test_auc_matches_bruteforce_pairwise(spark):
    import duckdb

    rows = REGISTRY["model_eval_report"].fn(spark, SF_DIR).collect()
    aucs = {r["auc"] for r in rows}
    assert len(aucs) == 1  # constant column
    got = aucs.pop()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    sc = con.execute(
        """
        SELECT coalesce(lang = 'en', FALSE) AS label,
               zv / (1 + abs(zv)) AS score
        FROM (SELECT lang,
                     CAST(-1.0 AS DOUBLE)
                     + CAST(-0.002 AS DOUBLE) * n_chars
                     + CAST(0.05 AS DOUBLE)
                       * len(string_split_regex(trim(text), '\\s+'))
                     + CAST(0.08 AS DOUBLE)
                       * len(list_distinct(
                             string_split_regex(trim(text), '\\s+'))) AS zv
              FROM documents WHERE text IS NOT NULL)
        """
    ).df()
    pos = sc[sc.label].score.to_numpy()
    neg = sc[~sc.label].score.to_numpy()
    if len(pos) == 0 or len(neg) == 0:
        pytest.skip("degenerate label split in fixture")
    # O(P*N) pairwise count: concordant + half-credit ties — a genuinely
    # different algorithm from the rank-sum the query uses
    wins = sum((p > neg).sum() + 0.5 * (p == neg).sum() for p in pos)
    brute = round(wins / (len(pos) * len(neg)), 6)
    assert got == pytest.approx(brute, abs=1e-6)


def test_calibration_bins_partition_the_corpus(spark):
    rows = REGISTRY["model_eval_report"].fn(spark, SF_DIR).collect()
    assert all(0 <= r["bin"] <= 9 for r in rows)
    assert all(0 <= r["n_pos"] <= r["n"] for r in rows)
    assert all(r["score_lo"] <= r["score_hi"] for r in rows)
    # bins tile the score axis without overlap
    by_bin = sorted(rows, key=lambda r: r["bin"])
    for a, b in zip(by_bin, by_bin[1:]):
        assert a["score_hi"] <= b["score_lo"]


# ---------------------------------------------------------------------------
# SCD Type-2: merge == rebuild slicing property + guards
# ---------------------------------------------------------------------------


def _dim_key(t):
    # effective_to can be None (open episode) — order opens last so
    # tied-start episodes still sort deterministically
    u, a, s_, e, cur = t
    return (u, a, s_, e is None, e or s_, cur)


def _collect_dim(dim):
    return sorted(
        (
            (
                r["user_id"],
                r["event_type"],
                r["effective_from"],
                r["effective_to"],
                r["is_current"],
            )
            for r in dim.collect()
        ),
        key=_dim_key,
    )


def test_scd2_episodes_planted(spark):
    from realtime_data_pipeline_spark.operators import scd

    t = dt.datetime(2024, 1, 1)
    rows = [
        (1, "a", t, 1),
        (1, "a", t + dt.timedelta(minutes=1), 2),  # repeat -> same episode
        (1, "b", t + dt.timedelta(minutes=2), 3),  # change
        (2, "x", t, 4),  # single-episode key
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp_ntz, event_id long"
    )
    dim = scd.scd2_from_history(
        df, "user_id", "event_type", ts_col="ts", tiebreak="event_id"
    )
    got = _collect_dim(dim)
    assert got == sorted(
        [
            (1, "a", t, t + dt.timedelta(minutes=2), False),
            (1, "b", t + dt.timedelta(minutes=2), None, True),
            (2, "x", t, None, True),
        ]
    )


@pytest.mark.parametrize("frac", [0.25, 0.5, 0.9])
def test_scd2_merge_equals_rebuild_at_any_cut(spark, frac):
    from realtime_data_pipeline_spark.operators import scd

    ev = (
        pq.read_table(f"{SF_DIR}/events.parquet")
        .to_pandas()
        .sort_values("ts")
    )
    cut = ev["ts"].iloc[int(len(ev) * frac)]
    log = REGISTRY["scd2_user_segment_history"]  # ensure module import
    assert log is not None
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark.plans.registry import _events

    full = _events(spark, SF_DIR).select(
        "user_id", "event_type", "ts", "event_id"
    )
    before = full.where(F.col("ts") <= F.lit(cut))
    after = full.where(F.col("ts") > F.lit(cut))
    dim_t = scd.scd2_from_history(
        before, "user_id", "event_type", ts_col="ts", tiebreak="event_id"
    )
    merged = scd.scd2_merge(
        dim_t, after, "user_id", "event_type", ts_col="ts", tiebreak="event_id"
    )
    rebuilt = scd.scd2_from_history(
        full, "user_id", "event_type", ts_col="ts", tiebreak="event_id"
    )
    assert _collect_dim(merged) == _collect_dim(rebuilt)


def test_scd2_merge_rejects_history_rewrites(spark):
    from realtime_data_pipeline_spark.operators import scd

    t = dt.datetime(2024, 1, 1)
    log = spark.createDataFrame(
        [(1, "a", t, 1), (1, "b", t + dt.timedelta(hours=1), 2)],
        "user_id long, event_type string, ts timestamp_ntz, event_id long",
    )
    dim = scd.scd2_from_history(
        log, "user_id", "event_type", ts_col="ts", tiebreak="event_id"
    )
    late = spark.createDataFrame(
        [(1, "c", t + dt.timedelta(minutes=30), 3)],
        "user_id long, event_type string, ts timestamp_ntz, event_id long",
    )
    with pytest.raises(ValueError, match="predate"):
        scd.scd2_merge(
            dim, late, "user_id", "event_type", ts_col="ts", tiebreak="event_id"
        )


def test_scd2_sink_redelivered_batch_is_idempotent(spark, tmp_path):
    """A replayed micro-batch recomputes its version from the SAME
    predecessor and overwrites it — the dimension read back is unchanged
    (the batch-keyed exactly-once discipline of streaming/scd_sink.py)."""
    from realtime_data_pipeline_spark.operators import scd
    from realtime_data_pipeline_spark.streaming import scd_sink

    t = dt.datetime(2024, 1, 1)
    b0 = spark.createDataFrame(
        [(1, "a", t, 1), (2, "x", t, 2)],
        "user_id long, event_type string, ts timestamp_ntz, event_id long",
    )
    b1 = spark.createDataFrame(
        [(1, "b", t + dt.timedelta(hours=1), 3)],
        "user_id long, event_type string, ts timestamp_ntz, event_id long",
    )
    dim_dir = str(tmp_path / "dim")

    def apply_batch(batch_df, batch_id):
        older = [v for v in scd_sink._versions(dim_dir) if v < batch_id]
        prev = (
            spark.read.parquet(f"{dim_dir}/v{older[-1]}") if older else None
        )
        dim = (
            scd.scd2_from_history(
                batch_df, "user_id", "event_type", "ts", "event_id"
            )
            if prev is None
            else scd.scd2_merge(
                prev, batch_df, "user_id", "event_type", "ts", "event_id"
            )
        )
        dim.write.mode("overwrite").parquet(f"{dim_dir}/v{batch_id}")

    apply_batch(b0, 0)
    apply_batch(b1, 1)
    first = _collect_dim(scd_sink.read_scd2_dim(spark, dim_dir))
    apply_batch(b1, 1)  # redelivery
    second = _collect_dim(scd_sink.read_scd2_dim(spark, dim_dir))
    assert first == second
    assert scd_sink._versions(dim_dir) == [0, 1]
    # and the converged dim is the full-log rebuild
    full = scd.scd2_from_history(
        b0.unionByName(b1), "user_id", "event_type", "ts", "event_id"
    )
    assert first == _collect_dim(full)


# ---------------------------------------------------------------------------
# scd2_pointintime_enrichment: band flap WITHIN one timestamp (ADVICE r5)
# ---------------------------------------------------------------------------


def test_scd2_pointintime_survives_same_ts_band_flap(spark, tmp_path):
    """A user whose value band flaps within a single timestamp makes
    scd2_from_history emit a zero-length episode sharing effective_from
    with the open one; before the r6 fix the as-of join's max(band)
    tie-break could pick the CLOSED (zero-length) episode's band where
    the oracle's interval-containment join picks the open one.  Pin
    Spark == DuckDB on a fixture that plants exactly that flap.
    """
    import duckdb

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: 'low' then, at the SAME ts, low->high flap (event_id
        # orders them high-after-low so the open episode is 'high' —
        # max(band)='low' would be the wrong tie-break answer is 'low'
        # < 'high' lexically, so flip: plant both directions)
        (1, t0, 1, "view", 10.0, "{}"),          # low episode
        (2, t0 + dt.timedelta(minutes=5), 1, "click", 90.0, "{}"),  # -> high
        (3, t0 + dt.timedelta(minutes=5), 1, "click", 20.0, "{}"),  # -> low (same ts!)
        (4, t0 + dt.timedelta(minutes=9), 1, "purchase", 5.0, "{}"),
        # user 2: the mirror flap (ends high) — covers the other
        # max(band) tie-break direction
        (5, t0, 2, "view", 80.0, "{}"),           # high episode
        (6, t0 + dt.timedelta(minutes=5), 2, "click", 20.0, "{}"),  # -> low
        (7, t0 + dt.timedelta(minutes=5), 2, "click", 95.0, "{}"),  # -> high (same ts!)
        (8, t0 + dt.timedelta(minutes=9), 2, "purchase", 5.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).select("event_id", "ts", "user_id", "event_type", "value", "props")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )

    spec = REGISTRY["scd2_pointintime_enrichment"]
    got = sorted(
        (r["band"], r["event_type"], r["n_events"])
        for r in spec.fn(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    want = sorted(
        (b, et, int(n)) for b, et, n in con.execute(spec.oracle).fetchall()
    )
    con.close()
    assert got == want


# ---------------------------------------------------------------------------
# scd2_from_history: hypothesis model check vs a pure-Python interval fold
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_scd_logs = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user
        st.sampled_from(["a", "b", "c"]),  # attr
        st.integers(min_value=0, max_value=5),  # coarse ts -> forced ties
    ),
    min_size=1,
    max_size=12,
)


def _python_scd2(rows):
    """Reference model: sort per key by (ts, seq), collapse equal-attr
    runs, close each episode at the next episode's start."""
    out = []
    by_user = {}
    for seq, (u, a, t) in enumerate(rows):
        by_user.setdefault(u, []).append((t, seq, a))
    for u, obs in by_user.items():
        obs.sort()
        eps = []  # (attr, start_ts)
        for t, _, a in obs:
            if not eps or eps[-1][0] != a:
                eps.append((a, t))
        for i, (a, start) in enumerate(eps):
            nxt = eps[i + 1][1] if i + 1 < len(eps) else None
            out.append((u, a, start, nxt, nxt is None))
    return sorted(out, key=lambda t: (t[0], t[1], t[2], t[3] is None, t[3] or t[2]))


@given(_scd_logs)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_matches_python_model(spark, rows):
    from realtime_data_pipeline_spark.operators import scd

    base = dt.datetime(2024, 1, 1)
    data = [
        (u, a, base + dt.timedelta(hours=t), seq)
        for seq, (u, a, t) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "user_id long, event_type string, ts timestamp_ntz, event_id long",
    )
    dim = scd.scd2_from_history(
        df, "user_id", "event_type", ts_col="ts", tiebreak="event_id"
    )
    got = sorted(
        (
            (
                r["user_id"],
                r["event_type"],
                r["effective_from"],
                r["effective_to"],
                r["is_current"],
            )
            for r in dim.collect()
        ),
        key=_dim_key,
    )
    want = [
        (
            u,
            a,
            base + dt.timedelta(hours=s),
            None if e is None else base + dt.timedelta(hours=e),
            cur,
        )
        for u, a, s, e, cur in _python_scd2(rows)
    ]
    assert got == sorted(want, key=_dim_key)


def test_scd2_sink_vacuum_bounds_store_growth(spark, tmp_path):
    """10 micro-batches with retain_versions=3: the store never holds
    more than 3 snapshots after a commit, and the surviving newest
    snapshot still equals the full-log rebuild (vacuum only discards
    HISTORY OF SNAPSHOTS, never dimension content)."""
    from realtime_data_pipeline_spark.operators import scd
    from realtime_data_pipeline_spark.streaming import scd_sink

    t0 = dt.datetime(2024, 1, 1)
    batches = []
    rows_all = []
    for b in range(10):
        rows = [
            (
                u,
                "abc"[(b + u) % 3],
                t0 + dt.timedelta(hours=b, minutes=u),
                b * 10 + u,
            )
            for u in range(3)
        ]
        rows_all += rows
        batches.append(
            spark.createDataFrame(
                rows,
                "user_id long, event_type string, ts timestamp_ntz, "
                "event_id long",
            )
        )
    dim_dir = str(tmp_path / "dim")

    for batch_id, bdf in enumerate(batches):
        older = [v for v in scd_sink._versions(dim_dir) if v < batch_id]
        prev = (
            spark.read.parquet(f"{dim_dir}/v{older[-1]}") if older else None
        )
        dim = (
            scd.scd2_from_history(
                bdf, "user_id", "event_type", "ts", "event_id"
            )
            if prev is None
            else scd.scd2_merge(
                prev, bdf, "user_id", "event_type", "ts", "event_id"
            )
        )
        dim.write.mode("overwrite").parquet(f"{dim_dir}/v{batch_id}")
        scd_sink.vacuum_versions(dim_dir, keep_last=3)
        assert len(scd_sink._versions(dim_dir)) <= 3

    assert scd_sink._versions(dim_dir) == [7, 8, 9]
    final = _collect_dim(scd_sink.read_scd2_dim(spark, dim_dir))
    full = scd.scd2_from_history(
        spark.createDataFrame(
            rows_all,
            "user_id long, event_type string, ts timestamp_ntz, "
            "event_id long",
        ),
        "user_id",
        "event_type",
        "ts",
        "event_id",
    )
    assert final == _collect_dim(full)


def test_stored_ivf_index_equals_inline_and_partitions_by_cell(
    spark, tmp_path
):
    """The persisted index serves byte-identical top-k to the inline
    operator on the same codebook, and the store really is laid out
    one directory per cell (the pruning unit a probe reads)."""
    import glob

    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import tables
    from realtime_data_pipeline_spark.functions import ann_index, similarity

    emb = tables.load_table(spark, SF_DIR, "embeddings")
    cent_pred = (F.col("vec_id") >= 8) & (F.col("vec_id") < 16)
    idx = str(tmp_path / "ivf")
    ann_index.build_ivf_index(emb, idx, cent_pred)

    cell_dirs = glob.glob(f"{idx}/assignments/cell=*")
    assert 1 <= len(cell_dirs) <= 8  # at most one dir per centroid

    stored = sorted(
        map(
            tuple,
            ann_index.query_ivf_index(
                spark, idx, F.col("vec_id") < 8, k=5
            ).collect(),
        )
    )
    inline = sorted(
        map(
            tuple,
            similarity.ivf_assigned_topk(
                emb, F.col("vec_id") < 8, cent_pred, k=5
            ).collect(),
        )
    )
    assert stored == inline


def test_python_datasource_rows_and_partitions(spark):
    """Row-level contract of the custom Python DataSource: the scan
    yields exactly synth_row(i) for i in [0, numRows), and the reader
    really plans the requested number of input partitions."""
    from realtime_data_pipeline_spark.sources import pydatasource

    pydatasource.register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("numRows", 100)
        .option("numPartitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    got = sorted(map(tuple, df.collect()))
    want = sorted(pydatasource.synth_row(i) for i in range(100))
    assert got == want


def test_python_datasource_streaming_emits_exact_rows(spark, tmp_path):
    """Streaming face of the custom source: micro-batches advance the
    offset by rowsPerBatch until the numRows cap; the materialized
    stream holds exactly synth_row(i) for i in [0, numRows) — offset
    bookkeeping loses and duplicates nothing."""
    import time

    from realtime_data_pipeline_spark.sources import pydatasource

    pydatasource.register(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("numRows", 200)
        .option("rowsPerBatch", 50)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_stream_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("pyds_stream_t").count() >= 200:
                break
            time.sleep(0.5)
        got = sorted(map(tuple, spark.table("pyds_stream_t").collect()))
    finally:
        q.stop()
    want = sorted(pydatasource.synth_row(i) for i in range(200))
    assert got == want


def test_missing_sidecar_index_fails_naming_assignments_path(
    spark, tmp_path
):
    """A store missing the _schema sidecar (pre-sidecar or partial
    build) must fail with the ORIGINAL error naming the assignments
    path — not a PATH_NOT_FOUND on _schema masking the cause
    (ADVICE r7)."""
    import pytest
    from pyspark.errors import AnalysisException

    from realtime_data_pipeline_spark.functions import ann_index

    idx = str(tmp_path / "no_such_index")
    with pytest.raises(AnalysisException) as exc_info:
        ann_index.read_index_assignments(spark, idx)
    assert "assignments" in str(exc_info.value)

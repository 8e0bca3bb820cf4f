"""Empty-input robustness: a representative query from each family must
run (not raise) over a star schema with ZERO rows and return a result
with the same schema it has on real data.  At 100 TB empty inputs are
routine — a new partition, a filtered-out day, a fresh tenant — and an
operator that divides by a count or assumes a non-empty window dies
there first.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from realtime_data_pipeline_spark.plans.registry import REGISTRY
from realtime_data_pipeline_spark.tables import TABLE_NAMES

from conftest import SF_DIR

# one per family: windows, TPC-H agg, multi-join, set op, as-of,
# ranks, dedup, LSH, text, training, behavioral, reshape
_QUERIES = [
    "sliding_user_counts",
    "pricing_summary",
    "revenue_by_nation",
    "click_and_purchase_users",
    "purchase_click_attribution",
    "customer_spend_distribution",
    "exact_dedup_groups",
    "minhash_dedup_candidates",
    "embedding_near_dups_lsh",
    "text_metrics",
    "train_split_counts",
    "funnel_conversion",
    "user_session_stats",
    "segment_event_pivot",
    "status_priority_grouping_sets",
    "split_leakage_audit",
    "documents_profile",
    "fuzzy_prefix_dups",
    "approx_quantiles_report",
    "pii_scrub_stats",
    "temperature_mixture_stats",
    "ffd_packing_report",
    # round-5 analytics module
    "bigram_lm_report",
    "doc_lm_scores",
    "term_postings_stats",
    "stratified_doc_sample",
    "rolling_daily_revenue",
    "user_activity_zscores",
    "source_overlap_matrix",
    "event_type_islands",
    "user_activity_trend",
    "lexical_diversity_correlation",
    "referential_integrity_audit",
    "embedding_quantization_report",
    "minhash_calibration_report",
    "doc_model_scores",
    "dedup_graph_stats",
    "ab_test_report",
    "event_type_lift",
    "term_source_association",
    "rfm_segments",
    "source_diversity_report",
    "event_transition_matrix",
    "ks_drift_report",
    # embedding-label audits + MG heavy hitters
    "knn_label_consistency",
    "hard_negative_report",
    "frequent_terms_report",
    "shared_chunk_report",
    # round-5 lifecycle/eval module (plans/lake.py)
    "corpus_snapshot_diff",
    "purchase_window_views",
    "pagerank_top_items",
    "model_eval_report",
    "scd2_user_segment_history",
    "join_skew_report",
    "doc_crossdup_rates",
    "k_anonymity_audit",
    "data_contract_violations",
    "daily_anomaly_report",
    "jsonl_roundtrip_stats",
    "multimodal_audio_stats",
    "scd2_pointintime_enrichment",
    "quality_funnel_stats",
    "user_feature_vectors",
    "hourly_seasonality_profile",
    "embedding_health_report",
    "item_covisitation_pairs",
    "langid_confusion_matrix",
    # round-6 driver-window rotate-ins not yet covered above
    "epoch_shuffle_sample",
    "ann_ivf_multiprobe_topk",
    "latest_event_per_user",
    "event_dedup_counts",
    "value_percentiles",
    "priority_metrics_unpivot",
    "corpus_curation_stats",
    "benchmark_contamination",
    "ann_recall_report",
    "forecast_revenue_change",
    "hll_partitioned_distinct",
    "pyds_synthetic_sample",
    "part_type_revenue_share",
    "nation_year_profit",
    "region_market_share",
    "ann_ivf_assigned_topk",
    "doc_repetition_scores",
    "curation_keep_best",
    "doc_chunks",
    "embedding_dedup_clusters",
    "large_quantity_orders",
    "idle_rich_customers",
    "csv_roundtrip_stats",
    # round-7 rotate-ins: materialization layers (persisted ANN index,
    # z-order rewrite, keyed-upsert time travel) must also survive a
    # zero-row corpus
    "ann_stored_index_topk",
    "zorder_roundtrip_stats",
    "upsert_time_travel_stats",
    # staged round-8 rotate-in: reads no star-schema table (pure
    # deterministic generator) so empty input is trivially moot, but
    # the self-enforcement list stays exhaustive
    "synthetic_events_batch_sample",
    # late-r7 ratchet: EVERY oracle-carrying batch query runs empty,
    # not just a per-family representative (self-enforced registry-wide
    # below) — the remaining 52
    "sliding_item_counts",
    "tumbling_user_counts",
    "kpi_avg_user_interactions",
    "kpi_item_extrema",
    "top_users",
    "latest_window_top_items",
    "recent_user_windows",
    "null_hygiene_count",
    "cast_hygiene",
    "event_type_stats",
    "top_unshipped_orders",
    "customers_with_orders",
    "customers_without_orders",
    "order_priority_rollup",
    "nation_top_customers",
    "customer_running_spend",
    "click_not_error_users",
    "event_user_segment_counts",
    "order_price_bands",
    "salted_segment_counts",
    "language_id",
    "doc_fingerprints",
    "dedup_clusters",
    "simhash_near_dups",
    "ngram_jaccard_pairs",
    "ann_bruteforce_topk",
    "multimodal_byte_histogram",
    "multimodal_frame_stats",
    "multimodal_decode_stats",
    "ann_pandas_topk",
    "tfidf_top_terms",
    "doc_length_buckets",
    "returned_revenue_top_customers",
    "customer_order_count_histogram",
    "brand_quantity_revenue",
    "sole_late_suppliers",
    "session_window_counts",
    "value_stats_by_type",
    "small_order_parts_revenue",
    "mixture_sample_stats",
    "sequence_packing_stats",
    "vocab_oov_rates",
    "shard_skew_stats",
    "weekly_cohort_retention",
    "ffd_packing_stats",
]


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """The sf0.001 star schema with zero rows in every table."""
    d = tmp_path_factory.mktemp("sf_empty")
    for name in TABLE_NAMES:
        schema = pq.read_schema(f"{SF_DIR}/{name}.parquet")
        pq.write_table(schema.empty_table(), f"{d}/{name}.parquet")
    return str(d)


def test_every_driver_window_query_is_empty_input_covered():
    """Self-enforcement: rotation cannot silently promote a query into
    the driver window without empty-input coverage.  Streaming twins
    are excluded (their replay harness is exercised on real data;
    empty-stream behavior is Spark's availableNow contract), as is the
    one deliberate loud-failure (kmeans training, pinned below)."""
    from realtime_data_pipeline_spark.plans import _DRIVER_WINDOW

    streaming = {
        n
        for n in _DRIVER_WINDOW
        if "streaming" in (REGISTRY[n].tags or ())
    }
    loud_failures = {"kmeans_codebook_report"}
    missing = (
        set(_DRIVER_WINDOW) - streaming - loud_failures - set(_QUERIES)
    )
    assert not missing, sorted(missing)


def test_every_batch_query_is_empty_input_covered():
    """Late-r7 ratchet: empty-input coverage is REGISTRY-WIDE —
    registering a batch query without adding it here fails, and pins
    for retired queries must be removed."""
    streaming = {n for n, s in REGISTRY.items() if "streaming" in (s.tags or ())}
    loud_failures = {"kmeans_codebook_report"}
    missing = set(REGISTRY) - streaming - loud_failures - set(_QUERIES)
    assert not missing, sorted(missing)
    stale = set(_QUERIES) - set(REGISTRY)
    assert not stale, f"coverage for retired queries: {sorted(stale)}"


def test_kmeans_codebook_raises_loudly_on_empty(spark, empty_sf_dir):
    """Deliberate exception to the runs-empty contract: TRAINING on an
    empty corpus must fail loudly (a silently empty codebook would
    poison every downstream ANN assignment), and the error must be the
    explicit guard, not an arbitrary downstream crash."""
    with pytest.raises(ValueError, match="empty vectors frame"):
        REGISTRY["kmeans_codebook_report"].fn(spark, empty_sf_dir)


@pytest.mark.parametrize("name", _QUERIES)
def test_runs_empty_with_stable_schema(spark, empty_sf_dir, name):
    spec = REGISTRY[name]
    on_empty = spec.fn(spark, empty_sf_dir)
    rows = on_empty.collect()  # must not raise
    on_real = spec.fn(spark, SF_DIR)
    assert on_empty.schema == on_real.schema, name
    # global aggregates collapse to one well-typed row; keyed results
    # collapse to zero rows; unpivoted reports keep one row per
    # reported unit — either way nothing null-explodes
    fixed_rows = {"documents_profile": 5}
    if name == "quality_funnel_stats":
        # one row per funnel stage, zero docs, zero survivors
        assert len(rows) == 5
        assert all(
            r["n_total"] == 0 and r["n_surviving"] == 0 for r in rows
        )
    elif name == "data_contract_violations":
        # one row per contract rule; zero rows checked, zero violations
        assert len(rows) == 8
        assert all(
            r["n_checked"] == 0 and r["n_violations"] == 0 for r in rows
        )
    elif name == "k_anonymity_audit":
        # one row per QI level; zero rows, no risky groups
        assert len(rows) == 2
        assert all(r["n_risky_groups"] == 0 for r in rows)
    elif name == "join_skew_report":
        # one row per audited key family, zero rows counted, ratio
        # columns NULL (no rows -> no average to report)
        assert len(rows) == 4
        assert all(r["n_rows"] == 0 and r["n_keys"] == 0 for r in rows)
    elif name == "ann_recall_report":
        # one row per ANN method; zero queries -> recall NULL, zero
        # candidates
        assert len(rows) == 5
        assert all(r["n_candidates"] == 0 for r in rows)
    elif name in fixed_rows:
        assert len(rows) == fixed_rows[name], (name, len(rows))
        # the profile must stay NUMERIC on empty input (n_nulls = 0,
        # not null — sum-over-zero-rows coalesced in the operator)
        assert all(r["n_nulls"] == 0 and r["n_distinct"] == 0 for r in rows)
    elif name in ("pyds_synthetic_sample", "synthetic_events_batch_sample"):
        # generator sources: emit their own rows regardless of table
        # emptiness — the schema-stability assert above is the check
        assert len(rows) == 5
    else:
        assert len(rows) in (0, 1) or name == "segment_event_pivot", (
            name,
            len(rows),
        )

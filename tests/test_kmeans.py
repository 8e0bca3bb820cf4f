"""Spherical k-means training (functions/kmeans.py): convergence on
separable data, Lloyd monotonicity, determinism, empty-vector hygiene.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from realtime_data_pipeline_spark.functions import kmeans
from realtime_data_pipeline_spark.tables import load_table

from conftest import SF_DIR


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return num / (na * nb)


@pytest.fixture(scope="module")
def separable(spark):
    """Two tight clusters on orthogonal axes (4-dim)."""
    rows = []
    for i in range(20):
        eps = (i % 5) * 0.01
        rows.append((i, [1.0, eps, 0.0, 0.0]))
        rows.append((100 + i, [0.0, 0.0, 1.0, eps]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_converges_to_cluster_axes(spark, separable):
    cents, history = kmeans.kmeans_fit(separable, k=2, n_iters=4)
    # each true axis direction is ~matched by exactly one centroid
    axes = ([1.0, 0.02, 0.0, 0.0], [0.0, 0.0, 1.0, 0.02])
    matches = [max(range(2), key=lambda c: _cos(axes[a], cents[c])) for a in range(2)]
    assert sorted(matches) == [0, 1]
    for a, c in zip(axes, (cents[m] for m in matches)):
        assert _cos(a, c) > 0.999
    # near-perfect fit on separable data
    assert history[-1] > 0.999


def test_objective_monotone_nondecreasing(spark, separable):
    _, history = kmeans.kmeans_fit(separable, k=2, n_iters=5)
    for a, b in zip(history, history[1:]):
        assert b >= a - 1e-9, history


def test_deterministic_across_runs(spark, separable):
    c1, h1 = kmeans.kmeans_fit(separable, k=2, n_iters=3)
    c2, h2 = kmeans.kmeans_fit(separable, k=2, n_iters=3)
    assert c1 == c2 and h1 == h2


def test_real_embeddings_improve_over_init(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    cents, history = kmeans.kmeans_fit(emb, k=8, n_iters=3)
    assert len(cents) == 8 and len(history) == 3
    assert history[-1] >= history[0] - 1e-9
    # every centroid stays unit-norm (spherical variant)
    for c in cents:
        assert abs(math.sqrt(sum(x * x for x in c)) - 1.0) < 1e-6


def test_empty_input_raises(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        kmeans.kmeans_fit(empty, k=2)


def _recall_at_5(spark, result_df, emb):
    """fraction of exact brute-force top-5 pairs the method returned"""
    from realtime_data_pipeline_spark.functions import similarity

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, F.col("vec_id") < 8, k=5)
        .select("query_id", "neighbor_id")
        .collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in result_df.select("query_id", "neighbor_id").collect()
    }
    return len(got & exact) / len(exact)


def test_trained_codebook_end_to_end_ivf(spark):
    """Train → assign → probe, with the claims training actually makes.

    The synthetic embeddings are STRUCTURELESS (uniform random), so
    recall under any k=8 partition is partition luck — an arbitrary
    codebook can "win" recall by chance (measured: 0.95 vs 0.825 on one
    draw, both with identical 492-candidate probes).  What training
    guarantees on any data is the quantization objective; what the
    operator must preserve is balance and probe correctness.  All
    quantities below are deterministic."""
    from realtime_data_pipeline_spark.functions import kmeans, similarity

    emb = load_table(spark, SF_DIR, "embeddings")
    pred = F.col("vec_id") < 8

    arbitrary = [
        r["emb_n"]
        for r in kmeans.normalized_points(emb).orderBy("vec_id").limit(8).collect()
    ]
    trained, history = kmeans.kmeans_fit(emb, k=8, n_iters=4)

    def _stats(cb):
        a = kmeans.assign_cells(kmeans.normalized_points(emb), cb)
        obj = a.agg(F.avg("cs")).first()[0]
        sizes = [r["count"] for r in a.groupBy("cell").count().collect()]
        return obj, sizes

    obj_arb, _ = _stats(arbitrary)
    obj_trn, sizes_trn = _stats(trained)
    # training strictly improves the quantization objective...
    assert obj_trn > obj_arb + 0.01, (obj_trn, obj_arb)
    # ...without degenerating the partition (largest cell bounded —
    # the property that keeps the probe sub-linear)
    n = sum(sizes_trn)
    assert max(sizes_trn) / n < 3.0 / len(trained), sizes_trn
    # and the trained probe returns well-formed, non-trivial results
    r_trn = _recall_at_5(
        spark, similarity.ivf_codebook_topk(emb, pred, trained), emb
    )
    assert r_trn > 0.3, r_trn

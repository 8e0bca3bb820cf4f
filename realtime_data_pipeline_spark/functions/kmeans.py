"""Spherical k-means (Lloyd) codebook training — the offline step the
IVF ANN family assumes (functions/similarity.ivf_assigned_topk takes
its codebook as given; this trains one).

The reference has no clustering at all; this is north-star surface for
the 100 TB embedding pipeline.  Spark-first shape, per iteration:

  * ASSIGNMENT is a pure map: the codebook (k × dim floats — a few KB)
    is inlined as a LITERAL array of structs, and each row's nearest
    centroid is an `aggregate()` argmax over that constant array.
    Zero shuffle, zero join, whole-stage codegen — at 100 TB the
    assignment pass is scan-bound.
  * RECENTROID is one partial+final aggregation: posexplode the
    normalized vector, sum per (cell, dimension) — map-side combine
    shrinks the exchange to k × dim rows per task — then regroup to
    k arrays.  The k × dim result is collected to the driver (the
    codebook IS driver-sized state, like ranks.py's P-row offsets) and
    re-normalized there.
  * spherical variant: vectors and centroids are L2-normalized, the
    objective is mean cosine to the assigned centroid — matching the
    cosine geometry every ANN operator here uses.  Lloyd monotonicity
    holds: the objective is non-decreasing per iteration (pinned by
    tests/test_kmeans.py and the kmeans_codebook_report invariants).

Determinism: init picks the k lowest-id vectors (seedless, identical
across engines/runs); argmax ties keep the lowest centroid id (strict
`>` against an id-ordered codebook); empty clusters keep their
previous centroid.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalize(vec: list[float]) -> list[float]:
    n = math.sqrt(sum(x * x for x in vec))
    return [x / n for x in vec] if n > 0 else vec


def _codebook_lit(cents: list[list[float]]):
    """Inline the codebook as a literal array<struct<cid,emb>>."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("cid"),
                F.array(*[F.lit(float(x)) for x in emb]).alias("emb"),
            )
            for i, emb in enumerate(cents)
        ]
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_cells(pts: DataFrame, cents: list[list[float]]) -> DataFrame:
    """(vec_id, emb_n) → (vec_id, emb_n, cell, cs): map-side argmax
    cosine against the literal codebook.  `emb_n` must be normalized
    (then dot == cosine)."""
    best = F.aggregate(
        _codebook_lit(cents),
        F.struct(
            F.lit(-2.0).alias("cs"), F.lit(-1).cast("int").alias("cid")
        ),
        lambda acc, c: F.when(
            _dot(F.col("emb_n"), c["emb"]) > acc["cs"],
            F.struct(
                _dot(F.col("emb_n"), c["emb"]).alias("cs"),
                c["cid"].alias("cid"),
            ),
        ).otherwise(acc),
    )
    return pts.withColumn("b", best).select(
        "vec_id", "emb_n", F.col("b.cid").alias("cell"), F.col("b.cs").alias("cs")
    )


def normalized_points(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, vec) → (vec_id, emb_n): L2-normalized double vectors,
    zero-norm rows dropped (they have no direction to cluster)."""
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return vectors.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double") / nrm).alias(
            "emb_n"
        ),
    ).where(nrm > 0)


def kmeans_fit(
    vectors: DataFrame,
    k: int,
    n_iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], list[float]]:
    """Train a spherical k-means codebook; returns (centroids,
    per-iteration mean-cosine objective history, length n_iters).

    The objective history is measured AFTER each recentroid step's
    assignment, so history[i] is the quality of centroids_i on the full
    data — non-decreasing by Lloyd's argument.
    """
    if vectors.select(id_col).first() is None:
        raise ValueError("kmeans_fit on an empty vectors frame")
    pts = normalized_points(vectors, id_col, vec_col).persist()
    # deterministic init: the k lowest-id vectors (no RNG — identical
    # across engines and runs; k rows collected, driver-sized)
    cents = [
        r["emb_n"]
        for r in pts.orderBy("vec_id").limit(k).collect()
    ]
    history: list[float] = []
    for _ in range(n_iters):
        assigned = assign_cells(pts, cents)
        # one pass computes the objective AND the per-(cell,dim) sums;
        # the exchange carries k*dim partials per task, not rows
        sums = (
            assigned.select(
                "cell", "cs", F.posexplode("emb_n").alias("pos", "v")
            )
            .groupBy("cell", "pos")
            .agg(
                F.sum("v").alias("s"),
                F.count("*").alias("n"),
                F.sum("cs").alias("cs_sum"),
            )
        )
        rows = (
            sums.groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "s"))
                ).alias("dims"),
                F.first("n").alias("n"),
                F.first("cs_sum").alias("cs_sum"),
            )
            .collect()
        )  # k rows x dim — the codebook itself, driver-sized by design
        total_n = sum(r["n"] for r in rows)
        total_cs = sum(r["cs_sum"] for r in rows)
        history.append(total_cs / total_n)
        new_cents = list(cents)  # empty clusters keep their centroid
        for r in rows:
            mean = [d["s"] / r["n"] for d in r["dims"]]
            new_cents[r["cell"]] = _normalize(mean)
        cents = new_cents
    pts.unpersist()
    return cents, history

"""Semantics pins for the embedding-label audit operators
(functions/similarity.knn_label_votes / hard_negative_margins) on
planted fixtures where the right answer is known by construction.

The sf0.01 oracle-parity test proves cross-engine agreement; these
prove the operators find what they exist to find: a mislabeled vector
is flagged (violation=1, inconsistent kNN vote), a clean cluster is
not, and a singleton label keeps the documented NULL-positive
contract instead of dropping the anchor."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from realtime_data_pipeline_spark.functions import similarity

_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)


def _planted(spark):
    """Two tight clusters on orthogonal axes + one mislabeled vector
    sitting inside cluster B + one singleton label off on its own."""
    rows = [
        # cluster A (label 0): near the x axis
        (0, [1.0, 0.02, 0.0], 0),
        (1, [1.0, 0.01, 0.0], 0),
        (2, [1.0, 0.03, 0.0], 0),
        # cluster B (label 1): near the y axis
        (3, [0.02, 1.0, 0.0], 1),
        (4, [0.01, 1.0, 0.0], 1),
        (5, [0.03, 1.0, 0.0], 1),
        # mislabeled: label 0 but geometrically inside cluster B
        (6, [0.02, 1.0, 0.01], 0),
        # singleton label: nothing shares label 2
        (7, [0.0, 0.0, 1.0], 2),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_knn_vote_flags_only_the_mislabeled_vector(spark):
    out = similarity.knn_label_votes(
        _planted(spark), F.lit(True), k=3
    ).collect()
    by_id = {r["query_id"]: r for r in out}
    assert len(by_id) == 8
    # the planted mislabel: its 3-NN are all label 1
    assert by_id[6]["consistent"] == 0
    assert by_id[6]["predicted_label"] == 1
    assert by_id[6]["n_votes"] == 3
    # clean cluster members vote their own label
    for vid in (0, 1, 2, 3, 4, 5):
        assert by_id[vid]["consistent"] == 1, by_id[vid]
    # the singleton can't be voted its own label (no second member)
    assert by_id[7]["consistent"] == 0


def test_hard_negative_margins_and_singleton_null_contract(spark):
    out = similarity.hard_negative_margins(_planted(spark), F.lit(True))
    rows = {r["query_id"]: r for r in out.collect()}
    assert len(rows) == 8
    # clean cluster anchor: positive margin, no violation
    assert rows[1]["violation"] == 0
    assert rows[1]["margin"] > 0
    assert rows[1]["pos_id"] in (0, 2)
    # mislabeled anchor: hardest negative (a true B member) is closer
    # than any same-label positive -> violation
    assert rows[6]["violation"] == 1
    assert rows[6]["margin"] < 0
    assert rows[6]["neg_id"] in (3, 4, 5)
    # singleton label: NULL positive side, violation stays 0
    assert rows[7]["pos_id"] is None
    assert rows[7]["cos_pos"] is None
    assert rows[7]["margin"] is None
    assert rows[7]["violation"] == 0


def test_null_label_and_embedding_rows_are_dropped(spark):
    base = _planted(spark)
    dirty = base.unionByName(
        spark.createDataFrame(
            [
                (100, [1.0, 0.0, 0.0], None),  # NULL label
                (101, None, 1),  # NULL embedding
            ],
            _SCHEMA,
        )
    )
    votes = similarity.knn_label_votes(dirty, F.lit(True), k=3)
    margins = similarity.hard_negative_margins(dirty, F.lit(True))
    for out in (votes, margins):
        ids = {r["query_id"] for r in out.collect()}
        assert ids == set(range(8)), ids


def test_real_nan_embedding_contract(spark):
    """The NaN==NULL conflation contract (ADVICE r7): a genuine NaN
    stored in an embedding is indistinguishable from an
    Arrow-converted NULL element inside pandas_topk's kernel, so the
    kernel scores it NULL (sorted last) — it must never emit NaN,
    which Spark would rank FIRST.  The ingest gate makes the class
    countable: embedding_health_report counts the vector in
    n_nonfinite."""
    import math

    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [1.0, 0.01, 0.0], 0),
        (2, [float("nan"), 1.0, 0.0], 0),   # real NaN element
        (3, [float("inf"), 1.0, 0.0], 0),   # real Inf element
        (4, None, 0),                        # whole-NULL vector
    ]
    df = spark.createDataFrame(rows, _SCHEMA)

    got = similarity.pandas_topk(df, F.col("vec_id") == 0, k=10).collect()
    # neighbor 1 scores ~1.0; NaN/NULL neighbors score NULL (never NaN)
    by_n = {r["neighbor_id"]: r["cos_sim"] for r in got}
    assert by_n[1] is not None and abs(by_n[1] - 1.0) < 1e-4
    assert by_n[2] is None and by_n[4] is None
    for v in by_n.values():
        assert v is None or not math.isnan(v)
    # NULL scores sort LAST under desc ranking
    ranked = sorted(got, key=lambda r: r["rnk"])
    assert ranked[0]["neighbor_id"] == 1

    # the gate counts the whole non-finite class (NaN + Inf, not the
    # whole-NULL vector — that one is n_null) via the same expression
    # q_embedding_health_report computes per label
    health = (
        df.select(
            "label",
            F.col("embedding").isNull().alias("is_null"),
            F.size("embedding").alias("d"),
            F.expr(
                "embedding is not null and exists(embedding, x -> "
                "isnull(x) or isnan(cast(x as double)) or "
                "abs(cast(x as double)) = double('infinity'))"
            ).alias("has_nonfinite"),
        )
        .agg(
            F.sum(F.when(F.col("has_nonfinite"), 1).otherwise(0)).alias(
                "n_nonfinite"
            ),
            F.sum(F.when(F.col("is_null"), 1).otherwise(0)).alias("n_null"),
        )
        .collect()[0]
    )
    assert health["n_nonfinite"] == 2 and health["n_null"] == 1

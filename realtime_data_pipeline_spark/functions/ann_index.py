"""Persisted IVF index: build once, serve many — the ANN serving path.

`similarity.ivf_assigned_topk` computes the centroid assignment inline
and notes that "at 100 TB the assignment is a materialized table next
to the vectors".  This module makes that literal:

* ``build_ivf_index`` writes the index to disk — the codebook (a
  k-row table) and the assignment table (vector + norm + cell),
  PARTITIONED BY cell.  Cell-partitioning is the point: a probe that
  touches nprobe cells reads nprobe directories, and Spark's dynamic
  partition pruning turns the probe join's broadcast side into a
  runtime partition filter on the stored side.
* ``query_ivf_index`` serves top-k from the stored index with EXACTLY
  the semantics of the inline operator (same rounded-cosine argmax
  assignment persisted at build time, same exact rerank), so the two
  are hash-comparable — the registry query shares
  ann_ivf_assigned_topk's DuckDB oracle verbatim.

Build cost: |V|·|C| map-side cosines + one vec_id shuffle + one
cell-partitioned write.  Serve cost: broadcast the query batch, join
only the probed cells.  Rebuilds are full-index overwrites (an IVF
index is derived data; incremental maintenance belongs to the
snapshot-diff + append path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_data_pipeline_spark.functions.similarity import (
    DOT_EXPR,
    _cosine,
    with_norm,
)


def build_ivf_index(
    vectors: DataFrame, index_dir: str, centroid_pred
) -> None:
    """Materialize codebook + cell-partitioned assignments under
    ``index_dir``.  ``centroid_pred`` selects the codebook rows (the
    stand-in for an offline-trained codebook, exactly as in
    similarity.ivf_assigned_topk — swap in kmeans_fit centroids for a
    trained one)."""
    e = with_norm(vectors)
    cents = F.broadcast(
        e.where(centroid_pred).select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cent_emb"),
            F.col("nrm").alias("cent_nrm"),
        )
    )
    cc = F.round(
        F.expr(DOT_EXPR.format(a="embedding", b="cent_emb"))
        / (F.col("nrm") * F.col("cent_nrm")),
        6,
    )
    assign = (
        e.select("vec_id", "embedding", "nrm")
        .crossJoin(cents)
        .select("vec_id", cc.alias("cc"), "cent_id")
        .groupBy("vec_id")
        .agg(
            F.max_by(
                "cent_id",
                F.struct(F.col("cc"), (-F.col("cent_id")).alias("nid")),
            ).alias("cell")
        )
    )
    ea = e.join(assign, "vec_id")
    ea.write.partitionBy("cell").mode("overwrite").parquet(
        f"{index_dir}/assignments"
    )
    # Schema sidecar: a partitionBy write of ZERO rows creates no
    # parquet files at all, so an empty-corpus build would leave a
    # store the serving path cannot even infer a schema from.  Persist
    # a 0-row, non-partitioned copy of the exact read-back shape (data
    # columns in order, partition column last) so reads of an empty
    # index return the correct empty frame instead of raising.
    ea.select(
        *[c for c in ea.columns if c != "cell"], "cell"
    ).limit(0).write.mode("overwrite").parquet(f"{index_dir}/_schema")
    cents.write.mode("overwrite").parquet(f"{index_dir}/codebook")


def read_index_assignments(spark: SparkSession, index_dir: str) -> DataFrame:
    # partition-column inference reads `cell` as INT; restore the
    # centroid id's LONG so stored-index results are schema-identical
    # to the inline operator's
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(f"{index_dir}/assignments")
    except AnalysisException as exc:
        # empty-corpus build: no partition dirs were written — serve
        # the 0-row frame from the schema sidecar.  A store MISSING
        # the sidecar (pre-sidecar build, partial write) must fail
        # with a message naming the assignments path, not a
        # PATH_NOT_FOUND on _schema that masks the original cause
        # (ADVICE r7) — so chain the original exception.
        try:
            df = spark.read.parquet(f"{index_dir}/_schema")
        except AnalysisException:
            raise exc from None
    return df.withColumn("cell", F.col("cell").cast("long"))


def query_ivf_index(
    spark: SparkSession, index_dir: str, query_pred, k: int = 5
) -> DataFrame:
    """Top-k from the stored index: broadcast the (bounded) query batch,
    equi-join its cells against the cell-partitioned store, exact
    rerank — byte-identical to similarity.ivf_assigned_topk on the
    same codebook."""
    ea = read_index_assignments(spark, index_dir)
    q = ea.where(query_pred).alias("q")
    c = ea.alias("c")
    pairs = F.broadcast(q).join(
        c,
        (F.col("q.cell") == F.col("c.cell"))
        & (F.col("q.vec_id") != F.col("c.vec_id")),
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        F.col("q.cell").alias("cell"),
        _cosine().alias("cs"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cs"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cell",
            "rnk",
            F.round(F.col("cs"), 6).alias("cos_sim"),
        )
    )

"""Arrow-batched inference: the mapInPandas kernel must equal the same
formula as a JVM expression (kernel parity), and batch_score must not
mutate its input's schema (StructType.add mutates in place — the
round-5 bug)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_data_pipeline_spark.functions.inference import (
    STUB_BIAS,
    STUB_WEIGHTS,
    batch_score,
)

from conftest import SF_DIR_MID


def _features(spark):
    docs = spark.read.parquet(f"{SF_DIR_MID}/documents.parquet")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )


def test_arrow_kernel_matches_jvm_expression(spark):
    feats = _features(spark)
    arrow = {
        r["doc_id"]: r["score"] for r in batch_score(feats).collect()
    }
    z = (
        F.lit(STUB_BIAS)
        + F.lit(STUB_WEIGHTS["n_chars"]) * F.col("n_chars")
        + F.lit(STUB_WEIGHTS["n_tokens"]) * F.col("n_tokens")
        + F.lit(STUB_WEIGHTS["n_distinct"]) * F.col("n_distinct")
    )
    jvm = {
        r["doc_id"]: r["score"]
        for r in feats.select(
            "doc_id", (z / (1 + F.abs(z))).alias("score")
        ).collect()
    }
    assert arrow == jvm and len(arrow) > 0  # bit-exact, not approx


def test_batch_score_does_not_mutate_input_schema(spark):
    feats = _features(spark)
    before = [f.name for f in feats.schema.fields]
    batch_score(feats)
    after = [f.name for f in feats.schema.fields]
    assert before == after == ["doc_id", "n_chars", "n_tokens", "n_distinct"]

"""Arrow-batched model inference — the "run a classifier over the
corpus" shape (quality/toxicity classifiers, reward models, embedding
encoders) that a 100 TB curation pipeline executes as its most
expensive stage.

Architecture (the part that matters at scale, independent of the
model):
  * features are computed JVM-side as exact expressions (token/char
    counts — whole-stage codegen, zero Python), so Python sees a
    NARROW numeric frame, never raw text;
  * the model runs inside `mapInPandas` — Arrow-batched columnar
    transfer, one Python invocation per batch (not per row), NumPy
    vectorized math inside;
  * the model handle is constructed LAZILY inside the generator (once
    per task, not per batch) — the swap-in point for a real
    torch/onnx session is `_load_model`; weights ship via closure
    (broadcast by Spark's task serialization, fine for small models;
    use SparkFiles/executor-local caches for multi-GB checkpoints).

The stub model is a LINEAR scorer squashed by the rational sigmoid
z/(1+|z|) — deliberately exp()-free: JVM/libm exp differ by ulps,
while +,*,/,abs are IEEE-exact, so the stub's scores are
bit-reproducible in ANY engine (the DuckDB oracle runs the same
formula) and the Arrow plumbing is verifiable end to end.  A real
model replaces `_load_model`/`_score_batch` only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType

# Stub "quality classifier": weights over (n_chars, n_tokens,
# n_distinct_tokens).  Chosen to produce both signs at test scale.
STUB_WEIGHTS = {"n_chars": -0.002, "n_tokens": 0.05, "n_distinct": 0.08}
STUB_BIAS = -1.0


def _load_model():
    """Swap-in point: return a callable batch scorer.  A real
    implementation loads a torch/onnx session here — ONCE per task."""

    def score(pdf: pd.DataFrame) -> pd.Series:
        z = (
            STUB_BIAS
            + STUB_WEIGHTS["n_chars"] * pdf["n_chars"]
            + STUB_WEIGHTS["n_tokens"] * pdf["n_tokens"]
            + STUB_WEIGHTS["n_distinct"] * pdf["n_distinct"]
        )
        return z / (1 + z.abs())

    return score


def batch_score(features: DataFrame, score_col: str = "score") -> DataFrame:
    """Score a narrow numeric feature frame with the (stub) model via
    mapInPandas.  Output = input schema + `score_col` double."""
    # Copy, don't .add(): StructType.add mutates in place, which would
    # corrupt the input DataFrame's cached schema object.
    out_schema = StructType(
        list(features.schema.fields)
        + [StructField(score_col, DoubleType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _load_model()  # once per task
        for pdf in batches:
            pdf[score_col] = model(pdf)
            yield pdf

    return features.mapInPandas(run, schema=out_schema)

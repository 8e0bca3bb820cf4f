"""Incremental MinHash-LSH dedup over a document stream.

The batch dedup family (functions/dedup.py) answers "which documents in
THIS corpus are near-copies of each other".  An ingestion pipeline asks
the harder rolling question: "is this NEW document a near-copy of
anything we have EVER accepted" — without re-scanning the corpus.  This
module is that operator as a `foreachBatch` stage:

  per micro-batch of incoming documents
    1. MinHash signatures (same affine family / constants as batch);
    2. LSH candidate probe of the batch's band buckets against the
       persistent SIGNATURE STORE — an equi-join on (band, bucket)
       against a parquet table that holds one row per accepted doc per
       band, NOT against the corpus text;
    3. signature-agreement estimate ≥ threshold ⇒ duplicate of an
       accepted doc → dropped;
    4. survivors are deduped WITHIN the batch (keep lowest doc_id per
       near-dup group, same banded join) — first-writer-wins matches
       the accepted-store semantics;
    5. novel docs append to the output table, their band rows append
       to the store.

Scale shape: the store is O(accepted docs × n_perms) rows of small
integers — tiny next to the text; the probe is the SAME bounded
equi-join as batch LSH (cost ∝ matching buckets, never corpus size);
both appends are blind parquet appends.  At 100 TB the store is
bucket-partitioned by (band, bucket % K) so the probe prunes
directories, and the hot-bucket skew cap applies exactly as in batch
(functions/dedup.py MAX_BUCKET_WIDTH).

Exactly-once: dropDuplicatesWithinWatermark upstream handles source
redelivery; a failed micro-batch replayed by the checkpoint re-probes
the SAME store state only if the appends are transactional — parquet
appends are not, so production puts the two appends in one table-format
transaction (Delta/Iceberg).  The test pins the semantic contract
(cross-batch and in-batch dedup, store growth); the transactionality
slot is documented, not faked.

Reference basis: dedup is a north-star extension (BASELINE.json); the
foreachBatch pattern mirrors the reference's per-batch Mongo upsert
loop (/root/reference/consumer/consumer.py:147-174).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_data_pipeline_spark.functions import dedup

DUP_MIN_AGREE = 6  # of N_PERMS=12 signature rows ⇒ est. Jaccard ≥ 0.5


def _band_rows(docs: DataFrame, n_perms: int) -> DataFrame:
    """(doc_id, sigs, band, bucket) — one row per doc per band."""
    sigs = dedup.minhash_signatures(docs, n_perms).select(
        "doc_id",
        F.array(*[f"sig{j}" for j in range(n_perms)]).alias("sigs"),
    )
    return sigs.select(
        "doc_id",
        "sigs",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("band"),
                    F.element_at("sigs", j + 1).alias("bucket"),
                )
                for j in range(n_perms)
            ])
        ).alias("b"),
    ).select("doc_id", "sigs", "b.band", "b.bucket")


def _agree(l_sigs, r_sigs):
    return F.size(
        F.filter(F.zip_with(l_sigs, r_sigs, lambda x, y: x == y), lambda m: m)
    )


def dedup_batch(
    batch: DataFrame,
    store_dir: str,
    out_dir: str,
    n_perms: int = dedup.N_PERMS,
    min_agree: int = DUP_MIN_AGREE,
) -> int:
    """Run one micro-batch through the incremental filter.

    Returns the number of novel docs accepted (driver-side metric for
    the monitor; the data itself moves executor-side only).
    """
    spark = batch.sparkSession
    rows = _band_rows(batch, n_perms).persist()

    # docs too short to shingle never produce band rows — they are
    # trivially novel (no near-dup evidence either way)
    sigless = batch.join(
        rows.select("doc_id").distinct(), "doc_id", "left_anti"
    )

    try:
        store = spark.read.parquet(store_dir)
        has_store = True
    except Exception:
        has_store = False

    dup_of_store = None
    if has_store:
        dup_of_store = (
            rows.alias("b")
            .join(
                store.alias("s"),
                (F.col("b.band") == F.col("s.band"))
                & (F.col("b.bucket") == F.col("s.bucket")),
            )
            .where(_agree(F.col("b.sigs"), F.col("s.sigs")) >= min_agree)
            .select(F.col("b.doc_id").alias("doc_id"))
            .distinct()
        )
        survivors = rows.join(dup_of_store, "doc_id", "left_anti")
    else:
        survivors = rows

    # in-batch dedup: drop any doc that near-matches a LOWER-id survivor
    # (first-writer-wins, consistent with the accepted store winning)
    in_batch_dup = (
        survivors.alias("l")
        .join(
            survivors.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .where(_agree(F.col("l.sigs"), F.col("r.sigs")) >= min_agree)
        .select(F.col("r.doc_id").alias("doc_id"))
        .distinct()
    )
    novel_rows = survivors.join(in_batch_dup, "doc_id", "left_anti")

    novel_docs = batch.join(
        novel_rows.select("doc_id").distinct(), "doc_id", "left_semi"
    ).unionByName(sigless)

    # production slot: both appends inside ONE table-format transaction
    novel_rows.select("doc_id", "sigs", "band", "bucket").write.mode(
        "append"
    ).parquet(store_dir)
    n_novel = novel_docs.count()
    if n_novel:
        novel_docs.write.mode("append").parquet(out_dir)
    rows.unpersist()
    return n_novel


def start_incremental_dedup(
    stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    n_perms: int = dedup.N_PERMS,
    min_agree: int = DUP_MIN_AGREE,
):
    """Attach the filter to a document stream (availableNow in tests)."""

    def _process(batch: DataFrame, _batch_id: int) -> None:
        dedup_batch(batch, store_dir, out_dir, n_perms, min_agree)

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

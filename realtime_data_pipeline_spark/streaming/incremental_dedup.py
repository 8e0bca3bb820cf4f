"""Incremental MinHash-LSH dedup over a document stream.

The batch dedup family (functions/dedup.py) answers "which documents in
THIS corpus are near-copies of each other".  An ingestion pipeline asks
the harder rolling question: "is this NEW document a near-copy of
anything we have EVER seen" — without re-scanning the corpus.  This
module is that operator as a `foreachBatch` stage.

Contract (deterministic, batch-split-invariant for id-ordered replay):
a document is DROPPED iff its MinHash signature agrees on >= min_agree
of n_perms rows with some EARLIER-SEEN document — any document from a
prior batch, or a lower-doc_id document in the same batch.  Matching is
direct (signature agreement), NOT transitive: the accepted set is
exactly {d : no e earlier than d with agree(d, e) >= min_agree}, which
is what the one-doc-at-a-time online filter would compute, and is
directly expressible in ANSI SQL (the driver oracle in
plans/streaming_queries.py mirrors it as a NOT EXISTS over the banded
pair join).  To make the earlier-seen set well-defined under chained
near-dups (A~B, B~C, A!~C: B is dropped for A, C is still dropped for
matching B), the signature store holds band rows for ALL seen docs —
accepted and dropped — not only the accepted ones.

Per micro-batch (batch_id comes from foreachBatch):
  1. MinHash signatures (same affine family / constants as batch);
  2. LSH probe of the batch's band buckets against the persistent
     SIGNATURE STORE — an equi-join on (band, bucket) against a
     parquet table with one row per seen doc per band, NOT against
     the corpus text.  The store is read EXCLUDING the current
     batch's own partition (`batch != batch_id`), so a checkpoint
     replay that finds its own half-written rows never self-matches;
     a `s.doc_id != b.doc_id` guard backstops redelivered ids;
  3. in-batch probe: a doc also drops if it matches a lower-doc_id
     doc of the same batch (first-writer-wins);
  4. accepted docs overwrite `out_dir/batch=<id>/`; ALL band rows
     overwrite `store_dir/batch=<id>/` — the out write runs FIRST so
     a crash between the two writes leaves the accepted data durable
     and the replay recomputes an identical store partition.

Idempotency under checkpoint replay: both writes are per-batch
partition OVERWRITES keyed by the foreachBatch batch_id, and the probe
excludes the in-flight partition, so replaying a batch after a crash at
ANY point (before out, between the writes, or before the checkpoint
commit) recomputes the same accepted set from the same visible store
state and overwrites both partitions byte-identically.  No doc is lost,
no store row duplicates.  (With a transactional table format — Delta /
Iceberg — the two writes would be one commit; plain parquet gets the
same effect from partition-overwrite idempotency.)

Scale shape: the store is O(seen docs × n_perms) rows of small
integers — tiny next to the text; the probe is the SAME bounded
equi-join as batch LSH (cost ∝ matching buckets, never corpus size).
At 100 TB the store is additionally bucket-partitioned by
(band, bucket % K) so the probe prunes directories, and the hot-bucket
skew cap applies exactly as in batch (functions/dedup.py
MAX_BUCKET_WIDTH).  Docs too short to shingle (< 3 tokens) carry no
near-dup evidence and are accepted without entering the store.

Reference basis: dedup is a north-star extension (BASELINE.json); the
foreachBatch pattern mirrors the reference's per-batch Mongo upsert
loop (/root/reference/consumer/consumer.py:147-174).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
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
    batch_id: int = 0,
    n_perms: int = dedup.N_PERMS,
    min_agree: int = DUP_MIN_AGREE,
) -> int:
    """Run one micro-batch through the incremental filter.

    `batch_id` keys the idempotent per-batch partition writes — pass
    the foreachBatch id (distinct per source batch, stable on replay).
    Returns the number of accepted docs (driver-side metric for the
    monitor; the data itself moves executor-side only).
    """
    spark = batch.sparkSession
    rows = _band_rows(batch, n_perms).persist()

    # docs too short to shingle never produce band rows — they are
    # trivially novel (no near-dup evidence either way)
    sigless = batch.join(
        rows.select("doc_id").distinct(), "doc_id", "left_anti"
    )

    try:
        # exclude the current batch's own partition: a replay that
        # crashed after the store write must not self-match.  The
        # filter is on the partition column, so it prunes directories.
        store = spark.read.parquet(store_dir).where(
            F.col("batch") != F.lit(batch_id)
        )
        has_store = True
    except AnalysisException:
        # path does not exist yet (first batch); real IO/corruption
        # errors raise other exception types and fail the batch.
        has_store = False

    # in-batch: drop any doc matching a LOWER-id doc of the same batch
    # (first-writer-wins; the lower doc's own fate does not matter —
    # see the module contract)
    dropped = (
        rows.alias("l")
        .join(
            rows.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .where(_agree(F.col("l.sigs"), F.col("r.sigs")) >= min_agree)
        .select(F.col("r.doc_id").alias("doc_id"))
    )
    if has_store:
        dup_of_store = (
            rows.alias("b")
            .join(
                store.alias("s"),
                (F.col("b.band") == F.col("s.band"))
                & (F.col("b.bucket") == F.col("s.bucket"))
                & (F.col("b.doc_id") != F.col("s.doc_id")),
            )
            .where(_agree(F.col("b.sigs"), F.col("s.sigs")) >= min_agree)
            .select(F.col("b.doc_id").alias("doc_id"))
        )
        dropped = dropped.unionByName(dup_of_store)
    dropped = dropped.distinct()

    accepted = (
        batch.join(
            rows.select("doc_id").distinct().join(
                dropped, "doc_id", "left_anti"
            ),
            "doc_id",
            "left_semi",
        )
        .unionByName(sigless)
        .persist()
    )
    n_accepted = accepted.count()

    # accepted data first — durable even if the store write dies; both
    # writes are idempotent partition overwrites keyed by batch_id.
    accepted.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
    rows.select("doc_id", "sigs", "band", "bucket").write.mode(
        "overwrite"
    ).parquet(f"{store_dir}/batch={batch_id}")

    accepted.unpersist()
    rows.unpersist()
    return n_accepted


def start_incremental_dedup(
    stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    n_perms: int = dedup.N_PERMS,
    min_agree: int = DUP_MIN_AGREE,
):
    """Attach the filter to a document stream (availableNow in tests)."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        dedup_batch(batch, store_dir, out_dir, batch_id, n_perms, min_agree)

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

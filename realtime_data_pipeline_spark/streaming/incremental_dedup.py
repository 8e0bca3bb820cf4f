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
Every store partition is sub-partitioned by
bucket_grp = hash(band, bucket) % N_STORE_BUCKETS (the join carries
the same derived key on both sides, so bucket-group pruning is
available to the planner), and `compact_store` bounds directory
growth: committed `batch=<id>/` partitions fold into one consolidated
negative-id generation, so the store's directory count stays
O(N_STORE_BUCKETS + batches-since-compaction) instead of growing one
directory per micro-batch forever.  Compaction only ever touches
COMMITTED batches (`keep_last` highest live ids stay untouched — the
only batches Structured Streaming can replay), so the in-flight-batch
exclusion that makes replay safe keeps working; a crash mid-compaction
leaves duplicate rows across generations, which the probe tolerates
(matches feed a distinct) and the next compaction folds away.  The
hot-bucket skew cap applies exactly as in batch (functions/dedup.py
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
N_STORE_BUCKETS = 16  # bucket_grp sub-partitions per store generation


def _bucket_grp() -> "F.Column":
    return F.pmod(
        F.xxhash64("band", "b1", "b2"), F.lit(N_STORE_BUCKETS)
    ).cast("int")


def _band_rows(docs: DataFrame, n_perms: int) -> DataFrame:
    """(doc_id, sigs, band, b1, b2) — one row per doc per band, via the
    SHARED banding scheme (dedup.lsh_band_rows, BAND_R=2): the online
    filter and the batch candidate generator must agree on what a
    candidate is, or the streaming twin's batch oracle diverges."""
    sigs = dedup.minhash_signatures(docs, n_perms).select("doc_id", "sigs")
    return dedup.lsh_band_rows(sigs, n_perms)


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
    rows = (
        _band_rows(batch, n_perms)
        .withColumn("bucket_grp", _bucket_grp())
        .persist()
    )

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
            & (F.col("l.b1") == F.col("r.b1"))
            & (F.col("l.b2") == F.col("r.b2"))
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
                # bucket_grp is derived from (band, bucket) so the
                # extra equality is semantically redundant — it exists
                # to hand the planner a partition-column join key for
                # store-side bucket-group pruning
                (F.col("b.bucket_grp") == F.col("s.bucket_grp"))
                & (F.col("b.band") == F.col("s.band"))
                & (F.col("b.b1") == F.col("s.b1"))
                & (F.col("b.b2") == F.col("s.b2"))
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
    rows.select(
        "doc_id", "sigs", "band", "b1", "b2", "bucket_grp"
    ).write.partitionBy("bucket_grp").mode("overwrite").parquet(
        f"{store_dir}/batch={batch_id}"
    )

    accepted.unpersist()
    rows.unpersist()
    return n_accepted


def _list_batch_ids(spark, store_dir: str) -> list[int]:
    """Partition ids under the store from filesystem truth (works on
    any Hadoop-compatible FS, not just local disk)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(store_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return []
    ids = []
    for status in fs.listStatus(path):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith("batch="):
            try:
                ids.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(ids)


def compact_store(spark, store_dir: str, keep_last: int = 1) -> int:
    """Fold committed `batch=<id>/` store partitions into one
    consolidated generation so directory count stays bounded.

    The `keep_last` HIGHEST live (non-negative) batch ids are never
    touched: Structured Streaming can only replay the latest
    uncommitted batch, and the replay contract (dedup_batch's
    in-flight-partition exclusion + first-writer-wins) requires that
    batch's rows to still live in its own partition.  Everything else
    — older live batches and prior consolidated generations — is
    committed history whose PRESENCE matters to the probe but whose
    layout doesn't, so it rewrites into `batch=<next negative id>/`
    sub-partitioned by bucket_grp, then the folded directories are
    deleted.  Crash-safe without a transaction: if the delete phase
    dies, rows exist in both the new generation and leftover folded
    dirs — the probe's distinct makes duplicates harmless and the next
    compaction folds the leftovers.  Idempotent: re-running with
    nothing to fold is a no-op.

    Returns the number of partitions folded (0 = no-op).
    """
    ids = _list_batch_ids(spark, store_dir)
    live = [i for i in ids if i >= 0]
    keep = set(live[len(live) - keep_last:]) if keep_last > 0 else set()
    fold = [i for i in ids if i not in keep]
    if len(fold) < 2:  # nothing to consolidate
        return 0
    new_id = min([0, *ids]) - 1

    store = spark.read.parquet(store_dir).where(F.col("batch").isin(fold))
    (
        store.select("doc_id", "sigs", "band", "b1", "b2", "bucket_grp")
        # post-crash leftovers can duplicate a doc's rows across
        # generations; (doc_id, band) is the store's natural key
        .dropDuplicates(["doc_id", "band"])
        .repartition("bucket_grp")
        .write.partitionBy("bucket_grp")
        .mode("overwrite")
        .parquet(f"{store_dir}/batch={new_id}")
    )

    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(store_dir).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    for i in fold:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{store_dir}/batch={i}"), True)
    return len(fold)


def start_incremental_dedup(
    stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    n_perms: int = dedup.N_PERMS,
    min_agree: int = DUP_MIN_AGREE,
    compact_every: int | None = None,
):
    """Attach the filter to a document stream (availableNow in tests).

    `compact_every=N` runs `compact_store` after every Nth batch —
    keep_last=1 keeps the just-written (still-uncommitted) batch
    partition live, so a replay of that batch stays idempotent even
    when it races a compaction."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        dedup_batch(batch, store_dir, out_dir, batch_id, n_perms, min_agree)
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact_store(batch.sparkSession, store_dir, keep_last=1)

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

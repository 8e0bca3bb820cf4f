"""Keyed-upsert sink — the reference's Mongo upsert semantics
(consumer/consumer.py:147-174: operationType=update, upsertDocument,
composite idFieldList) re-implemented Mongo-free as a foreachBatch
MERGE into a hash-bucketed, per-bucket-versioned parquet table.

Layout and why:

* rows hash-partition into N_BUCKETS buckets on the composite key
  (Murmur3 `F.hash`, seed-stable across runs and engines' sessions);
* a merge rewrites ONLY the buckets containing the batch's keys —
  an untouched bucket's files are never touched again (asserted by
  `test_upsert_untouched_buckets_not_rewritten`).  Round 1 rewrote the
  ENTIRE table per micro-batch, which is quadratic-over-time I/O at any
  real sink volume (VERDICT item 6);
* Spark cannot safely overwrite a parquet path it is reading in the
  same job, so each touched bucket gets a new `v=<n>/__bucket=<k>`
  directory and a `_CURRENT` JSON manifest (bucket → version) flips
  atomically via os.replace.  Checkpoint replay of a micro-batch
  re-merges the same rows under the same keys — idempotent, exactly the
  property the reference gets from Mongo upsert (SURVEY §1.4.3).

At scale this slot is filled by a real table format (Delta/Iceberg
MERGE INTO — the same keyed upsert with file-level pruning; their
data-skipping plays the role the bucket hash plays here); the interface
is format-agnostic on purpose.

Fast-append mode (opt-in, `monotone_col=`): the r13 streaming soak
measured the one per-batch cost that grows with table size — the
bucket rewrite — even though append-mode batches only ever INSERT new
keys (a finalized window emits once).  When the caller declares a key
column that is non-decreasing across merges (window_start in an
append-mode stream), the table keeps a per-bucket high-water mark of
that column; a merge whose bucket-minimum strictly exceeds the mark
provably matches no stored key, so it APPENDS a new leaf (the bucket's
manifest entry becomes a LIST of leaf versions) instead of
read+anti-join+rewrite — O(batch) I/O, independent of table size.
Overlapping or replayed batches, and buckets stacked past `stack_max`
leaves, take the classic rewrite path, which also folds the stack —
LSM compaction in miniature, amortizing rewrites to
O(table / stack_max) per merge.  Null monotone values fall back to
the rewrite path (SQL null-equality means they can never match
anyway, but the conservative path keeps the reasoning local).  The
default (monotone_col=None) is byte-for-byte the original behavior.

Mark soundness across sessions (ADVICE r13): marks are stored
column-TAGGED ({"col", "marks"}) and trusted only when the session's
monotone_col matches; a classic-mode merge drops the touched
buckets' marks (its inserts may exceed them), deletes keep marks
(upper bounds survive row removal).  So no reopen sequence — column
swap, classic interleave, legacy table — can pass the `lo > mark`
test against a mark that doesn't bound the stored data.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CURRENT = "_CURRENT"
_BUCKET = "__bucket"
N_BUCKETS = 16
_UNKNOWN = object()  # "no high-water mark recorded for this bucket"


class UpsertTable:
    """A parquet table with composite-key upsert and snapshot reads."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        n_buckets: int = N_BUCKETS,
        retain_versions: int = 1,
        monotone_col: str | None = None,
        stack_max: int = 8,
    ):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.n_buckets = n_buckets
        # Fast-append mode: `monotone_col` must be part of the key —
        # the no-key-collision proof is "every stored key's monotone
        # component is <= the mark < every batch key's", which only
        # holds if the column participates in key equality.
        if monotone_col is not None and monotone_col not in self.key_cols:
            raise ValueError(
                f"monotone_col {monotone_col!r} must be one of the key "
                f"columns {self.key_cols}"
            )
        self.monotone_col = monotone_col
        if stack_max < 1:
            raise ValueError("stack_max must be >= 1")
        self.stack_max = stack_max
        # How many SUPERSEDED versions stay readable (the vacuum grace
        # window).  1 = the original contract: current + the previous
        # version (for in-flight readers).  Larger values buy time
        # travel depth at the cost of disk — the lakehouse retention
        # knob (Delta's deletedFileRetentionDuration, in versions).
        if retain_versions < 1:
            raise ValueError("retain_versions must be >= 1")
        self.retain_versions = retain_versions

    # -- manifest management --------------------------------------------
    def _manifest(self) -> dict | None:
        """{"version": int, "buckets": {bucket(str): version(int)}}"""
        try:
            with open(os.path.join(self.path, _CURRENT)) as f:
                m = json.load(f)
        except (FileNotFoundError, ValueError):
            return None
        if m.get("n_buckets") != self.n_buckets:
            raise ValueError(
                f"table at {self.path} was written with "
                f"n_buckets={m.get('n_buckets')}, opened with {self.n_buckets}"
            )
        return m

    def _flip(self, manifest: dict) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, _CURRENT + ".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.path, _CURRENT))
        # Immutable snapshot of this version's manifest — the metadata
        # log that makes read(version=N) possible.  Kilobytes per
        # merge; kept forever (like a table-format transaction log);
        # whether N's DATA is still on disk is governed by
        # retain_versions.
        snap = os.path.join(self.path, f"manifest.v{manifest['version']}.json")
        with open(snap, "w") as f:
            json.dump(manifest, f)

    def _leaf(self, version: int, bucket: int | str) -> str:
        return os.path.join(self.path, f"v={version}", f"{_BUCKET}={bucket}")

    @staticmethod
    def _leaf_versions(entry) -> list[int]:
        """A manifest bucket entry is an int (single leaf — the
        original layout) or a list of leaf versions (fast-append
        stack, oldest first)."""
        return list(entry) if isinstance(entry, list) else [entry]

    @staticmethod
    def _mono_encode(v):
        """JSON-encode a high-water-mark value, tagging the types JSON
        cannot represent natively."""
        import datetime
        import decimal

        if isinstance(v, datetime.datetime):
            return {"t": "dt", "v": v.isoformat()}
        if isinstance(v, datetime.date):
            return {"t": "d", "v": v.isoformat()}
        if isinstance(v, decimal.Decimal):
            return {"t": "dec", "v": str(v)}
        return v

    @staticmethod
    def _mono_decode(v):
        import datetime
        import decimal

        if isinstance(v, dict):
            if v.get("t") == "dt":
                return datetime.datetime.fromisoformat(v["v"])
            if v.get("t") == "d":
                return datetime.date.fromisoformat(v["v"])
            if v.get("t") == "dec":
                return decimal.Decimal(v["v"])
        return v

    def _bucket_col(self) -> F.Column:
        return F.pmod(F.hash(*self.key_cols), F.lit(self.n_buckets))

    # -- reads ------------------------------------------------------------
    def read(self, version: int | None = None) -> DataFrame | None:
        """Snapshot read.  version=None → current; version=N → time
        travel to the state after merge N (requires N's data leaves to
        still be within the retain_versions vacuum window)."""
        if version is None:
            m = self._manifest()
        else:
            snap = os.path.join(self.path, f"manifest.v{version}.json")
            try:
                with open(snap) as f:
                    m = json.load(f)
            except FileNotFoundError:
                raise ValueError(
                    f"no snapshot manifest for version {version}; "
                    f"available: {self.versions()}"
                ) from None
        if m is None:
            return None
        paths = [
            self._leaf(v, b)
            for b, entry in sorted(m["buckets"].items())
            for v in self._leaf_versions(entry)
        ]
        if not paths:
            return None
        if version is not None:
            gone = [p for p in paths if not os.path.isdir(p)]
            if gone:
                raise ValueError(
                    f"version {version} is older than the vacuum "
                    f"retention window (retain_versions="
                    f"{self.retain_versions}); {len(gone)} leaves "
                    "deleted — raise retain_versions at write time to "
                    "keep deeper history"
                )
        return self.spark.read.parquet(*paths)

    def versions(self) -> list[int]:
        """Snapshot versions with a manifest on disk (data availability
        is narrower — governed by retain_versions)."""
        try:
            entries = os.listdir(self.path)
        except FileNotFoundError:
            return []
        out = []
        for e in entries:
            if e.startswith("manifest.v") and e.endswith(".json"):
                out.append(int(e[len("manifest.v"):-len(".json")]))
        return sorted(out)

    # -- merge --------------------------------------------------------------
    def merge(self, batch: DataFrame) -> None:
        """Upsert: delete-matching-keys then insert (last write wins),
        rewriting only the hash buckets the batch's keys land in.

        Within one batch, duplicate keys collapse to an arbitrary single
        row via dropDuplicates on the key — the streaming engine never
        emits duplicate finalized windows in one batch, so this only
        guards replay edge cases.
        """
        batch = batch.dropDuplicates(self.key_cols).withColumn(
            _BUCKET, self._bucket_col()
        )
        # Two actions consume `batch` (the touched-bucket probe and the
        # merge write); inside foreachBatch each action would otherwise
        # re-execute the whole micro-batch aggregation.  Persist once.
        batch = batch.persist()
        try:
            self._merge_persisted(batch)
        finally:
            batch.unpersist()

    def delete_keys(self, keys: DataFrame) -> int:
        """Targeted delete (the right-to-be-forgotten primitive): remove
        every row whose key appears in `keys`, rewriting ONLY the hash
        buckets those keys land in — same bucket-addressable shape as
        merge, so a delete of k keys costs O(buckets(k)), not a table
        rewrite.  Returns the number of rows removed.

        Privacy note: superseded leaves stay readable for the
        retain_versions grace window (and via time-travel snapshots)
        until vacuum unlinks them — hard erasure completes after the
        next `retain_versions` merges, the same contract as lakehouse
        VACUUM-based deletion."""
        keys = (
            keys.select(self.key_cols)
            .dropDuplicates(self.key_cols)
            .withColumn(_BUCKET, self._bucket_col())
            .persist()
        )
        try:
            m = self._manifest()
            if m is None:
                return 0
            touched = sorted(
                b
                for b in (
                    r[0] for r in keys.select(_BUCKET).distinct().collect()
                )
                if str(b) in m["buckets"]
            )
            if not touched:
                return 0
            paths = [
                self._leaf(v, b)
                for b in touched
                for v in self._leaf_versions(m["buckets"][str(b)])
            ]
            # single scan; bucket recomputed from keys (see merge)
            current = self.spark.read.parquet(*paths).withColumn(
                _BUCKET, self._bucket_col()
            )
            current = current.persist()
            try:
                n_deleted = current.join(
                    keys.select(self.key_cols), self.key_cols, "left_semi"
                ).count()
                if n_deleted == 0:
                    return 0
                kept = current.join(
                    keys.select(self.key_cols), self.key_cols, "left_anti"
                )
                v_new = m["version"] + 1
                kept.repartition(len(touched), F.col(_BUCKET)).write.mode(
                    "overwrite"
                ).partitionBy(_BUCKET).parquet(
                    os.path.join(self.path, f"v={v_new}")
                )
                pending = [list(p) for p in m.get("pending", [])]
                # Deletes only REMOVE rows, so surviving high-water
                # marks remain upper bounds of the stored monotone
                # values (the fast-append soundness direction) in
                # every mode — no invalidation needed; just drop the
                # mark of a bucket that empties out entirely.
                mm = m.get("mono_max")
                marks = mm.get("marks") if isinstance(mm, dict) else None
                for b in touched:
                    for v_old in self._leaf_versions(m["buckets"][str(b)]):
                        pending.append([v_old, str(b), v_new])
                    # a fully-emptied bucket writes no leaf: drop it
                    # from the manifest instead of pointing at nothing
                    # (the rewrite also folds any fast-append stack)
                    if os.path.isdir(self._leaf(v_new, b)):
                        m["buckets"][str(b)] = v_new
                    else:
                        del m["buckets"][str(b)]
                        if marks is not None:
                            marks.pop(str(b), None)
                r = self.retain_versions
                ripe = [p for p in pending if p[2] < v_new - (r - 1)]
                m["pending"] = [p for p in pending if p[2] >= v_new - r]
                m["version"] = v_new
                self._flip(m)
                self._vacuum(ripe)
                return n_deleted
            finally:
                current.unpersist()
        finally:
            keys.unpersist()

    def _merge_persisted(self, batch: DataFrame) -> None:
        # ≤ n_buckets rows — O(1) driver-side, not a collect of data.
        # With a monotone column declared, the same tiny agg also
        # yields the per-bucket min/max needed for the fast-append
        # eligibility test.
        if self.monotone_col:
            stats = {
                r["b"]: (r["lo"], r["hi"])
                for r in batch.groupBy(F.col(_BUCKET).alias("b"))
                .agg(
                    F.min(self.monotone_col).alias("lo"),
                    F.max(self.monotone_col).alias("hi"),
                )
                .collect()
            }
        else:
            stats = {
                r[0]: (None, None)
                for r in batch.select(_BUCKET).distinct().collect()
            }
        touched = sorted(stats)
        if not touched:
            return
        m = self._manifest() or {
            "version": 0,
            "buckets": {},
            "n_buckets": self.n_buckets,
        }
        # High-water marks are tagged with the column they were
        # recorded for: {"col": <name>, "marks": {bucket: value}}.
        # Marks recorded for a DIFFERENT column (or by an older layout
        # without the tag) are meaningless for this session's
        # `lo > mark` test and are treated as unknown — the one-time
        # learning path re-establishes them on first rewrite.  Without
        # the tag, reopening with another key column as monotone_col
        # could pass the fast-append test against an incomparable mark
        # and skip the anti-join on a real key collision.
        mm = m.get("mono_max")
        stored_col = mm.get("col") if isinstance(mm, dict) else None
        stored_marks = (
            dict(mm.get("marks", {})) if stored_col is not None else {}
        )
        mono = stored_marks if stored_col == self.monotone_col else {}

        # Classify each touched bucket.  "fast" = provably no key
        # collision with stored rows (bucket min of the monotone key
        # column strictly above the bucket's high-water mark) and the
        # leaf stack still under stack_max; everything else rewrites.
        fast, slow = [], []
        for b in touched:
            entry = m["buckets"].get(str(b))
            if entry is None:
                fast.append(b)  # new bucket: nothing to read either way
                continue
            lo, _hi = stats[b]
            mark = mono.get(str(b), _UNKNOWN)
            if (
                self.monotone_col
                and lo is not None
                and mark is not _UNKNOWN
                and lo > self._mono_decode(mark)
                and len(self._leaf_versions(entry)) < self.stack_max
            ):
                fast.append(b)
            else:
                slow.append(b)

        slow_set = set(slow)
        merged = None
        if fast:
            merged = (
                batch
                if not slow_set
                else batch.where(~F.col(_BUCKET).isin(list(slow_set)))
            )
        if slow:
            # One scan over every leaf of every slow bucket; _BUCKET is
            # recomputed from the keys (bucket assignment is a pure
            # hash) rather than carried per-leaf — a per-leaf
            # lit-column would need a unionByName chain whose Catalyst
            # analysis cost is quadratic in leaf count, which round-13
            # measured dominating fold batches at stack_max leaves per
            # bucket.
            paths = [
                self._leaf(v, b)
                for b in slow
                for v in self._leaf_versions(m["buckets"][str(b)])
            ]
            current = self.spark.read.parquet(*paths).withColumn(
                _BUCKET, self._bucket_col()
            )
            slow_batch = (
                batch
                if not fast
                else batch.where(F.col(_BUCKET).isin(list(slow_set)))
            )
            slow_merged = current.join(
                batch.select(self.key_cols), self.key_cols, "left_anti"
            ).unionByName(slow_batch)
            merged = (
                slow_merged if merged is None
                else merged.unionByName(slow_merged)
            )
        # One-time mark learning: a bucket written before monotone_col
        # was declared has no high-water mark; its rewrite holds every
        # row of the bucket, so one bounded agg (only over the unknown
        # buckets, only on their first rewrite) establishes the mark
        # and moves the bucket onto the fast path for good.
        learned: dict = {}
        unknown = (
            [b for b in slow if mono.get(str(b), _UNKNOWN) is _UNKNOWN]
            if self.monotone_col
            else []
        )
        if unknown:
            merged = merged.persist()
            learned = {
                r["b"]: r["hi"]
                for r in merged.where(F.col(_BUCKET).isin(unknown))
                .groupBy(F.col(_BUCKET).alias("b"))
                .agg(F.max(self.monotone_col).alias("hi"))
                .collect()
            }
        v_new = m["version"] + 1
        # one job: partitionBy fans the touched buckets into their
        # v=<n>/__bucket=<k> leaves.  Repartition on the bucket column
        # first so each leaf gets ~1 file instead of one per upstream
        # task — without this, file count grows as
        # O(merges x shuffle_partitions x buckets) and snapshot reads
        # drown in small files.
        try:
            merged.repartition(len(touched), F.col(_BUCKET)).write.mode(
                "overwrite"
            ).partitionBy(_BUCKET).parquet(
                os.path.join(self.path, f"v={v_new}")
            )
        finally:
            if unknown:
                merged.unpersist()
        # superseded leaves enter the pending-delete ledger; they stay
        # on disk through the one-version grace window for in-flight
        # readers, then _vacuum unlinks them by exact path — no
        # directory walking on the hot path
        # Pending-delete ledger: [v_old, bucket, v_sup] = the leaf
        # v=<v_old>/__bucket=<b> was superseded by the merge that
        # produced version v_sup.  A manifest at version m_v references
        # that leaf iff v_old <= m_v < v_sup, so once v_sup < current
        # the only manifests that could see it (current and the
        # one-version reader grace window) cannot — it is safe to
        # unlink.  Entries stay in the ledger for one extra merge after
        # deletion (rmtree is idempotent), so a crash between flip and
        # vacuum heals on the next merge instead of leaking the leaf.
        pending = [list(p) for p in m.get("pending", [])]
        for b in slow:
            # only REWRITTEN buckets supersede leaves; a fast append
            # leaves every prior leaf live (nothing replaced it)
            for v_old in self._leaf_versions(m["buckets"][str(b)]):
                pending.append([v_old, str(b), v_new])
        # A leaf [v_old, b, v_sup] is referenced by snapshots
        # v_old..v_sup-1; the newest of those is v_sup-1.  It is safe
        # to delete once every snapshot referencing it has aged past
        # the retain_versions window: v_sup-1 < v_new - R.  R=1 is the
        # original contract (current + one grace version).
        r = self.retain_versions
        ripe = [p for p in pending if p[2] < v_new - (r - 1)]
        m["pending"] = [p for p in pending if p[2] >= v_new - r]
        m["version"] = v_new
        for b in touched:
            entry = m["buckets"].get(str(b))
            if b in slow_set or entry is None:
                m["buckets"][str(b)] = v_new  # rewrite folds any stack
            else:
                m["buckets"][str(b)] = self._leaf_versions(entry) + [v_new]
            if self.monotone_col:
                _lo, hi = stats[b]
                mark = mono.get(str(b), _UNKNOWN)
                if b in learned:
                    if learned[b] is not None:
                        mono[str(b)] = self._mono_encode(learned[b])
                elif mark is not _UNKNOWN:
                    if hi is not None:
                        mono[str(b)] = self._mono_encode(
                            max(self._mono_decode(mark), hi)
                        )
                elif entry is None and hi is not None:
                    mono[str(b)] = self._mono_encode(hi)  # new bucket
        if self.monotone_col:
            m["mono_max"] = {"col": self.monotone_col, "marks": mono}
        elif stored_col is not None:
            # Classic-mode merge into a table carrying marks: the
            # batch may insert rows whose monotone values exceed the
            # stored marks, which would let a later monotone-mode
            # reopen fast-append against a stale mark and silently
            # duplicate keys.  Drop the touched buckets' marks (they
            # relearn on first rewrite); untouched buckets' marks stay
            # valid — nothing was inserted there.
            for b in touched:
                stored_marks.pop(str(b), None)
            if stored_marks:
                m["mono_max"] = {"col": stored_col, "marks": stored_marks}
            else:
                m.pop("mono_max", None)
        elif mm is not None:
            # legacy untagged marks are never trusted — clear them so
            # the manifest converges to the tagged layout
            m.pop("mono_max", None)
        self._flip(m)
        self._vacuum(ripe)

    def _vacuum(self, ripe: list) -> None:
        """Unlink superseded-and-grace-expired leaves by exact path,
        then drop any version root emptied by that.  Cost is O(leaves
        actually deleted) — a merge that supersedes nothing lists no
        directories at all."""
        if not ripe:
            return
        roots = set()
        for ver, b, _v_sup in ripe:
            shutil.rmtree(self._leaf(ver, b), ignore_errors=True)
            roots.add(int(ver))
        for ver in roots:
            root = os.path.join(self.path, f"v={ver}")
            try:
                empty = not any(
                    e.startswith(f"{_BUCKET}=") for e in os.listdir(root)
                )
            except FileNotFoundError:
                continue
            if empty:
                shutil.rmtree(root, ignore_errors=True)


def upsert_sink(table: UpsertTable):
    """foreachBatch hook: merge each micro-batch by composite key (W4)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        table.merge(batch_df)

    return _sink


def start_upsert_query(
    agg: DataFrame,
    table: UpsertTable,
    checkpoint_dir: str,
    query_name: str,
    trigger_available_now: bool = False,
    output_mode: str = "append",
):
    """W3+W4: streaming write into the keyed-upsert table, checkpointed
    for exactly-once-ish replay (consumer/consumer.py:147-159).

    append (default) emits finalized windows only; update is for
    arbitrary-stateful operators (applyInPandasWithState) that re-emit
    a key's latest value each batch — the keyed merge makes either mode
    last-write-wins idempotent.
    """
    writer = (
        agg.writeStream.outputMode(output_mode)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(upsert_sink(table))
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Corpus snapshot diff: row-level added/removed/changed/unchanged
classification between two dataset versions.

The incremental-corpus operator a 100 TB training-data pipeline runs on
every refresh: given snapshot A (yesterday's corpus) and snapshot B
(today's), classify every key as

    added      — in B only
    removed    — in A only
    changed    — in both, content fingerprint differs
    unchanged  — in both, fingerprint identical

Shape: ONE full-outer sort-merge join on the key — each side scans
(key, fingerprint, carried columns) only, so the exchange payload is a
fingerprint per doc, not the documents themselves.  With both
snapshots written bucketed-by-key (operators/writer.py layout) the
exchange disappears entirely and the diff is a zero-shuffle zip of
co-bucketed files — the same reason lakehouse formats bucket their
merge keys.  Never a window, never a collect.

The reference has no snapshot/versioning surface at all (its sink is a
Mongo upsert, SURVEY §1.4.3 — last write wins, history discarded);
this operator is a north-star extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    key: str,
    fingerprint: str,
    carry: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots.

    ``a`` / ``b`` must expose ``key`` and ``fingerprint`` columns (the
    fingerprint is any content hash — md5 of the payload, a minhash
    band, an etag).  ``carry`` columns are taken from whichever side is
    present (B wins for rows in both, so carried metadata reflects the
    NEW version).  Output: ``key``, ``carry...``, ``status``.
    """
    carry = carry or []
    aa = a.select(key, fingerprint, *carry).alias("a")
    bb = b.select(key, fingerprint, *carry).alias("b")
    joined = aa.join(bb, on=F.col(f"a.{key}") == F.col(f"b.{key}"), how="full_outer")
    a_fp, b_fp = F.col(f"a.{fingerprint}"), F.col(f"b.{fingerprint}")
    status = (
        F.when(F.col(f"a.{key}").isNull(), F.lit("added"))
        .when(F.col(f"b.{key}").isNull(), F.lit("removed"))
        .when(a_fp != b_fp, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    cols = [
        F.coalesce(F.col(f"b.{key}"), F.col(f"a.{key}")).alias(key),
        *[
            F.coalesce(F.col(f"b.{c}"), F.col(f"a.{c}")).alias(c)
            for c in carry
        ],
        status.alias("status"),
    ]
    return joined.select(*cols)

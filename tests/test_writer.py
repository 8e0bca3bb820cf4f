"""Corpus writer layout contract: directory partitioning, bounded
shard file count, within-file key sort, and partition pruning on read.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from realtime_data_pipeline_spark.operators import writer

from conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_layout_partitions_and_shard_count(spark, tmp_path):
    out = str(tmp_path / "corpus")
    writer.write_corpus(_docs(spark), out, partition_cols=("lang",), n_shards=4)
    part_dirs = sorted(
        os.path.basename(p) for p in glob.glob(f"{out}/lang=*")
    )
    langs = sorted(
        r.lang for r in _docs(spark).select("lang").distinct().collect()
    )
    assert part_dirs == [f"lang={l}" for l in langs]
    for d in part_dirs:
        shard_dirs = glob.glob(f"{out}/{d}/shard=*")
        # ≤ n_shards leaf dirs per partition (a shard can be empty), ≥ 1
        assert 1 <= len(shard_dirs) <= 4, (d, shard_dirs)
        for sd in shard_dirs:
            assert glob.glob(f"{sd}/*.parquet"), sd


def test_roundtrip_and_within_file_sort(spark, tmp_path):
    out = str(tmp_path / "corpus")
    writer.write_corpus(_docs(spark), out, partition_cols=("lang",), n_shards=4)
    back = writer.read_corpus(spark, out)
    assert back.count() == _docs(spark).count()
    # every individual file is sorted by doc_id (tight row-group stats)
    for f in glob.glob(f"{out}/lang=*/shard=*/*.parquet"):
        ids = [r.doc_id for r in spark.read.parquet(f).select("doc_id").collect()]
        assert ids == sorted(ids), f


def test_partition_pruning_on_read(spark, tmp_path):
    out = str(tmp_path / "corpus")
    writer.write_corpus(_docs(spark), out, partition_cols=("lang",), n_shards=4)
    q = writer.read_corpus(spark, out).where(F.col("lang") == "en")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan, plan[:2000]
    # equality on the partition column must NOT appear as a data filter
    oracle = (
        _docs(spark).where(F.col("lang") == "en").count()
    )
    assert q.count() == oracle


def test_key_predicate_pushed_to_scan(spark, tmp_path):
    out = str(tmp_path / "corpus")
    writer.write_corpus(_docs(spark), out, partition_cols=("lang",), n_shards=4)
    q = writer.read_corpus(spark, out).where(F.col("doc_id") < 10)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)" in plan, (
        plan[:2000]
    )


def test_jsonl_export_roundtrip(spark, tmp_path):
    """JSONL export: same partition/shard/sort layout as the parquet
    writer, value-identical roundtrip under the declared schema, and
    gzip'd line files sorted by key."""
    import glob

    out = str(tmp_path / "jsonl")
    docs = _docs(spark)
    writer.write_corpus_jsonl(docs, out, partition_cols=("lang",), n_shards=4)

    part_dirs = glob.glob(f"{out}/lang=*")
    assert len(part_dirs) >= 2
    files = glob.glob(f"{out}/lang=*/shard=*/*.json.gz")
    assert files, "expected gzip json files"

    back = writer.read_corpus_jsonl(spark, out, schema=docs.schema)
    # json partition dirs re-add lang as string; compare on docs' columns
    got = sorted(
        map(tuple, back.select(*docs.columns).collect())
    )
    want = sorted(map(tuple, docs.collect()))
    assert got == want

    # within-file key order survives (atomic streamable shards)
    f = files[0]
    ids = [
        r.doc_id
        for r in spark.read.schema(docs.schema).json(f).select("doc_id").collect()
    ]
    assert ids == sorted(ids) and len(ids) > 0


def test_jsonl_partition_pruning_on_read(spark, tmp_path):
    """A lang filter over the JSONL layout must prune partition DIRS at
    plan time (PartitionFilters on the scan), exactly like the parquet
    layout — gzip text files can't skip row groups, so directory
    pruning is the ONLY data-skipping lever the export format has."""
    out = str(tmp_path / "jsonl")
    docs = _docs(spark)
    writer.write_corpus_jsonl(docs, out, partition_cols=("lang",), n_shards=4)
    q = writer.read_corpus_jsonl(spark, out, schema=docs.schema).where(
        F.col("lang") == "en"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split(
        "PartitionFilters"
    )[1][:200], plan[:2000]
    oracle = docs.where(F.col("lang") == "en").count()
    assert q.count() == oracle


def test_schema_evolution_mergeschema_read(spark, tmp_path):
    """Corpus schema evolution: a later batch gains a column (here
    `quality`); reading the mixed directory with mergeSchema unions the
    schemas and backfills NULL for old files — the append-only lake
    contract.  Without mergeSchema Spark serves whichever footer it
    samples, which is silent data loss for the new column."""
    out = str(tmp_path / "evolving")
    docs = _docs(spark)
    old = docs.select("doc_id", "lang")
    new = docs.select(
        "doc_id", "lang", F.lit(0.5).alias("quality")
    ).where(F.col("doc_id") % 2 == 0)
    old.write.mode("overwrite").parquet(f"{out}/batch=0")
    new.write.mode("overwrite").parquet(f"{out}/batch=1")

    back = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(back.columns) == {"doc_id", "lang", "quality", "batch"}
    n_old = old.count()
    n_new = new.count()
    assert back.count() == n_old + n_new
    # old rows carry NULL quality; new rows carry the value
    assert back.where(F.col("quality").isNull()).count() == n_old
    assert back.where(F.col("quality") == 0.5).count() == n_new

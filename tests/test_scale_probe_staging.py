"""Pins for scripts/scale_probe.py's staged-data generators — the
tables every scale/soak artifact is measured against.  A silent
generator change would make cross-round artifact comparisons
meaningless, so the contracts are pinned:

  * generate_embeddings: schema (vec_id/embedding float[64]/label),
    deterministic md5 values, component range [-0.2, 0.2], labels
    0-9, and the fixed-predicate contract ann_stored_index_topk
    relies on (vec_ids 0-7 = serving queries, 8-15 = codebook rows
    present at ANY staged |V|);
  * stage_star_dir: manifest carries n_vecs; n_vecs=0 keeps the
    classic symlink behavior.
"""

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "scale_probe", os.path.join(REPO, "scripts", "scale_probe.py")
)
probe = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(probe)


@pytest.fixture(scope="module")
def staged_vec_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("probe_vecs"))
    probe.stage_star_dir(
        spark, d, n_rows=2000, n_docs=200, vocab="open", n_vecs=500
    )
    return d


def test_manifest_records_vecs(staged_vec_dir):
    with open(os.path.join(staged_vec_dir, "manifest.json")) as f:
        m = json.load(f)
    assert m == {"n_rows": 2000, "n_docs": 200, "vocab": "open",
                 "n_vecs": 500}


def test_embeddings_contract(spark, staged_vec_dir):
    df = spark.read.parquet(
        os.path.join(staged_vec_dir, "embeddings.parquet")
    )
    assert [f.simpleString() for f in df.schema.fields] == [
        "vec_id:bigint", "embedding:array<float>", "label:int"
    ]
    rows = {r.vec_id: r for r in df.collect()}
    assert len(rows) == 500
    # the registry query's fixed predicates hold at any staged |V|
    assert all(i in rows for i in range(16))
    comps = [c for r in rows.values() for c in r.embedding]
    assert all(len(r.embedding) == 64 for r in rows.values())
    assert -0.2 <= min(comps) and max(comps) <= 0.2
    assert {r.label for r in rows.values()} <= set(range(10))


def test_embeddings_deterministic(spark, staged_vec_dir, tmp_path):
    """Same (id, dim) -> same component regardless of staged size or
    partitioning: vector 7 of a 500-vec staging equals vector 7 of a
    50-vec staging, so artifacts staged in different rounds measured
    the same data."""
    probe.generate_embeddings(spark, str(tmp_path), 50)
    small = {
        r.vec_id: (list(r.embedding), r.label)
        for r in spark.read.parquet(
            os.path.join(str(tmp_path), "embeddings.parquet")
        ).collect()
    }
    big = {
        r.vec_id: (list(r.embedding), r.label)
        for r in spark.read.parquet(
            os.path.join(staged_vec_dir, "embeddings.parquet")
        ).collect()
    }
    for vid, val in small.items():
        assert big[vid] == val, vid


def test_stored_index_query_runs_on_staged_dir(spark, staged_vec_dir):
    """ann_stored_index_topk's build+serve path works against a staged
    dir at a non-testdata |V| — the property the ANN soak measures."""
    import sys

    sys.path.insert(0, REPO)
    from realtime_data_pipeline_spark.plans import REGISTRY

    out = REGISTRY["ann_stored_index_topk"].fn(spark, staged_vec_dir)
    rows = out.collect()
    assert len(rows) == 40  # 8 query vectors x top-5
    assert {r.query_id for r in rows} == set(range(8))

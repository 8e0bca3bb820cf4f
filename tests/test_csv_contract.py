"""CSV interchange contract: the exact write/read option set in
operators/writer.py must round-trip every payload class CSV is
notorious for corrupting.  The registry query (csv_roundtrip_stats)
proves the corpus-level rollup; this pins the per-value contract on
planted hostile strings the fixture harnesses don't contain
(embedded newlines, quotes, commas, a literal backslash-N).
"""

from __future__ import annotations

from realtime_data_pipeline_spark.operators import writer

_ROWS = [
    (1, "plain text", "en"),
    (2, 'comma, "quotes" and\nembedded newline', "de"),
    (3, "", "en"),                      # empty string (not NULL)
    (4, None, "de"),                    # NULL (not empty string)
    (5, "   ", ""),                     # whitespace-only text, '' lang
    (6, "\\N literal backslash-N", None),
    (7, "trailing spaces   ", "en"),
    (8, "tab\tsemicolon;pipe|", "en"),
]
_SCHEMA = "doc_id long, text string, lang string"


def test_csv_roundtrip_is_lossless_per_value(spark, tmp_path):
    df = spark.createDataFrame(_ROWS, _SCHEMA)
    out = str(tmp_path / "csv")
    writer.write_corpus_csv(df, out, n_shards=2)
    back = writer.read_corpus_csv(spark, out, schema=df.schema)
    got = sorted(
        (r["doc_id"], r["text"], r["lang"]) for r in back.collect()
    )
    assert got == sorted(_ROWS)


def test_csv_shard_layout_and_sort(spark, tmp_path):
    """The export keeps the corpus layout contract: md5 shard dirs,
    key-sorted lines within each file (streamable without a sort)."""
    import glob
    import gzip

    df = spark.createDataFrame(
        [(i, f"text {i}", "en") for i in range(50)], _SCHEMA
    )
    out = str(tmp_path / "csv")
    writer.write_corpus_csv(df, out, n_shards=4)
    shard_dirs = sorted(glob.glob(f"{out}/shard=*"))
    assert len(shard_dirs) >= 2  # 50 md5-spread keys hit several shards
    for d in shard_dirs:
        for f in glob.glob(f"{d}/*.csv.gz"):
            with gzip.open(f, "rt") as fh:
                ids = [
                    int(line.split(",", 1)[0])
                    for line in fh.read().splitlines()[1:]  # skip header
                ]
            assert ids == sorted(ids), f

"""Adversarial UNICODE-fixture parity: the hostile-value harness
(test_hostile_value_parity) injects degenerate ASCII; this axis
injects multibyte/multiscript text and re-runs the driver-strength
compare over every oracle-carrying query.

What the axis probed, engine-vs-engine, before being built (the
divergence inventory — measured, not assumed):

  parity-SAFE in both engines: length() (code points, incl. astral
  emoji), whitespace/regex tokenization (\\s+ is ASCII-only in BOTH
  Java regex and RE2 — an ideographic space U+3000 is one token glue,
  not a separator, identically), substring(), md5() over UTF-8 bytes,
  hash joins/groupBy on unicode keys (byte-based).

  parity-UNSAFE: case mapping.  Spark (ICU/Java) lower('İ') is
  'i̇' (i + combining dot, 2 code points) where DuckDB gives 'i';
  Spark upper('ß') is 'SS' where DuckDB gives 'ẞ'.  The engine is
  structurally immune TODAY — no registry query case-folds
  data-dependent text (grep-verified; the only .upper() is a Python
  constant) — and this harness keeps it that way: any future operator
  that sneaks a lower() into a tokenizer or join key diverges here on
  the GRÜSSE/İstanbul/ß document.

The fixture also drives unicode through the MATERIALIZATION layers:
a '中文' lang value becomes a Hive partition DIRECTORY name in the
JSONL/CSV round-trip exports (escaped on write, unescaped on read —
both sides must agree byte-exactly with the DuckDB view of the raw
table), and a unicode source value rides groupBy/join keys.
"""

from __future__ import annotations

import duckdb as _duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from realtime_data_pipeline_spark.plans.registry import REGISTRY
from realtime_data_pipeline_spark.tables import TABLE_NAMES

from conftest import SF_DIR
from test_oracle_parity import assert_frames_match

# each mutated doc cycles through these: CJK (no spaces — ONE token
# under every whitespace tokenizer), accented latin, astral emoji
# (surrogate-pair length hazards), combining-mark sequence, RTL
# arabic, the case-mapping trap (İ / ß), ideographic-space glue, and
# fullwidth latin
_TEXTS = [
    "这是一个测试文档没有空格",
    "café naïve résumé déjà vu",
    "hello \U0001F44B\U0001F30D world \U0001F680",
    "éclair crème brûlée",
    "مرحبا بالعالم هذا اختبار",
    "GRÜSSE İstanbul ß Straße",
    "tab　wide　glue words",
    "ｆｕｌｌｗｉｄｔｈ ｌａｔｉｎ text",
]


def _mutate(name: str, t: pa.Table) -> pa.Table:
    n = t.num_rows
    cols = {f.name: t[f.name] for f in t.schema}
    if name == "documents":
        text = cols["text"].to_pylist()
        lang = cols["lang"].to_pylist()
        source = cols["source"].to_pylist()
        for i in range(0, n, 5):
            text[i] = _TEXTS[(i // 5) % len(_TEXTS)]
        # unicode lang: becomes a Hive partition DIRECTORY in the
        # jsonl/csv exports; unicode source: a groupBy/join key
        for i in range(0, n, 9):
            lang[i] = "中文"
        for i in range(0, n, 13):
            source[i] = "naïve-src"
        cols["text"] = pa.array(text, type=t.schema.field("text").type)
        cols["lang"] = pa.array(lang, type=t.schema.field("lang").type)
        cols["source"] = pa.array(source, type=t.schema.field("source").type)
        # n_chars stays derived-consistent (Python len == code points
        # == Spark length == DuckDB length, probed above)
        cols["n_chars"] = pa.array(
            [len(x) if x is not None else None for x in text],
            type=t.schema.field("n_chars").type,
        )
    return pa.table(cols, schema=t.schema)


_QUERIES = sorted(
    name
    for name, spec in REGISTRY.items()
    if spec.oracle is not None and "streaming" not in (spec.tags or ())
)

# streaming twins whose state stores / sinks carry document text or
# lang: unicode must survive the wire format, the signature store,
# and the partitioned corpus sink
_QUERIES += [
    "streaming_corpus_materialized_stats",
    "streaming_doc_quality_counts",
    "streaming_incremental_dedup",
    "streaming_frequent_terms",
]


@pytest.fixture(scope="module")
def unicode_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_unicode")
    for name in TABLE_NAMES:
        t = pq.read_table(f"{SF_DIR}/{name}.parquet")
        if name == "documents":
            t = _mutate(name, t)
        pq.write_table(t, f"{d}/{name}.parquet")
    return str(d)


@pytest.fixture(scope="module")
def unicode_duck(unicode_sf_dir):
    con = _duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{unicode_sf_dir}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _QUERIES)
def test_parity_survives_unicode_values(
    spark, unicode_sf_dir, unicode_duck, name
):
    spec = REGISTRY[name]
    assert_frames_match(
        name,
        spec.fn(spark, unicode_sf_dir).toPandas(),
        unicode_duck.execute(spec.oracle).df(),
    )

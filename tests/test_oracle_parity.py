"""Local emulation of the driver's correctness gate: run every registry
query on Spark and its DuckDB oracle side by side at sf0.01 (the
driver's scale) and compare row count, column names, and
order-insensitive BYTE-EXACT values.

Round-1 lesson (VERDICT item 2): the old normalizer collapsed
Decimal→float and formatted floats with %.10g, which masked exactly
the two failure modes the driver's hash catches — (a) a Decimal output
on one side vs float64 on the other (DuckDB's pandas conversion
renders decimals as float64, Spark's as decimal.Decimal), and (b)
1-ulp float64 differences from cross-engine decimal→double conversion.
Now: Decimals keep their type tag and scale, floats compare by full
repr.  Local green must imply driver green.
"""

from __future__ import annotations

import decimal
import math

import pytest

from realtime_data_pipeline_spark.plans.registry import REGISTRY

from conftest import SF_DIR, SF_DIR_MID


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        # Deliberately NOT converted to float: a Decimal output is a
        # cross-engine hash hazard and must fail loudly against the
        # oracle's float64.
        return f"dec:{v}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):  # includes np.float64
        if math.isnan(v):
            return "NaN"
        return repr(float(v))  # shortest round-trip repr — ulp-exact
    if hasattr(v, "isoformat"):  # datetime / date (pandas NaT → NULL)
        s = v.isoformat()
        return "NULL" if s == "NaT" else s
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _assert_scalar_cells(pdf):
    """Round-8 driver red (`term_postings_stats`): the DRIVER's pandas
    canonicalization crashes sorting any array/map/struct cell
    (`sort_values` → factorize → `TypeError: unhashable type`), while
    this harness's `_norm_cell` used to stringify lists silently — so
    local green did NOT imply driver green for non-scalar outputs.
    Close the hole at driver strength: a non-scalar cell in a compared
    frame is a FAILURE here, exactly where the driver fails.  Scans
    ALL rows, not a head sample (ADVICE r9: a column whose first cells
    are None with arrays later escaped the head(5) guard) — the parity
    frames are small, so the full scan is noise."""
    for c in pdf.columns:
        for v in pdf[c]:
            if isinstance(v, (list, tuple, dict)) or (
                hasattr(v, "ndim") and getattr(v, "ndim", 0) > 0
            ):
                raise AssertionError(
                    f"non-scalar cell in column {c!r} "
                    f"({type(v).__name__}): driver-window outputs must "
                    "be scalar-only (the driver's pandas canon cannot "
                    "sort array/map/struct cells) — render with "
                    "array_join/to_json before the final select"
                )


def _norm_frame(pdf):
    _assert_scalar_cells(pdf)
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_cell(row[c]) for c in cols)
        for _, row in pdf[cols].iterrows()
    ]
    return cols, sorted(rows)


def assert_frames_match(name, sdf, ddf):
    """THE driver-strength compare — shared by this suite, the NULL and
    hostile-value harnesses, and scripts/full_parity_sweep.py, so a
    change to comparison semantics can never leave the harnesses at
    different strictness."""
    s_cols, s_rows = _norm_frame(sdf)
    d_cols, d_rows = _norm_frame(ddf)
    assert s_cols == [c.lower() for c in d_cols] or s_cols == d_cols, (
        f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: rowcount spark={len(s_rows)} duck={len(d_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row diffs, first 3: {mismatches[:3]}"
    )


ORACLE_SPECS = [
    (name, spec) for name, spec in REGISTRY.items() if spec.oracle is not None
]


@pytest.mark.parametrize("name,spec", ORACLE_SPECS, ids=[n for n, _ in ORACLE_SPECS])
def test_oracle_parity(spark, duck, name, spec):
    sdf = spec.fn(spark, SF_DIR_MID).toPandas()
    ddf = duck.execute(spec.oracle).df()
    assert_frames_match(name, sdf, ddf)


def test_every_oracle_json_extraction_is_guarded():
    """The canonical item-extraction fragment — NULL-safe like Spark's
    get_json_object — is pasted into oracles across four plan modules.
    Pin every occurrence to the exact canonical text so an edit to one
    site (or a new unguarded site: DuckDB json_extract_string THROWS
    on malformed JSON) fails loudly instead of silently diverging."""
    canonical = (
        "(CASE WHEN json_valid(props) THEN "
        "json_extract_string(props, '$.k') END)"
    )
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        stripped = spec.oracle.replace(canonical, "")
        assert "json_extract_string" not in stripped, (
            f"{name}: oracle uses json_extract_string outside the "
            f"canonical json_valid-guarded fragment"
        )


def test_rows_only_queries_run(spark):
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            n = spec.fn(spark, SF_DIR).count()
            assert n >= 0, name


def test_every_bench_spec_executes_via_noop(spark):
    """A bench=True spec that stops running means the driver's
    BENCH_r{N} artifact goes missing for the whole round — exercise
    exactly bench.py's execution path (construct + noop write) for
    every flagged spec at the smallest scale, so a broken bench query
    fails HERE first."""
    bench_specs = [s for s in REGISTRY.values() if s.bench]
    assert len(bench_specs) >= 10  # the headline suite must stay broad
    for spec in bench_specs:
        spec.fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "window_start",
        "window_end",
        "user_id",
        "total_interactions",
    }


def test_no_decimal_output_columns(spark):
    """Output-type contract (round-2): DecimalType never leaves a query.
    DuckDB's pandas conversion renders decimals as float64 while Spark
    yields decimal.Decimal objects, so ANY decimal output column is a
    guaranteed driver hash mismatch.  Schema-only — runs off the
    analyzed plan, no execution."""
    from pyspark.sql.types import DecimalType

    offenders = []
    for name, spec in REGISTRY.items():
        schema = spec.fn(spark, SF_DIR).schema
        for f in schema.fields:
            if isinstance(f.dataType, DecimalType):
                offenders.append(f"{name}.{f.name}: {f.dataType}")
    assert not offenders, offenders

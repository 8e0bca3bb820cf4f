"""Z-order (Morton-curve) write layout — multi-dimensional data
skipping without a table format.

The corpus writer (operators/writer.py) sorts within files by ONE key,
so parquet min/max statistics prune single-key range predicates.  A
reader filtering on TWO dimensions at once (e.g. customer × price
band, date × user bucket) gets no pruning from a linear sort on either
key: sorting by x scatters y across every file.  Interleaving the bits
of both keys (the Morton/Z-order curve) makes file-level [min, max]
ranges of BOTH columns tight simultaneously — the same layout lever
Delta/Iceberg expose as OPTIMIZE ZORDER BY, built here from plain
column expressions + repartitionByRange, no table format needed.

All JVM bit arithmetic (shiftright / shiftleft / bitwise and-or) —
foldable, codegen'd, zero UDFs.  The write is ONE range shuffle on the
z-value (repartitionByRange also SORTS within partitions via the range
exchange + local sort), so at 100 TB the layout costs exactly one
pass.  Scaling to [0, 2^bits) uses the column min/max from a 1-row
aggregate — at real scale substitute fixed domain bounds or a sampled
quantile sketch to skip that pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def _scale_to_int(c: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Min-max scale a numeric column to [0, 2^bits - 1] (int)."""
    top = (1 << bits) - 1
    span = (cmax.cast("double") - cmin.cast("double"))
    frac = F.when(
        span > 0, (c.cast("double") - cmin.cast("double")) / span
    ).otherwise(F.lit(0.0))
    return F.least(
        F.floor(frac * top).cast("bigint"), F.lit(top).cast("bigint")
    )


def morton_interleave(x: Column, y: Column, bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low `bits` bits of two non-negative ints into one
    z-value: z = …y1x1y0x0.  Pure bit arithmetic, foldable per row."""
    z: Column = F.lit(0).cast("bigint")
    for i in range(bits):
        xbit = F.shiftright(x, i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(xbit, 2 * i)).bitwiseOR(
            F.shiftleft(ybit, 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 16,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write `df` as `n_files` parquet files laid out along the Z-order
    curve of (col_x, col_y).

    One 1-row min/max aggregate (broadcast as literals via crossJoin),
    then ONE repartitionByRange on the z-value — the range exchange
    assigns contiguous z-ranges to files and sorts within partitions,
    so every file covers a compact rectangle-ish region of (x, y) and
    parquet footer min/max on BOTH columns prune 2-D predicates."""
    stats = df.agg(
        F.min(col_x).alias("xmin"),
        F.max(col_x).alias("xmax"),
        F.min(col_y).alias("ymin"),
        F.max(col_y).alias("ymax"),
    )
    with_z = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "__zx",
            _scale_to_int(
                F.col(col_x), F.col("xmin"), F.col("xmax"), bits
            ),
        )
        .withColumn(
            "__zy",
            _scale_to_int(
                F.col(col_y), F.col("ymin"), F.col("ymax"), bits
            ),
        )
        .withColumn("__z", morton_interleave(F.col("__zx"), F.col("__zy"), bits))
        .drop("xmin", "xmax", "ymin", "ymax", "__zx", "__zy")
    )
    (
        with_z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_linear_sorted(
    df: DataFrame, path: str, col_x: str, n_files: int = 16
) -> None:
    """The single-key contrast layout: range-partitioned + sorted on
    col_x only (what writer.py's key sort does).  Exists so tests can
    measure the 2-D pruning difference."""
    (
        df.repartitionByRange(n_files, col_x)
        .sortWithinPartitions(col_x)
        .write.mode("overwrite")
        .parquet(path)
    )

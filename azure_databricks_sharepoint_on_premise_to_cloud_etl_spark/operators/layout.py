"""Data-layout clustering: Z-order (Morton) interleaving for
multi-dimensional data skipping.

A 100 TB table is pruned, not scanned: single-column range predicates
prune via partition directories and parquet row-group min/max stats,
but a query filtering TWO dimensions (price band x date window,
user x time, lat x lon) defeats single-column sort — rows matching
one dimension scatter across the other.  Z-ordering sorts by the
interleaved bits of both quantized keys, so rows close in the
2-D space land in the same files/row groups and both predicates
prune together (the same layout trick behind Delta's ``OPTIMIZE
ZORDER BY``, here as a plain-parquet writer).

Everything is a narrow codegen expression: quantization is arithmetic
against broadcast min/max bounds; the Morton code is a fixed tree of
shift/mask/or terms (no UDF, no loop at runtime).  The write is one
``repartitionByRange`` on the code (Spark samples ranges — an extra
pass, the standard cost of range layout) plus a within-partition sort.

Cited parity: the reference maintains tables by full rewrite
(code/ukg_open_census.py's overwrite pattern); layout clustering is
the scale-side extension of that maintenance family (M1 compaction
rewrites SMALL files; this rewrites for SKIPPING).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantized(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map ``col`` from [lo, hi] onto integer cells [0, 2^bits):
    ``floor((x - lo) / (hi - lo) * 2^bits)`` clamped into range.
    Pure double arithmetic — identical in any engine (the oracle
    reproduces it verbatim); degenerate lo == hi maps everything to
    cell 0."""
    cells = float(2**bits)
    span = hi - lo
    raw = F.when(
        span > 0, F.floor((col - lo) / span * F.lit(cells))
    ).otherwise(F.lit(0))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(int(cells) - 1)).cast("long")


def morton_interleave_n(qs: list[Column], bits: int = 16) -> Column:
    """n-dimensional Morton (Z-curve) code: bit i of dimension j lands
    at position ``i * n + j`` — round-robin interleave, so every
    dimension contributes equally to every code prefix and range
    predicates on ANY subset of the dimensions stay clustered.  A
    static expression tree of shift/mask/or terms — whole-stage
    codegen, no UDF; ``n * bits <= 62`` keeps the code in a signed
    BIGINT (drop ``bits`` as dimensions grow: 2x16, 3x10, 4x8...)."""
    n = len(qs)
    assert n * bits <= 62, "interleaved code must fit a signed long"
    # Column.bitwiseOR, not the | operator: PySpark maps | to boolean
    # OR and the analyzer rejects it on longs
    code = F.lit(0).cast("long")
    for i in range(bits):
        for j, qc in enumerate(qs):
            code = code.bitwiseOR(
                F.shiftleft(F.shiftright(qc, i) % 2, i * n + j)
            )
    return code


def morton_interleave(qa: Column, qb: Column, bits: int = 16) -> Column:
    """2-D Morton code (bit i of ``qa`` → 2i, of ``qb`` → 2i+1); the
    general form is ``morton_interleave_n``."""
    return morton_interleave_n([qa, qb], bits)


def with_zorder_code(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
    out_col: str = "zcode",
) -> DataFrame:
    """Add the Z-order code over two numeric columns, quantized
    against their data-derived min/max (one tiny scalar aggregate,
    broadcast back — same geometry as the watermark reads)."""
    bounds = df.agg(
        F.min(col_a).cast("double").alias("__lo_a"),
        F.max(col_a).cast("double").alias("__hi_a"),
        F.min(col_b).cast("double").alias("__lo_b"),
        F.max(col_b).cast("double").alias("__hi_b"),
    )
    qa = quantized(
        F.col(col_a).cast("double"), F.col("__lo_a"), F.col("__hi_a"), bits
    )
    qb = quantized(
        F.col(col_b).cast("double"), F.col("__lo_b"), F.col("__hi_b"), bits
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out_col, morton_interleave(qa, qb, bits))
        .drop("__lo_a", "__hi_a", "__lo_b", "__hi_b")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Rewrite ``df`` as ``num_files`` parquet files range-partitioned
    AND sorted by the Z-order code of (col_a, col_b): rows close in
    the 2-D space cluster into the same files and row groups, so
    two-dimensional range predicates prune via file/row-group min/max
    statistics instead of scanning the table.  The code column is
    kept in the output — engines (and the locality test) can prune on
    it directly, and it costs 8 bytes against the skipping it buys."""
    z = with_zorder_code(df, col_a, col_b, bits)
    (
        z.repartitionByRange(num_files, F.col("zcode"))
        .sortWithinPartitions("zcode")
        .write.mode("overwrite")
        .parquet(path)
    )

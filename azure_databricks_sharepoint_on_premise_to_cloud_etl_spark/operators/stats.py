"""Distributed statistics operators.

Exact percentiles at scale without object-hash aggregation: Spark's
built-in ``percentile`` (exact) and ``approx_percentile`` both run as
TypedImperativeAggregate — per-row JVM-object buffer updates outside
whole-stage codegen, which is the dominant cost on wide scans.  For
grouped percentiles over columns whose distinct-value count is far
below the row count (quantities, prices, scores — the common case),
the histogram formulation is both exact and codegen-friendly:

1. ``groupBy(group, value).count()`` — a codegen hash aggregate with
   map-side partial combine; shuffle volume = distinct values, not
   rows;
2. a per-group window over the (small) histogram accumulates ranks;
3. the interpolated percentile is two conditional aggregates
   (the values bracketing rank ``1 + (n-1)p``) + arithmetic.

Semantics match SQL ``percentile_cont`` / DuckDB ``quantile_cont`` /
Spark ``percentile`` exactly: linear interpolation at fractional rank
``(n-1) * p``.

Scale note: step 2 sorts each group's DISTINCT values through one
partition.  That is the right trade when distinct values per group are
bounded (enumerable measures); for unbounded high-cardinality measures
at extreme scale, the mergeable-sketch path (``approx_percentile`` with
an accuracy picked for rank error ``n / accuracy``) is the swap — same
output columns, documented per-query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_percentiles_exact(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percentiles: dict[str, float],
) -> DataFrame:
    """Exact interpolated percentiles per group via the histogram
    formulation (module docstring).  ``percentiles`` maps output column
    name -> p in [0, 1].  Returns one row per group.

    NULLs in ``value_col`` are excluded, matching the aggregate
    functions this replaces.
    """
    for name, p in percentiles.items():
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"percentile {name}={p} outside [0, 1]")
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*group_cols)
    hist = hist.withColumn("__cum", F.sum("__cnt").over(w_cum)).withColumn(
        "__n", F.sum("__cnt").over(w_all)
    )

    aggs = []
    v = F.col(value_col).cast("double")
    lo_rank_of = lambda k: F.floor(k) + 1  # noqa: E731 — 1-based ranks
    for name, p in percentiles.items():
        # fractional rank k = (n-1)*p; the histogram row holding rank r
        # is the one with cum-cnt < r <= cum
        k = (F.col("__n") - 1) * F.lit(float(p))
        lo_r = lo_rank_of(k)
        hi_r = F.ceil(k) + 1
        covers = lambda r: (F.col("__cum") - F.col("__cnt") < r) & (  # noqa: E731
            F.col("__cum") >= r
        )
        lo_val = F.max(F.when(covers(lo_r), v))
        hi_val = F.max(F.when(covers(hi_r), v))
        frac = F.max(k - F.floor(k))
        aggs.append((lo_val + frac * (hi_val - lo_val)).alias(name))
    return hist.groupBy(*group_cols).agg(*aggs)

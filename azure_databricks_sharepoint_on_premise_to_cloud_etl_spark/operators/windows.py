"""Window-function operators (SURVEY.md section 2.6).

W1/W2: top-1-per-group via row_number (the reference's pattern,
code/ukg_open_census_old.py:140-142, :175-177).
W3: next-row lookup — the reference implements this as an 18-line
boundary-equality self-join (code/ukg_open_census_old.py:716-735);
``F.lead`` over a window is the idiomatic one-pass replacement: one
shuffle on the partition key instead of a self-join's two.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top1_per_group(
    df: DataFrame, partition_cols: list[str], order_col: str, latest: bool = True
) -> DataFrame:
    """One row per group: latest (W1) or earliest (W2) by ``order_col``.

    Ties broken deterministically by the remaining columns so results
    are oracle-stable.  Single shuffle on ``partition_cols``.
    """
    ordering = [
        F.col(order_col).desc() if latest else F.col(order_col).asc(),
        *[F.col(c) for c in df.columns if c != order_col and c not in partition_cols],
    ]
    w = Window.partitionBy(*partition_cols).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def with_next(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    value_cols: dict[str, str],
) -> DataFrame:
    """Attach next-row values per group (W3/J6).

    ``value_cols`` maps source column -> new column name, e.g.
    ``{"startTime": "next_zone_dttm"}``.  Replaces the reference's
    as-of self-join (code/ukg_open_census_old.py:716-735).  Pass a
    unique ``order_cols`` suffix (e.g. an id) for deterministic output
    under timestamp ties.
    """
    w = Window.partitionBy(*partition_cols).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    out = df
    for src, dst in value_cols.items():
        out = out.withColumn(dst, F.lead(src).over(w))
    return out


def rank_topk_per_group(
    df: DataFrame, partition_cols: list[str], order: list[Column], k: int
) -> DataFrame:
    """Top-k rows per group (generalized W1; also the inner loop of the
    similarity-search operators). Deterministic given a total order."""
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def trailing_range_agg(
    df: DataFrame,
    partition_col: str,
    ts_col: str,
    value_col: str,
    trailing_seconds: int = 3600,
) -> DataFrame:
    """Trailing time-RANGE window aggregate: for every event, the sum
    and count of ``value_col`` over the partition's events whose
    timestamp falls in ``[ts - trailing_seconds, ts]`` — a VALUE-based
    frame (``RANGE BETWEEN``), not a row-count frame, so irregular
    event spacing and timestamp ties are handled by time semantics
    (equal-timestamp peers are all in-frame on every engine).

    Adds ``trail_sum`` (6 dp) and ``trail_n``.

    Scale shape: one shuffle on the partition key, then a sorted
    streaming frame per partition — Spark evaluates the bounded RANGE
    frame with a sliding pointer, O(rows) per partition.  Hot
    partition keys are the skew risk, same mitigation as any window:
    pre-bucket by (key, coarse time) if one key dominates.
    """
    # INTERVAL range frame via SQL expression: the DataFrame
    # rangeBetween API takes only long offsets, and every long-based
    # encoding of a timestamp loses something (cast-to-long truncates
    # sub-second parts and widens the frame; unix_micros rejects
    # TIMESTAMP_NTZ and a cast through TIMESTAMP drags session-
    # timezone semantics in).  The interval frame is timezone-free,
    # microsecond-exact, and identical in Spark and ANSI/DuckDB.
    frame = (
        f"OVER (PARTITION BY {partition_col} ORDER BY {ts_col} "
        f"RANGE BETWEEN INTERVAL {trailing_seconds} SECOND PRECEDING "
        f"AND CURRENT ROW)"
    )
    return df.selectExpr(
        "*",
        f"round(sum({value_col}) {frame}, 6) AS trail_sum",
        f"count(1) {frame} AS trail_n",
    )

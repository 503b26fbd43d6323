"""Versioned-snapshot and watermark operators (SURVEY.md sections 2.9,
2.4 J8/J9/J10).

The reference's durability model is *versioned append*: every ingest
stamps a ``RUN_ID`` and readers filter ``run_id = (select max(run_id)
...)`` (code/ukg_open_census.py:336, code/ukg_delta_to_parquet.py:9).
Incrementality is a high-watermark timestamp filter
(code/ukg_open_census.py:342) plus a processed-file ledger the
reference diffs *in Python after two collects*
(code/ukg_open_census.py:357-375) — re-expressed here as a
``left_anti`` join so it stays distributed.

Scale notes: the scalar subquery / max-aggregate is a cheap
all-to-one-row agg (partial max per partition, then one-row exchange);
the anti and semi joins broadcast their small side under AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def latest_snapshot(df: DataFrame, version_col: str = "run_id") -> DataFrame:
    """Keep only rows of the latest version (J8/T3).

    Planned as a scalar-subquery-style max: Spark computes the global
    max with a partial aggregate (no full shuffle of the data) and then
    filters — same shape Catalyst produces for
    ``WHERE run_id = (SELECT max(run_id) FROM t)``.
    """
    mx = F.max(version_col)
    return df.join(
        F.broadcast(df.agg(mx.alias("__max_version"))),
        on=F.col(version_col) == F.col("__max_version"),
        how="inner",
    ).drop("__max_version")


def high_watermark_filter(
    df: DataFrame, ts_col: str, watermark_df: DataFrame, watermark_expr: str
) -> DataFrame:
    """Keep rows strictly newer than ``max(watermark_expr)`` over
    ``watermark_df`` (T1, code/ukg_open_census.py:342).

    The watermark side reduces to one row, broadcast to the filter —
    no driver round-trip, works identically at 100 TB.

    NB: an EMPTY watermark table yields a NULL watermark and therefore
    zero output rows — identical to the reference's scalar-subquery
    semantics (``ts > NULL`` is never true).  First-run bootstrap must
    seed the watermark table (as the reference's DDL inserts do) or
    skip the gate.
    """
    wm = watermark_df.agg(F.expr(f"max({watermark_expr})").alias("__wm"))
    return (
        df.join(F.broadcast(wm), on=F.col(ts_col) > F.col("__wm"), how="inner")
        .drop("__wm")
    )


def unprocessed_only(
    new_df: DataFrame, ledger_df: DataFrame, key_col: str
) -> DataFrame:
    """File-level exactly-once: drop rows whose ``key_col`` already
    appears in the ledger (J9/T2).

    Replaces the reference's two-collect Python set difference
    (code/ukg_open_census.py:357-375) with a distributed
    ``left_anti`` join; the ledger's distinct key set is typically
    small -> broadcast.
    """
    keys = ledger_df.select(key_col).distinct()
    return new_df.join(F.broadcast(keys), on=key_col, how="left_anti")


def member_only(df: DataFrame, members_df: DataFrame, key_col: str) -> DataFrame:
    """Semi-join membership filter (J10): keep rows whose key appears
    in ``members_df`` — the distributed form of the reference's
    collect-to-list qualifier filter (code/ukg_open_census.py:534-541)."""
    keys = members_df.select(key_col).distinct()
    return df.join(F.broadcast(keys), on=key_col, how="left_semi")


def latest_batch_only(df: DataFrame, batch_key: Column, keep_cols: list[str] | None = None) -> DataFrame:
    """Keep only rows belonging to the max batch key (T3 — the
    ``ltst_file`` CTE, code/ukg_open_census.py:344-349): compute
    ``max(batch_key)`` and equi-join rows back on it."""
    keyed = df.withColumn("__batch_key", batch_key)
    mx = keyed.agg(F.max("__batch_key").alias("__max_batch"))
    out = keyed.join(
        F.broadcast(mx), on=F.col("__batch_key") == F.col("__max_batch"), how="inner"
    ).drop("__batch_key", "__max_batch")
    return out.select(*keep_cols) if keep_cols else out


def merge_rollup(
    existing: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str] = (),
    count_cols: list[str] = (),
    min_cols: list[str] = (),
    max_cols: list[str] = (),
) -> DataFrame:
    """Incremental maintenance of a distributive rollup: merge a new
    batch's PARTIAL aggregate into the standing aggregate table
    without ever rescanning the base facts — the materialized-view
    refresh shape every daily pipeline needs once the fact table
    outgrows full recompute.

    ``existing`` and ``delta`` both carry ``keys`` plus the aggregate
    columns; ``delta`` is typically ``partial_rollup`` of just the new
    facts.  sum/count merge by SUM (a count of counts is a sum),
    min by MIN, max by MAX — the distributive-aggregate algebra.
    AVG callers store (sum, count) and divide at read; non-distributive
    aggregates (exact distinct, median) need their own state and are
    deliberately out of scope.

    Scale shape: union of two AGGREGATE-sized tables → one hash
    aggregate on the keys.  The fact table appears nowhere; cost is
    O(|existing| + |delta-agg|) regardless of history size.  Pytest +
    oracle pin merge(existing, delta) == full recompute.
    """
    merged = existing.unionByName(delta)
    aggs = (
        [F.sum(c).alias(c) for c in sum_cols]
        + [F.sum(c).alias(c) for c in count_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    return merged.groupBy(*keys).agg(*aggs)


def partial_rollup(
    facts: DataFrame,
    keys: list[str],
    sum_exprs: dict[str, str] = (),
    count_col: str | None = None,
    min_exprs: dict[str, str] = (),
    max_exprs: dict[str, str] = (),
) -> DataFrame:
    """The batch-side half of :func:`merge_rollup`: aggregate ONE
    batch of facts into the rollup's schema (map each output column
    to its source expression)."""
    aggs = [F.sum(F.expr(src)).alias(dst) for dst, src in dict(sum_exprs).items()]
    if count_col:
        aggs.append(F.count(F.lit(1)).alias(count_col))
    aggs += [F.min(F.expr(src)).alias(dst) for dst, src in dict(min_exprs).items()]
    aggs += [F.max(F.expr(src)).alias(dst) for dst, src in dict(max_exprs).items()]
    return facts.groupBy(*keys).agg(*aggs)

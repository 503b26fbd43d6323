"""Slowly-changing-dimension maintenance (SCD type 2): versioned
upsert of a dimension table from an update batch.

The reference pipeline refreshes its mapping/dimension tables by full
overwrite (code/ukg_open_census.py's overwrite pattern + the M5
RUN_ID snapshot family); SCD2 is the standard warehouse upgrade of
that: keep every historical version with a validity interval instead
of destroying it, so fact joins can be AS-OF correct (this pairs with
``operators.windows.asof_join`` for point-in-time lookups).

Everything is set algebra — one full-outer join per batch, no
row-at-a-time merge loop:

- close the current version of every key whose tracked attributes
  actually changed (``valid_to`` = the update's effective time),
- open a new version for changed and brand-new keys,
- pass unchanged/untouched rows through byte-identical.

Scale shape: ONE shuffle on the business key for the outer join
(update batches are usually dimension-sized → broadcast); history
rows are untouched and at rest under a lake format would not even be
rewritten.  Change detection is a null-safe struct comparison —
codegen, no per-column python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: list[str],
    eff_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension and return the new
    full dimension state (history + closed-out + currents).

    ``dim`` carries ``key_col``, ``attr_cols``, ``valid_from``,
    ``valid_to`` (NULL = open) and ``current_col``; ``updates``
    carries ``key_col``, ``attr_cols``, ``eff_col``.  Multiple
    updates for one key in a batch collapse to the latest by
    ``eff_col`` (deterministic tie-break on the attribute struct) —
    intra-batch intermediate versions are NOT materialized, matching
    one-merge-per-batch warehouse semantics.  An update identical to
    the key's current attributes is a no-op, not a new version.
    """
    attrs = lambda side: F.struct(  # noqa: E731 — local comparator
        *[F.col(f"{side}.{c}") for c in attr_cols]
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col(eff_col).desc(), *[F.col(c).desc() for c in attr_cols]
    )
    latest = (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    hist = dim.filter(~F.col(current_col))
    cur = dim.filter(F.col(current_col))
    j = cur.alias("c").join(latest.alias("u"), key_col, "full_outer")

    has_cur = F.col(f"c.{valid_from}").isNotNull()
    has_upd = F.col(f"u.{eff_col}").isNotNull()
    changed = has_cur & has_upd & ~attrs("c").eqNullSafe(attrs("u"))

    # ONE pass over the join: each row conditionally emits its
    # surviving-current / closed / newly-opened versions through a
    # filtered-array explode.  Three filtered branches off the same
    # join would re-expand the whole upstream into the plan (the plan
    # audit flags it as a many-scan smell) — a row can yield up to
    # two outputs (closed + opened), so emit rows, don't re-join.
    def version(attr_side, vf, vt, cur):
        return F.struct(
            *[F.col(f"{attr_side}.{c}").alias(c) for c in attr_cols],
            vf.alias(valid_from),
            vt.alias(valid_to),
            cur.alias(current_col),
        )

    no_end = F.lit(None).cast(dim.schema[valid_to].dataType)
    emit = F.array(
        F.when(
            has_cur & ~changed,
            version("c", F.col(f"c.{valid_from}"), F.col(f"c.{valid_to}"), F.lit(True)),
        ),
        F.when(
            changed,
            version("c", F.col(f"c.{valid_from}"), F.col(f"u.{eff_col}"), F.lit(False)),
        ),
        F.when(
            changed | (has_upd & ~has_cur),
            version("u", F.col(f"u.{eff_col}"), no_end, F.lit(True)),
        ),
    )
    out = j.select(
        F.col(key_col),
        F.explode(F.filter(emit, lambda v: v.isNotNull())).alias("__v"),
    ).select(key_col, "__v.*")
    return hist.select(out.columns).unionByName(out)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str],
    change_col: str = "change_type",
) -> DataFrame:
    """Change-data-capture between two keyed snapshots: classify every
    key as ``insert`` / ``update`` / ``delete`` and return only the
    changed rows (the change feed), carrying the new values — old
    values for deletes.

    This is the producing twin of the M5/RUN_ID snapshot family
    (pkg/sinks/writers.py): the reference pipeline writes versioned
    full snapshots (code/ukg_open_census.py's overwrite + RUN_ID
    pattern); diffing two of them yields the incremental feed that a
    downstream SCD2 merge (``scd2_merge``) or a streaming CDC consumer
    ingests, without the source ever producing deltas itself.

    Scale shape: ONE full-outer shuffle join on the business key;
    change detection is a null-safe struct comparison (codegen, no
    per-column python); unchanged keys — the overwhelming majority of
    a 100 TB dimension between adjacent runs — are filtered before
    anything else happens, so the output is delta-sized.
    """
    # Pack each side's attributes into ONE struct BEFORE the join:
    # post-join the whole struct is NULL exactly when that side is
    # absent, so presence detection never confuses a missing row with
    # a present row whose attributes happen to be NULL.
    o = old.select(
        F.col(key_col),
        F.struct(*[F.col(c) for c in compare_cols]).alias("__old"),
    )
    n = new.select(
        F.col(key_col),
        F.struct(*[F.col(c) for c in compare_cols]).alias("__new"),
    )
    j = o.join(n, key_col, "full_outer")
    kind = (
        F.when(F.col("__old").isNull(), F.lit("insert"))
        .when(F.col("__new").isNull(), F.lit("delete"))
        .when(~F.col("__old").eqNullSafe(F.col("__new")), F.lit("update"))
    )
    return (
        j.withColumn(change_col, kind)
        .filter(F.col(change_col).isNotNull())
        .select(
            key_col,
            F.col(change_col),
            # new values for insert/update; old values for delete —
            # selected by side presence, NOT coalesce, so an update
            # that nulls an attribute reports the NULL, not the old
            # value
            *[
                F.when(F.col("__new").isNull(), F.col(f"__old.{c}"))
                .otherwise(F.col(f"__new.{c}"))
                .alias(c)
                for c in compare_cols
            ],
        )
    )


def cdc_apply(
    snapshot: DataFrame,
    changelog: DataFrame,
    key_col: str,
    attr_cols: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply an ordered I/U/D change log to a snapshot — the MERGE
    INTO / Debezium-after-image shape: per key the HIGHEST-``seq``
    change wins, ``D`` removes the key, ``I``/``U`` upsert the full
    attribute image, untouched keys pass through byte-identical.
    Returns the new snapshot.

    Complements :func:`scd2_merge`: that keeps history with validity
    intervals; this maintains the current-state table a CDC stream
    feeds.  Intra-batch ordering is by ``seq_col`` (log offset /
    LSN), so replaying a batch of micro-batches in one call gives the
    same result as applying them one at a time (associativity the
    test pins).

    Scale shape: the changelog collapses to one row per key (window
    top-1 over the batch — changelog-sized, not snapshot-sized), then
    ONE full-outer join on the key against the snapshot.  CDC batches
    are usually tiny next to the snapshot → AQE broadcasts the
    collapsed log and the snapshot is never shuffled.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    latest = (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    j = snapshot.alias("s").join(latest.alias("c"), key_col, "full_outer")
    has_change = F.col(f"c.{op_col}").isNotNull()
    deleted = has_change & (F.col(f"c.{op_col}") == "D")
    return (
        j.filter(~deleted)
        .select(
            F.col(key_col),
            *[
                F.when(has_change, F.col(f"c.{a}"))
                .otherwise(F.col(f"s.{a}"))
                .alias(a)
                for a in attr_cols
            ],
        )
    )


def golden_record(
    df: DataFrame,
    entity_col: str,
    order_col,
    attr_cols: list[str],
) -> DataFrame:
    """Field-level survivorship merge (MDM 'golden record'): one row
    per entity where EACH attribute independently takes its value from
    the latest row — under ``order_col``, which must be a total order
    within the entity (pass a unique expression, e.g.
    ``struct(ts, event_id)`` collapsed to one sortable column) — whose
    value for that attribute is NOT NULL.  This is the per-FIELD
    refinement of top-1-per-group survivorship: a fresher row with a
    NULL phone must not erase the older row's phone.

    Scale shape: ONE hash aggregate of ``max_by(attr, order WHERE attr
    IS NOT NULL)`` per attribute — map-side combinable, no window sort
    over the entity's history, no self-join.  ``max_by`` ignores rows
    whose ordering key is NULL, so the null-skip is expressed by
    nulling the KEY (the DuckDB twin is ``arg_max``, which has the
    same null-key semantics).  Also returns ``n_versions`` and the
    latest order value for lineage.
    """
    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    aggs = [
        F.max_by(
            F.col(a), F.when(F.col(a).isNotNull(), oc)
        ).alias(a)
        for a in attr_cols
    ]
    return df.groupBy(entity_col).agg(
        *aggs,
        F.count(F.lit(1)).alias("n_versions"),
        F.max(oc).alias("last_order_key"),
    )

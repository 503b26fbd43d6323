"""Hierarchical-location operators (SURVEY.md section 2.4 J4/J5).

The reference matches facts to schedule zones at three granularities —
exact location, 4-level cost-center prefix, 5-level prefix — by running
three joins, unioning, and deduping (code/ukg_open_census.py:710-727).
We keep those union-of-joins semantics (SURVEY 7.5 risk 1 pins the NEW
variant: union all levels then distinct, no per-level filtering) but
with native prefix expressions instead of the reference's Python UDFs.

Scale: the zone/dim side is small -> broadcast all three joins; the
fact side is scanned once per level.  For a truly large dim, switch to
the exploded-prefix-key single join (``fallback_join_exploded``):
one shuffle join on a single composite key instead of three passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import prefix_path


def hierarchical_fallback_join(
    facts: DataFrame,
    dims: DataFrame,
    fact_path_col: str,
    dim_path_col: str,
    levels: tuple[int, ...] = (4, 5),
) -> DataFrame:
    """Union of exact + per-level prefix joins, then distinct (J4).

    Level 0 (exact): fact.path == dim.path;
    level k: prefix_path(fact.path, k) == dim.path — a zone defined at
    cost-center level matches every location under it.
    """
    d = dims.withColumnRenamed(dim_path_col, "__dim_path")
    joined = [
        facts.join(
            F.broadcast(d), facts[fact_path_col] == d["__dim_path"], "inner"
        )
    ]
    for lv in levels:
        joined.append(
            facts.join(
                F.broadcast(d),
                prefix_path(facts[fact_path_col], lv) == d["__dim_path"],
                "inner",
            )
        )
    out = joined[0]
    for j in joined[1:]:
        out = out.unionByName(j)
    return out.drop("__dim_path").distinct()


def fallback_join_exploded(
    facts: DataFrame,
    dims: DataFrame,
    fact_path_col: str,
    dim_path_col: str,
    levels: tuple[int, ...] = (4, 5),
    broadcast_dims: bool = True,
) -> DataFrame:
    """Same semantics as :func:`hierarchical_fallback_join` as ONE join:
    explode each fact into its candidate keys (exact + each prefix),
    equi-join once on the candidate key, distinct.

    One pass over facts instead of N join passes.  ``broadcast_dims``
    (default: zone tables are dimension-sized) pins the broadcast-hash
    strategy — dims built from aggregates have no stats, and Catalyst
    would otherwise fall back to a sort-merge join; pass False for a
    genuinely large dim side to get the shuffle join.
    """
    cands = F.array_distinct(
        F.array(
            F.col(fact_path_col),
            *[prefix_path(F.col(fact_path_col), lv) for lv in levels],
        )
    )
    exploded = facts.withColumn("__cand", F.explode(cands))
    d = dims.withColumnRenamed(dim_path_col, "__cand")
    if broadcast_dims:
        d = F.broadcast(d)
    return exploded.join(d, "__cand", "inner").drop("__cand").distinct()


def coalesce_fallback_columns(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    fallback_cols: dict[str, tuple[str, str]],
) -> DataFrame:
    """Left join + coalesce fill (J5, code/ukg_open_census_old.py:208-212):
    for each output col, take the left value unless null, else the
    right's.  ``fallback_cols`` maps output -> (left_col, right_col)."""
    j = left.join(right, on, "left")
    for out_col, (lc, rc) in fallback_cols.items():
        j = j.withColumn(out_col, F.coalesce(F.col(lc), F.col(rc)))
    return j

"""Reshape operators: wide<->long pivots of a DataFrame.

``pivot_wide`` (long -> wide) lives at its query site via Spark's
native ``groupBy().pivot()``; this module holds the inverse.  Melt is
pure projection + explode — no shuffle, no aggregation — so it
composes freely before grouped operators that want long format
(per-metric quantiles, drift checks, expectation audits over metric
families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Unpivot wide columns into (variable, value) rows — pandas
    ``melt`` / SQL ``UNPIVOT``: each input row yields
    ``len(value_cols)`` output rows.  Values are cast to double (the
    common supertype an UNPIVOT needs); NULL values are KEPT so the
    long table faithfully represents the wide one (filter after if
    sparse semantics are wanted).

    Scale shape: a per-row ``explode`` of a ``len(value_cols)``-entry
    struct array — narrow projection in, no shuffle, output is
    rows × metrics exactly like the SQL UNPIVOT plan.
    """
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias(var_name),
                F.col(c).cast("double").alias(value_name),
            )
            for c in value_cols
        ]
    )
    return df.select(
        *id_cols, F.explode(entries).alias("__kv")
    ).select(
        *id_cols,
        F.col(f"__kv.{var_name}").alias(var_name),
        F.col(f"__kv.{value_name}").alias(value_name),
    )

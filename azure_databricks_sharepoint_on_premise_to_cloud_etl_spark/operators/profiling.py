"""Single-scan data profiling / quality constraints (the
deequ/dbt-test shape): per-column completeness, cardinality, and
bounds computed as ONE fused aggregate over the table, then pivoted
to a long (column, metric) result.

At 100 TB the only acceptable profiling plan is a single pass: every
per-column metric is an aggregate expression in the SAME ``agg`` call,
so Spark computes all of them in one scan with map-side partial
aggregation — never one job per column (the naive loop is a full
table scan per metric).  Exact ``count_distinct`` over many columns
multiplies shuffle width; the documented swap at extreme scale is
``approx_count_distinct`` per column (HLL sketches, still one pass).

Extends the reference's audit habit (row-count gates before
publishing, code/ukg_open_census.py's count checks) into a
column-level contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile ``cols`` in one scan.  Output: one row per column with
    ``n_rows``, ``n_null``, ``null_frac`` (6 dp), ``n_distinct``
    (exact, nulls excluded), and ``min_str`` / ``max_str`` (the
    bounds cast to strings so heterogeneous column types share one
    schema)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"__null_{c}"),
            F.count_distinct(col).alias(f"__nd_{c}"),
            F.min(col).cast("string").alias(f"__min_{c}"),
            F.max(col).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null_{c}").alias("n_null"),
            F.round(F.col(f"__null_{c}") / F.col("__n"), 6).alias("null_frac"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_str"),
            F.col(f"__max_{c}").alias("max_str"),
        )
        for c in cols
    ]
    return wide.select(
        F.explode(F.array(*per_col)).alias("p")
    ).select("p.*")


def check_constraints(
    profile: DataFrame, constraints: dict[str, dict[str, float]]
) -> DataFrame:
    """Evaluate declarative column constraints against a
    ``profile_columns`` result: ``{column: {"max_null_frac": x,
    "min_distinct": n}}`` → one row per (column, constraint) with
    pass/fail — the publish gate a pipeline asserts on before a
    write, driver-side-cheap because the profile is |columns| rows."""
    rows = []
    for col, cs in constraints.items():
        for kind, bound in cs.items():
            rows.append((col, kind, float(bound)))
    spark = profile.sparkSession
    cons = spark.createDataFrame(
        rows, "column STRING, constraint STRING, bound DOUBLE"
    )
    joined = profile.join(cons, "column")
    passed = (
        F.when(
            F.col("constraint") == "max_null_frac",
            F.col("null_frac") <= F.col("bound"),
        )
        .when(
            F.col("constraint") == "min_distinct",
            F.col("n_distinct") >= F.col("bound"),
        )
        .otherwise(F.lit(False))
    )
    return joined.select(
        "column", "constraint", "bound", passed.alias("passed")
    )


def fk_integrity(
    checks: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit across table pairs — the classic
    warehouse publish gate (every fact row's dimension key must
    resolve): for each ``(name, child, child_key, parent, parent_key)``
    check, report child row count, distinct child keys, orphan keys
    (child keys absent from the parent, nulls counted separately as
    their own failure class), and the ROW count those orphan keys
    carry.

    Scale shape: each check collapses the child to its per-key row
    counts FIRST (one codegen hash aggregate; shuffle volume =
    distinct keys, not fact rows — the fact table is scanned exactly
    ONCE per check), marks each key with one left join against the
    parent's distinct keys (dimension-sized — AQE broadcasts it),
    and folds every metric out of ONE conditional aggregate over the
    marked key table.  All checks union into ONE result plan (one
    driver action), each a single row keyed by ``relation``.

    Returns ``(relation, n_rows, n_null_rows, n_keys, n_orphan_keys,
    n_orphan_rows)`` ordered by relation name.
    """
    outs = []
    for name, child, child_key, parent, parent_key in checks:
        k = F.col(child_key)
        per_key = child.groupBy(k.alias("__k")).agg(
            F.count(F.lit(1)).alias("__n")
        )
        marked = per_key.join(
            parent.select(F.col(parent_key).alias("__k"))
            .distinct()
            .withColumn("__hit", F.lit(1)),
            "__k",
            "left",
        )
        is_null = F.col("__k").isNull()
        is_orphan = F.col("__k").isNotNull() & F.col("__hit").isNull()
        outs.append(
            marked.agg(
                F.lit(name).alias("relation"),
                F.coalesce(F.sum("__n"), F.lit(0)).alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(is_null, F.col("__n"))), F.lit(0)
                ).alias("n_null_rows"),
                F.count(F.col("__k")).alias("n_keys"),
                F.coalesce(
                    F.sum(is_orphan.cast("long")), F.lit(0)
                ).alias("n_orphan_keys"),
                F.coalesce(
                    F.sum(F.when(is_orphan, F.col("__n"))), F.lit(0)
                ).alias("n_orphan_rows"),
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionAll(o)
    return result.orderBy("relation")


def expectation_audit(
    df: DataFrame, expectations: list[dict]
) -> DataFrame:
    """Row-level data-quality expectations evaluated in ONE scan —
    the publish gate richer than :func:`check_constraints` (which
    audits a column *profile*): each expectation counts its violating
    ROWS, so the report says "142 of 1.5M orders break the price
    range", not just "a profile stat is off".

    ``expectations`` is a list of dicts::

        {"column": c, "kind": "not_null"}
        {"column": c, "kind": "range", "lo": x, "hi": y}
        {"column": c, "kind": "in_set", "values": [...]}
        {"column": c, "kind": "regexp", "pattern": r"..."}
        {"column": c, "kind": "unique"}

    NULLs only violate ``not_null`` (the other kinds skip them, so a
    nullable column wants both expectations — standard
    expectation-suite semantics).

    Scale shape: every row-level expectation is a conditional-sum
    column of the SAME single hash aggregate (map-side combined, one
    scan regardless of suite size); ``unique`` rides the same
    aggregate as ``count - count_distinct``.  The one aggregate row
    is then exploded to one output row per expectation — driver-free
    and constant-sized.

    Returns one row per expectation:
    (column, expectation, detail, n_rows, n_violations,
    violation_rate, passed).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    metas = []
    for i, ex in enumerate(expectations):
        c = F.col(ex["column"])
        kind = ex["kind"]
        if kind == "not_null":
            cond = c.isNull()
            detail = ""
        elif kind == "range":
            lo, hi = ex["lo"], ex["hi"]
            cond = c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))
            detail = f"[{lo}, {hi}]"
        elif kind == "in_set":
            vals = list(ex["values"])
            cond = c.isNotNull() & ~c.isin(vals)
            detail = f"{len(vals)} allowed"
        elif kind == "regexp":
            pat = ex["pattern"]
            cond = c.isNotNull() & ~c.rlike(pat)
            detail = pat
        elif kind == "unique":
            cond = None
            detail = ""
        else:
            raise ValueError(f"unknown expectation kind: {kind!r}")
        if cond is None:
            aggs.append(
                (F.count(c) - F.count_distinct(c)).alias(f"__v{i}")
            )
        else:
            aggs.append(
                F.coalesce(
                    F.sum(cond.cast("long")), F.lit(0)
                ).alias(f"__v{i}")
            )
        metas.append((ex["column"], kind, detail))
    one = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(col).alias("column"),
            F.lit(kind).alias("expectation"),
            F.lit(detail).alias("detail"),
            F.col(f"__v{i}").cast("long").alias("n_violations"),
        )
        for i, (col, kind, detail) in enumerate(metas)
    ]
    exploded = one.select(
        F.col("__n").alias("n_rows"),
        F.explode(F.array(*entries)).alias("__e"),
    )
    rate = F.col("__e.n_violations").cast("double") / F.col(
        "n_rows"
    ).cast("double")
    return exploded.select(
        F.col("__e.column").alias("column"),
        F.col("__e.expectation").alias("expectation"),
        F.col("__e.detail").alias("detail"),
        "n_rows",
        F.col("__e.n_violations").alias("n_violations"),
        F.round(
            F.when(F.col("n_rows") > 0, rate).otherwise(F.lit(0.0)), 6
        ).alias("violation_rate"),
        (F.col("__e.n_violations") == 0).alias("passed"),
    )


def capture_recapture(
    df,
    source_col: str,
    key_col: str,
    source_a: str,
    source_b: str,
):
    """Chapman capture–recapture estimate of the TRUE population size
    behind two overlapping samples — the ecology estimator repurposed
    for corpus ops: how many distinct documents/shingles/entities
    exist in the wild, given two crawls that each saw a subset?
    (``N̂ = (n₁+1)(n₂+1)/(m+1) − 1``, the bias-corrected
    Lincoln–Petersen; m = keys seen by BOTH sources.)

    Assumes the two samples are (approximately) independent captures —
    the standard caveat; correlated crawls bias N̂ low.

    Scale shape: one hash aggregate keyed on the capture key (the
    exact-dedup shuffle: volume = distinct keys, map-side combined
    max-flags), then a single-row reduce.  Variance is Chapman's
    closed form; the 95% CI is the normal approximation, lazy-CASE
    guarded for degenerate shapes (no overlap keeps the estimate but
    the CI needs m ≥ 1 to be meaningful).

    Returns one row: (n_a, n_b, n_both, n_hat, se_hat, ci_low,
    ci_high).
    """
    from pyspark.sql import functions as F

    s = F.col(source_col)
    per_key = (
        df.filter(s.isin(source_a, source_b))
        .groupBy(key_col)
        .agg(
            F.max((s == source_a).cast("int")).alias("__a"),
            F.max((s == source_b).cast("int")).alias("__b"),
        )
    )
    m = per_key.agg(
        F.sum("__a").cast("long").alias("n_a"),
        F.sum("__b").cast("long").alias("n_b"),
        F.sum(F.col("__a") * F.col("__b")).cast("long").alias("n_both"),
    )
    n1 = F.col("n_a").cast("double")
    n2 = F.col("n_b").cast("double")
    mm = F.col("n_both").cast("double")
    n_hat = (n1 + 1) * (n2 + 1) / (mm + 1) - 1
    var = (
        (n1 + 1)
        * (n2 + 1)
        * (n1 - mm)
        * (n2 - mm)
        / ((mm + 1) * (mm + 1) * (mm + 2))
    )
    se = F.when(var >= 0, F.sqrt(var))
    staged = m.select(
        "n_a",
        "n_b",
        "n_both",
        F.round(n_hat, 2).alias("n_hat"),
        F.round(se, 2).alias("se_hat"),
    )
    return staged.select(
        "n_a",
        "n_b",
        "n_both",
        "n_hat",
        "se_hat",
        F.round(
            F.greatest(
                F.col("n_hat") - 1.96 * F.col("se_hat"), F.lit(0.0)
            ),
            2,
        ).alias("ci_low"),
        F.round(F.col("n_hat") + 1.96 * F.col("se_hat"), 2).alias(
            "ci_high"
        ),
    )


def functional_dependency_audit(
    df,
    lhs_cols: list[str],
    rhs_col: str,
):
    """Audit a candidate functional dependency ``lhs → rhs`` — the
    data-contract check behind "order id determines customer",
    "SKU determines category": count LHS groups whose RHS is NOT
    unique, plus the row mass trapped in those violating groups (the
    practical severity — one dirty group of a million rows matters
    more than a thousand two-row flips).

    Scale shape: ONE hash aggregate keyed on the LHS (map-side
    partial count-distinct via a two-level collapse: (lhs, rhs) cells
    first, then per-lhs counts), one single-row reduce after — the
    exact-dedup shuffle discipline, nothing corpus-grain twice.

    Returns one row: (n_rows, n_groups, n_violating, violation_share,
    n_rows_violating, row_violation_share).
    """
    from pyspark.sql import functions as F

    if not lhs_cols:
        raise ValueError("lhs_cols must be non-empty")
    base = df.filter(F.col(rhs_col).isNotNull())
    for c in lhs_cols:
        base = base.filter(F.col(c).isNotNull())
    cells = base.groupBy(*lhs_cols, rhs_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    per_lhs = cells.groupBy(*lhs_cols).agg(
        F.sum("__c").alias("__rows"),
        F.count(F.lit(1)).alias("__nrhs"),
    )
    m = per_lhs.agg(
        F.sum("__rows").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum((F.col("__nrhs") > 1).cast("long")).alias("n_violating"),
        F.sum(
            F.when(F.col("__nrhs") > 1, F.col("__rows")).otherwise(0)
        ).cast("long").alias("n_rows_violating"),
    )
    return m.select(
        "n_rows",
        "n_groups",
        "n_violating",
        F.round(
            F.when(
                F.col("n_groups") > 0,
                F.col("n_violating").cast("double") / F.col("n_groups"),
            ),
            6,
        ).alias("violation_share"),
        "n_rows_violating",
        F.round(
            F.when(
                F.col("n_rows") > 0,
                F.col("n_rows_violating").cast("double")
                / F.col("n_rows"),
            ),
            6,
        ).alias("row_violation_share"),
    )

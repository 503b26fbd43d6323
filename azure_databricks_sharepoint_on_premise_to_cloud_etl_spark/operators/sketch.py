"""Mergeable frequency sketches: count-min over token streams.

A count-min sketch (Cormode & Muthukrishnan 2005) answers point
frequency queries over a stream/corpus in O(depth x width) space with
one-sided error: estimate >= truth always, each row's expected
overcount is at most ``N/width`` (Markov), and taking the min across
``depth`` independent rows drives the tail down exponentially in
depth.  At 100 TB the exact term-frequency table is
itself huge; the sketch is FIXED-SIZE and MERGEABLE — each executor
builds partial cells map-side and the shuffle carries at most
``depth x width`` rows per partition, never the vocabulary.

Hashing uses engine-native ``xxhash64`` over ``"{row}#{term}"``
strings — deterministic and reproducible in the DuckDB oracle through
the ``spark_xxhash64`` UDF (tools/xxh64_oracle.py), so the sketch
cells and every estimate are full value-hash verifiable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _bucket(term, row: int, width: int):
    """Row-``row`` bucket of ``term``: pmod(xxhash64('row#term'), width).

    One string concat per (term, row) keeps the hash single-argument —
    the only xxhash64 shape the cross-engine oracle twin reproduces.
    """
    return F.pmod(
        F.xxhash64(F.concat(F.lit(f"{row}#"), term)), F.lit(width)
    ).cast("int")


def cms_cells(
    term_counts: DataFrame,
    term_col: str = "term",
    count_col: str = "cnt",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build count-min cells from a (term, count) frequency table.

    The input is the COLLAPSED term-frequency table (tf per term), so
    the explode below is vocabulary-sized x depth, not corpus-sized;
    the (row, bucket) aggregate partial-combines map-side down to at
    most ``depth x width`` cells.  Returns (row, bucket, cell).
    """
    buckets = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _bucket(F.col(term_col), r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        term_counts.select(
            F.col(count_col).alias("__c"), F.explode(buckets).alias("__rb")
        )
        .groupBy(
            F.col("__rb.row").alias("row"), F.col("__rb.bucket").alias("bucket")
        )
        .agg(F.sum("__c").alias("cell"))
    )


def cms_estimate(
    cells: DataFrame,
    terms: DataFrame,
    term_col: str = "term",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate each term in ``terms`` against sketch ``cells``:
    min over rows of the term's bucket cell (0 when a bucket is empty,
    which can only happen for terms absent from the sketch).

    The probe explodes ``depth`` rows per queried term and equi-joins
    (row, bucket) against the sketch — the sketch side is at most
    ``depth x width`` rows and broadcasts.  Extra columns on ``terms``
    ride through.  Returns ``terms``'s columns plus ``cms_est``.
    """
    out_cols = [c for c in terms.columns]
    probes = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _bucket(F.col(term_col), r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    # Alias the sketch side so a terms frame that already carries
    # row/bucket/cell columns cannot make the join ambiguous.
    sketch = cells.select(
        F.col("row").alias("__srow"),
        F.col("bucket").alias("__sbucket"),
        F.col("cell").alias("__scell"),
    )
    return (
        terms.select(*out_cols, F.explode(probes).alias("__rb"))
        .join(
            F.broadcast(sketch),
            (F.col("__rb.row") == F.col("__srow"))
            & (F.col("__rb.bucket") == F.col("__sbucket")),
            "left",
        )
        .groupBy(*out_cols)
        .agg(F.min(F.coalesce(F.col("__scell"), F.lit(0))).alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# Portable HyperLogLog (Flajolet et al. 2007): cardinality estimation
# whose every intermediate — bucket maxima, dyadic harmonic sum,
# estimate — is reproducible in the DuckDB oracle, unlike the engine-
# native approx_count_distinct sketches (engine-specific by
# construction; see q_corpus_cardinality's docstring).
# ---------------------------------------------------------------------------

HLL_P = 12  # 2^12 = 4096 buckets, ~1.6% standard error
_HLL_RHO_CAP = 40  # see hll_cardinality determinism note


def hll_cardinality(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = HLL_P,
) -> DataFrame:
    """HyperLogLog distinct-count estimate per group, deterministic
    cross-engine — returns ``(group..., hll_estimate, buckets_used)``.

    Sketch shape (the 100 TB path): one ``xxhash64`` per row, then ONE
    hash aggregate ``max(rho) GROUP BY (group, bucket)`` whose shuffle
    carries at most ``2^p`` rows per group regardless of key
    cardinality, then a ``2^p``-bounded per-group collapse.  Contrast
    with exact ``count_distinct``, which shuffles every distinct key.

    Determinism (what makes this ORACLE-VERIFIABLE, not just tested
    for relative error):

    - bucket = low ``p`` bits of xxhash64; rho = position of the first
      1-bit of the REMAINING 64-p bits, computed as
      ``(64-p) - length(bin(w)) + 1`` — a STRING length, not a float
      log, so it is exact in both engines;
    - rho is capped at ``_HLL_RHO_CAP`` = 40: every ``2^-rho`` term is
      then a dyadic rational with denominator ≤ 2^40 and the harmonic
      sum of ≤ 2^p such terms stays below 2^13, so every partial sum
      is exactly representable in a double and the sum is ASSOCIATION-
      INVARIANT — Spark's partial aggregation and DuckDB's sequential
      scan produce bit-identical sums.  The cap's bias is absurdly
      below the sketch's own error (it binds with probability
      ~2^-40 per bucket);
    - empty buckets contribute 2^0 = 1 each (m - buckets_used added
      driver-free as a column expression);
    - the final estimate applies the standard alpha_m bias correction
      and the small-range linear-counting switch, and rounds to 4
      decimals — the one float op (a log in linear counting) sits far
      inside the rounding step.
    """
    # hash the STRING form: xxhash64 of a native long hashes its
    # little-endian bytes, which the oracle's spark_xxhash64 UDF
    # (string-input) cannot reproduce.  Logical right shift by p via
    # shiftrightunsigned — exact on the two's-complement bit pattern
    # (DuckDB twin: CAST to UBIGINT then >> p).  Empty buckets
    # contribute 2^0 = 1 each inside the estimate collapse.
    groups = list(group_cols or [])
    return hll_estimate_from_buckets(
        hll_buckets(df, key_col, groups, p), groups, p
    )


def hll_buckets(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = HLL_P,
) -> DataFrame:
    """Per-bucket HLL register table ``(group..., __b, __mr)`` — the
    MERGEABLE form of :func:`hll_cardinality`'s sketch (same hash,
    bucket, rho, and cap; see that docstring for the determinism
    argument).  Register tables for different sets union-merge with
    ``max(__mr)`` per bucket, which is exactly the sketch of the set
    union — the basis for distributed set algebra over 100 TB inputs
    where the exact distinct sets never co-locate.
    """
    m = 1 << p
    groups = list(group_cols or [])
    h = F.xxhash64(F.col(key_col).cast("string"))
    bucket = F.pmod(h, F.lit(m)).cast("int")
    w = F.shiftrightunsigned(h, p)
    rho = F.when(
        w > 0, F.lit(64 - p) - F.length(F.bin(w)) + F.lit(1)
    ).otherwise(F.lit(64 - p + 1))
    rho = F.least(rho, F.lit(_HLL_RHO_CAP)).cast("int")
    return (
        df.select(*groups, bucket.alias("__b"), rho.alias("__rho"))
        .groupBy(*groups, "__b")
        .agg(F.max("__rho").alias("__mr"))
    )


def hll_merge(*bucket_tables: DataFrame) -> DataFrame:
    """Merge HLL register tables (same grouping schema) into the
    sketch of the UNION of their underlying sets: unionAll + one
    ``max`` re-aggregate per (group, bucket)."""
    assert bucket_tables, "need at least one register table"
    merged = bucket_tables[0]
    for t in bucket_tables[1:]:
        merged = merged.unionByName(t)
    keys = [c for c in merged.columns if c != "__mr"]
    return merged.groupBy(*keys).agg(F.max("__mr").alias("__mr"))


def hll_estimate_from_buckets(
    buckets: DataFrame,
    group_cols: list[str] | None = None,
    p: int = HLL_P,
) -> DataFrame:
    """Collapse a register table into ``(group..., hll_estimate,
    buckets_used)`` — identical math to :func:`hll_cardinality`
    (alpha_m bias correction + linear-counting switch, association-
    invariant dyadic harmonic sum)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    groups = list(group_cols or [])
    collapsed = buckets.groupBy(*groups).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("__mr"))).alias("__hsum"),
        F.count(F.lit(1)).alias("buckets_used"),
    )
    hsum = F.col("__hsum") + (F.lit(m) - F.col("buckets_used"))
    raw = F.lit(alpha * m * m) / hsum
    zeros = F.lit(m) - F.col("buckets_used")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return collapsed.select(
        *groups,
        F.round(est, 4).alias("hll_estimate"),
        "buckets_used",
    )


def countsketch_cells(
    term_counts: DataFrame,
    term_col: str = "term",
    count_col: str = "cnt",
    depth: int = 5,
    width: int = 2048,
) -> DataFrame:
    """AMS/Count-Sketch cells from a (term, count) frequency table:
    ``cell[r][b] = sum of sign_r(term) * count`` over terms hashing to
    bucket ``b`` in row ``r`` (bucket hash shared with the CMS
    ``_bucket``; sign is the parity of an independently-prefixed
    xxhash64, mapped to ±1).

    Unlike count-min the cells carry SIGNS, which makes the inner
    product of two sketches an UNBIASED estimator of the join size
    Σ_k f_A(k)·f_B(k) (Alon–Matias–Szegedy) instead of an upper
    bound.  Every cell is an integer — cross-engine exact, so the
    DuckDB twin verifies the estimator's VALUES.  Same scale shape as
    cms_cells: vocabulary-sized explode, ≤ depth×width rows out.
    """
    rows = []
    for r in range(depth):
        sign = (
            F.pmod(
                F.xxhash64(
                    F.concat(F.lit(f"s{r}#"), F.col(term_col))
                ),
                F.lit(2),
            )
            * 2
            - 1
        )
        rows.append(
            F.struct(
                F.lit(r).alias("row"),
                _bucket(F.col(term_col), r, width).alias("bucket"),
                (sign * F.col(count_col)).alias("signed"),
            )
        )
    return (
        term_counts.select(F.explode(F.array(*rows)).alias("__rb"))
        .groupBy(
            F.col("__rb.row").alias("row"),
            F.col("__rb.bucket").alias("bucket"),
        )
        .agg(F.sum("__rb.signed").alias("cell"))
    )


def countsketch_inner_product(
    cells_a: DataFrame, cells_b: DataFrame, depth: int = 5
) -> DataFrame:
    """Join-size estimate from two Count-Sketch cell tables built with
    the SAME depth/width: per-row inner product Σ_b cellA·cellB, then
    the exact median across the (odd) depth rows — one single-row
    DataFrame ``join_size_est``.

    The per-bucket products where either side is absent contribute 0,
    so the inner equi-join on (row, bucket) loses nothing — but a row
    whose sketches share NO bucket at all would vanish from the join
    entirely (disjoint key sets), so the rows are re-anchored on a
    0..depth-1 spine with 0-fill before taking the median.  The median
    of an odd count of integer estimates is an integer,
    association-free and therefore oracle-exact.
    """
    assert depth % 2 == 1, "odd depth gives an exact median element"
    joined = (
        cells_a.alias("a")
        .join(cells_b.alias("b"), ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("a.cell") * F.col("b.cell")).alias("est"))
    )
    spine = cells_a.sparkSession.range(depth).select(
        F.col("id").cast("int").alias("row")
    )
    per_row = spine.join(joined, "row", "left").select(
        F.coalesce(F.col("est"), F.lit(0)).alias("est")
    )
    return per_row.agg(
        F.element_at(
            F.array_sort(F.collect_list("est")), depth // 2 + 1
        ).alias("join_size_est")
    )

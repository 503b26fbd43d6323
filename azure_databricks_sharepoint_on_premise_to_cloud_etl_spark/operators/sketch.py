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

"""Skew mitigation and co-location utilities (SURVEY section 4 /
build-plan scale notes).

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these helpers cover the two cases AQE can't:

- **salted aggregation**: a groupBy whose key distribution is so hot
  that even one key's partial aggregate overwhelms a task.  Two-phase:
  salt the key with a small random suffix, partially aggregate on
  (key, salt), then finish on key.  Correct for any reassociatable
  aggregate (count/sum/min/max).
- **bucketed co-located join**: pre-shuffle both tables into the same
  bucket layout so repeated joins on the key are exchange-free
  (the metastore analog of the reference's normalized master/child
  tables always joining on the same keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (partial_agg_expr, final_agg_expr),
    e.g. ``{"n": (F.count(F.lit(1)), F.sum("n")), "mx": (F.max("v"),
    F.max("mx"))}``.  The salt spreads one hot key over
    ``salt_buckets`` tasks in phase 1; phase 2 reduces the (at most)
    ``salt_buckets`` partial rows per key.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*group_cols, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*group_cols).agg(
        *[final.alias(name) for name, (_, final) in aggs.items()]
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist with a bucket layout so future equi-joins/aggregations
    on ``bucket_cols`` skip the exchange entirely (verified by the
    absence of Exchange in the join plan — tests/test_skew.py)."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key —
    plans as a zero-shuffle sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Join/agg-key skew diagnosis: one row summarizing the key's
    frequency distribution — distinct keys, total rows, the hottest
    key and its share, exact p50/p99 of per-key counts, and the
    p99/p50 skew ratio.  Run BEFORE a big join to decide between
    plain shuffle, AQE skew-join, salting, or broadcast.

    Scale shape: ONE key-count aggregate (map-side partial), then
    everything operates on the |keys|-sized count table — the top-1
    window, the exact percentile pass (histogram formulation over
    DISTINCT count values), and the final scalar assembly are all
    dimension-sized.  Returns one row.
    """
    from .stats import group_percentiles_exact

    counts = df.filter(F.col(key_col).isNotNull()).groupBy(
        F.col(key_col).alias("__k")
    ).agg(F.count(F.lit(1)).alias("__c"))
    top = (
        counts.withColumn(
            "__rn",
            F.row_number().over(
                Window.orderBy(F.col("__c").desc(), F.col("__k"))
            ),
        )
        .filter(F.col("__rn") == 1)
        .select(
            F.col("__k").cast("string").alias("top_key"),
            F.col("__c").alias("top_count"),
        )
    )
    qs = group_percentiles_exact(
        counts.withColumn("__g", F.lit(1)), ["__g"], "__c",
        {"p50_count": 0.5, "p99_count": 0.99},
    ).drop("__g")
    totals = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__c").alias("n_rows"),
    )
    return (
        totals.crossJoin(F.broadcast(top))
        .crossJoin(F.broadcast(qs))
        .select(
            "n_keys",
            "n_rows",
            "top_key",
            "top_count",
            F.round(F.col("top_count") / F.col("n_rows"), 6).alias(
                "top1_share"
            ),
            F.round("p50_count", 6).alias("p50_count"),
            F.round("p99_count", 6).alias("p99_count"),
            F.round(F.col("p99_count") / F.col("p50_count"), 6).alias(
                "skew_ratio"
            ),
        )
    )


def bloom_bitmap(
    keys: DataFrame, key_col: str, bits_log2: int = 16, hashes: int = 2
) -> DataFrame:
    """Build a Bloom-filter bitmap from a key column as ONE single-row
    DataFrame holding a ``map<int, bigint>`` of 64-bit words.

    Each key sets ``hashes`` bit positions (xxhash64 with distinct
    seeds, pmod into ``2**bits_log2`` bits); positions aggregate into
    words with ``bit_or`` so the whole build is one hash aggregate over
    at most ``2**bits_log2 / 64`` word groups.  The result is tiny
    (8 KiB of words at the default 65,536 bits) no matter how many
    keys went in — safe to ``F.broadcast`` into any probe plan.
    """
    m = 1 << bits_log2
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m))
                    for i in range(hashes)
                ]
            )
        ).alias("__p")
    )
    words = pos.groupBy(
        (F.col("__p") / 64).cast("int").alias("__w")
    ).agg(
        F.bit_or(F.expr("shiftleft(1L, cast(__p % 64 as int))")).alias(
            "__word"
        )
    )
    return words.groupBy().agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("__w", "__word")))
        ).alias("__bloom")
    )


def bloom_prefilter_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    bits_log2: int = 16,
    hashes: int = 2,
) -> DataFrame:
    """EXACT semi-join of ``fact`` against ``dim_keys`` with an
    explicit Bloom-filter prefilter — the manual form of Spark's
    runtime row-group filter, exposed so the 100 TB plan can drop
    non-matching fact rows BEFORE the exact join's shuffle.

    Two stages:

    1. **probe** — broadcast the ~8 KiB bitmap from
       :func:`bloom_bitmap` and keep only fact rows whose ``hashes``
       probe bits are all set.  False positives pass (by design);
       false negatives are impossible, so no match is lost.
    2. **verify** — exact ``left_semi`` join of the survivors against
       the distinct dim keys.  Output is therefore EXACTLY the plain
       semi-join result; the bloom stage only shrinks the shuffle.

    At a 1 % dim-match rate the verify join shuffles ~1 % of the fact
    (plus the false-positive tail ~ n*(1-e^-kn/m)^k) instead of all of
    it — the difference between shuffling 100 TB and shuffling 1 TB.

    Catalyst is free to reorder the two stages (the semi-join commutes
    with the bitmap cross-join): when the dim side is small enough to
    broadcast, it rightly runs the verify join first and the bloom
    costs one broadcast no-op; the probe-first shape matters exactly
    when the dim does NOT broadcast and the verify join must shuffle.
    """
    m = 1 << bits_log2
    bitmap = bloom_bitmap(dim_keys, dim_key, bits_log2, hashes)
    probed = fact.crossJoin(F.broadcast(bitmap))
    cond = F.lit(True)
    for i in range(hashes):
        p = F.pmod(F.xxhash64(F.col(fact_key), F.lit(i)), F.lit(m))
        word = F.element_at(F.col("__bloom"), (p / 64).cast("int"))
        bit = F.expr(
            f"shiftleft(1L, cast(pmod(xxhash64({fact_key}, {i}), {m}) % 64 "
            "as int))"
        )
        cond = cond & F.coalesce(
            (word.bitwiseAND(bit) != 0), F.lit(False)
        )
    survivors = probed.filter(cond).drop("__bloom")
    return survivors.join(
        dim_keys.select(F.col(dim_key).alias(fact_key)).distinct(),
        fact_key,
        "left_semi",
    )

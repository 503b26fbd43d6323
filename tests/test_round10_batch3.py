"""Planted-fixture tests for round-10 widening batch 3: the
Bloom-prefilter semi-join (bitmap build, probe pruning, exactness),
per-group max drawdown, and the salted hot-key aggregation exhibit."""

import pytest
from pyspark.sql import functions as F

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.skew import (
    bloom_bitmap,
    bloom_prefilter_semi_join,
    salted_agg,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.windows import max_drawdown


# -------------------------------------------------- bloom semi join


def test_bloom_semi_join_equals_plain_semi_join(spark):
    fact = spark.createDataFrame(
        [(i, f"row{i}") for i in range(1000)], "k BIGINT, payload STRING"
    )
    dim = spark.createDataFrame(
        [(i,) for i in range(0, 1000, 97)], "d BIGINT"
    )
    got = sorted(
        r["k"]
        for r in bloom_prefilter_semi_join(fact, dim, "k", "d").collect()
    )
    want = sorted(
        r["k"] for r in fact.join(
            dim.withColumnRenamed("d", "k"), "k", "left_semi"
        ).collect()
    )
    assert got == want and len(got) == 11


def test_bloom_bitmap_prunes_nonmatching_probes(spark):
    # 10 dim keys in a 65,536-bit filter: expected FP rate ~ 1e-7 —
    # the probe stage must drop (almost) every non-matching fact row
    # BEFORE the verify join
    dim = spark.createDataFrame([(i,) for i in range(10)], "d BIGINT")
    fact = spark.createDataFrame(
        [(i,) for i in range(10_000, 20_000)], "k BIGINT"
    )
    m = 1 << 16
    bitmap = bloom_bitmap(dim, "d")
    probed = fact.crossJoin(F.broadcast(bitmap))
    cond = F.lit(True)
    for i in range(2):
        p = F.pmod(F.xxhash64(F.col("k"), F.lit(i)), F.lit(m))
        word = F.element_at(F.col("__bloom"), (p / 64).cast("int"))
        bit = F.expr(
            f"shiftleft(1L, cast(pmod(xxhash64(k, {i}), {m}) % 64 as int))"
        )
        cond = cond & F.coalesce(word.bitwiseAND(bit) != 0, F.lit(False))
    survivors = probed.filter(cond).count()
    # no true matches; allow a tiny false-positive tail
    assert survivors <= 5


def test_bloom_semi_join_null_and_dup_keys(spark):
    fact = spark.createDataFrame(
        [(1,), (1,), (2,), (None,)], "k BIGINT"
    )
    dim = spark.createDataFrame([(1,), (1,)], "d BIGINT")
    got = [r["k"] for r in bloom_prefilter_semi_join(
        fact, dim, "k", "d"
    ).collect()]
    # semi-join keeps fact multiplicity (both k=1 rows), never NULLs
    assert sorted(got) == [1, 1]


# ------------------------------------------------------ max drawdown


def test_max_drawdown_hand_computed(spark):
    # curve: 10, 15, 7, 12, 3 -> peaks 10,15,15,15,15
    # drawdowns 0,0,8,3,12 -> max 12, rel 12/15
    flows = [10.0, 5.0, -8.0, 5.0, -9.0]
    rows = [("a", i, f) for i, f in enumerate(flows)]
    df = spark.createDataFrame(rows, "g STRING, t INT, v DOUBLE")
    r = max_drawdown(df, ["g"], ["t"], "v").collect()[0]
    assert r["max_drawdown"] == pytest.approx(12.0)
    assert r["max_rel_drawdown"] == pytest.approx(0.8)
    assert r["peak_equity"] == pytest.approx(15.0)
    assert r["final_equity"] == pytest.approx(3.0)
    assert r["n_points"] == 5


def test_max_drawdown_monotone_rise_is_zero(spark):
    rows = [("a", i, 1.0) for i in range(5)]
    df = spark.createDataFrame(rows, "g STRING, t INT, v DOUBLE")
    r = max_drawdown(df, ["g"], ["t"], "v").collect()[0]
    assert r["max_drawdown"] == 0.0
    assert r["max_rel_drawdown"] == 0.0


def test_max_drawdown_nonpositive_peak_yields_null_rel(spark):
    # strictly falling from a negative start: cum -5, -8; peak stays
    # -5 (never > 0) -> relative drawdown must be NULL (ANSI-safe),
    # absolute drawdown still real (3 below the -5 peak)
    rows = [("a", 0, -5.0), ("a", 1, -3.0)]
    df = spark.createDataFrame(rows, "g STRING, t INT, v DOUBLE")
    r = max_drawdown(df, ["g"], ["t"], "v").collect()[0]
    assert r["max_drawdown"] == pytest.approx(3.0)
    assert r["max_rel_drawdown"] is None


# --------------------------------------------------- salted hot agg


def test_salted_agg_matches_plain_groupby_on_hot_keys(spark):
    rows = [("hot", float(i % 7)) for i in range(5000)] + [
        ("cold", 1.0)
    ]
    df = spark.createDataFrame(rows, "k STRING, v DOUBLE")
    got = {
        r["k"]: (r["n"], r["sv"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            {
                "n": (F.count(F.lit(1)), F.sum("n")),
                "sv": (F.sum("v"), F.sum("sv")),
                "mx": (F.max("v"), F.max("mx")),
            },
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["sv"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1])
        assert got[k][2] == want[k][2]

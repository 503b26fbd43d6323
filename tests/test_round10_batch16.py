"""Planted-fixture tests for round-10 widening batch 16: price
indices and XYZ demand-variability classes."""

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    price_index,
    xyz_classification,
)

_SCHEMA = "per STRING, item INT, cents LONG, qty DOUBLE"


def test_price_index_pinned(spark):
    rows = [
        ("b", 1, 1000, 1.0),  # unit $10
        ("b", 2, 2000, 2.0),  # unit $10
        ("t", 1, 2200, 2.0),  # unit $11
        ("t", 2, 900, 1.0),  # unit $9
        ("t", 3, 5000, 1.0),  # not in base -> excluded
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = {
        r["per"]: r
        for r in price_index(df, "per", "item", "cents", "qty", "b").collect()
    }
    assert out["b"]["laspeyres"] == pytest.approx(1.0)
    assert out["b"]["paasche"] == pytest.approx(1.0)
    # L = (11*1 + 9*2)/(10*1 + 10*2), P = (11*2 + 9*1)/(10*2 + 10*1)
    assert out["t"]["n_items"] == 2
    assert out["t"]["laspeyres"] == pytest.approx(29 / 30, abs=1e-6)
    assert out["t"]["paasche"] == pytest.approx(31 / 30, abs=1e-6)
    assert out["t"]["fisher"] == pytest.approx(
        ((29 / 30) * (31 / 30)) ** 0.5, abs=1e-6
    )


def test_price_index_zero_qty_rows_excluded(spark):
    rows = [("b", 1, 1000, 1.0), ("t", 1, 2000, 1.0), ("t", 1, 999, 0.0)]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = {
        r["per"]: r
        for r in price_index(df, "per", "item", "cents", "qty", "b").collect()
    }
    assert out["t"]["laspeyres"] == pytest.approx(2.0)


def test_xyz_classes(spark):
    rows = (
        [("A", p, 10.0) for p in ("p1", "p2", "p3")]  # cv 0 -> X
        + [("B", "p1", 2.0), ("B", "p2", 18.0)]  # cv 0.8 -> Y
        + [("C", "p1", 0.0), ("C", "p2", 0.0), ("C", "p3", 30.0)]  # Z
        + [("D", "p1", 0.0), ("D", "p2", 0.0)]  # mean 0 -> NULL
    )
    df = spark.createDataFrame(rows, "item STRING, per STRING, v DOUBLE")
    out = {
        r["item"]: r
        for r in xyz_classification(df, "item", "per", "v").collect()
    }
    assert out["A"]["xyz_class"] == "X" and out["A"]["cv"] == 0.0
    assert out["B"]["xyz_class"] == "Y"
    assert out["B"]["cv"] == pytest.approx(0.8)
    assert out["C"]["xyz_class"] == "Z"
    assert out["C"]["cv"] == pytest.approx(2 ** 0.5, abs=1e-6)
    assert out["D"]["cv"] is None and out["D"]["xyz_class"] is None


def test_xyz_periods_aggregate_first(spark):
    # two rows in the same period collapse before the CV: one period
    # -> cv 0 -> X, not a two-point series
    rows = [("A", "p1", 5.0), ("A", "p1", 15.0)]
    df = spark.createDataFrame(rows, "item STRING, per STRING, v DOUBLE")
    r = xyz_classification(df, "item", "per", "v").collect()[0]
    assert r["n_periods"] == 1
    assert r["mean_demand"] == pytest.approx(20.0)
    assert r["xyz_class"] == "X"

"""Round-10 widening batch 37: Cliff's delta, EWMA control chart."""

from __future__ import annotations

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    cliffs_delta,
    ewma_control_chart,
)

# ---------------------------------------------------------- cliffs delta


def test_delta_complete_dominance(spark):
    rows = [("a", float(v)) for v in range(10, 15)] + [
        ("b", float(v)) for v in range(5)
    ]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    row = cliffs_delta(df, "v", "g", "a", "b").collect()[0]
    assert row["delta"] == pytest.approx(1.0)
    assert row["magnitude"] == "large"


def test_delta_identical_zero(spark):
    rows = [(g, float(v % 5)) for g in ("a", "b") for v in range(20)]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    row = cliffs_delta(df, "v", "g", "a", "b").collect()[0]
    assert row["delta"] == pytest.approx(0.0)
    assert row["magnitude"] == "negligible"


def test_delta_hand_computed_with_ties(spark):
    # a: [1, 2], b: [2, 3]
    # pairs: (1,2)< (1,3)< (2,2)= (2,3)< -> P(a>b)=0, P(a<b)=3/4
    rows = [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    row = cliffs_delta(df, "v", "g", "a", "b").collect()[0]
    assert row["delta"] == pytest.approx(-0.75)


def test_delta_sign_symmetry(spark):
    rows = [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    fwd = cliffs_delta(df, "v", "g", "a", "b").collect()[0]["delta"]
    rev = cliffs_delta(df, "v", "g", "b", "a").collect()[0]["delta"]
    assert fwd == pytest.approx(-rev)


# ------------------------------------------------------------ ewma chart


def _series(spark, vals):
    rows = [("g", i, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "g STRING, t INT, v DOUBLE")


def test_ewma_chart_stable_series_in_control(spark):
    df = _series(spark, [10, 11, 9, 10, 11, 9, 10, 11, 9, 10])
    out = ewma_control_chart(df, "g", "t", "v").collect()
    assert len(out) == 10
    assert not any(r["out_of_control"] for r in out)
    for r in out:
        assert r["lcl"] < r["ewma"] < r["ucl"]


def test_ewma_chart_sustained_shift_alarms(spark):
    vals = [10, 11, 9, 10, 11, 9, 10, 11, 9, 10] + [14] * 8
    df = _series(spark, vals)
    out = sorted(
        ewma_control_chart(df, "g", "t", "v").collect(),
        key=lambda r: r["t"],
    )
    assert any(r["out_of_control"] for r in out[10:])


def test_ewma_chart_limits_widen_with_t(spark):
    df = _series(spark, [10, 11, 9, 10, 12, 8, 10, 11])
    out = sorted(
        ewma_control_chart(df, "g", "t", "v").collect(),
        key=lambda r: r["t"],
    )
    widths = [r["ucl"] - r["lcl"] for r in out]
    assert widths == sorted(widths)  # monotone to the asymptote


def test_ewma_chart_constant_series_empty(spark):
    df = _series(spark, [5] * 6)
    assert ewma_control_chart(df, "g", "t", "v").count() == 0


def test_ewma_chart_bad_alpha_raises(spark):
    df = _series(spark, [1, 2])
    with pytest.raises(ValueError, match="alpha"):
        ewma_control_chart(df, "g", "t", "v", alpha=0.0)

"""Round-10 widening batch 31: FD audit, 2-D histogram, quantile
treatment effects."""

from __future__ import annotations

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.profiling import (
    functional_dependency_audit,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    histogram2d,
    quantile_treatment_effect,
)

# --------------------------------------------------------------- fd audit


def test_fd_clean_dependency(spark):
    rows = [(1, "a"), (1, "a"), (2, "b"), (3, "c")]
    df = spark.createDataFrame(rows, "k INT, v STRING")
    row = functional_dependency_audit(df, ["k"], "v").collect()[0]
    assert row["n_violating"] == 0
    assert row["violation_share"] == pytest.approx(0.0)


def test_fd_violation_counts_and_row_mass(spark):
    rows = [(1, "a")] * 5 + [(1, "b")] + [(2, "x"), (3, "y")]
    df = spark.createDataFrame(rows, "k INT, v STRING")
    row = functional_dependency_audit(df, ["k"], "v").collect()[0]
    assert row["n_groups"] == 3 and row["n_violating"] == 1
    assert row["n_rows_violating"] == 6
    assert row["row_violation_share"] == pytest.approx(0.75)


def test_fd_composite_lhs(spark):
    rows = [(1, "x", "a"), (1, "y", "b"), (1, "x", "a")]
    df = spark.createDataFrame(rows, "k INT, s STRING, v STRING")
    row = functional_dependency_audit(df, ["k", "s"], "v").collect()[0]
    assert row["n_groups"] == 2 and row["n_violating"] == 0


def test_fd_empty_lhs_raises(spark):
    df = spark.createDataFrame([(1, "a")], "k INT, v STRING")
    with pytest.raises(ValueError, match="lhs"):
        functional_dependency_audit(df, [], "v")


# ------------------------------------------------------------ histogram2d


def test_hist2d_counts_and_edges(spark):
    rows = [(float(x), float(y)) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x DOUBLE, y DOUBLE")
    out = {(r["x_bin"], r["y_bin"]): r for r in histogram2d(df, "x", "y", 2, 2).collect()}
    assert len(out) == 4
    assert all(r["n"] == 4 for r in out.values())
    cell = out[(0, 0)]
    assert cell["x_lo"] == pytest.approx(0.0) and cell["x_hi"] == pytest.approx(1.5)


def test_hist2d_max_in_top_bin(spark):
    rows = [(0.0, 0.0), (10.0, 10.0)]
    df = spark.createDataFrame(rows, "x DOUBLE, y DOUBLE")
    out = {(r["x_bin"], r["y_bin"]) for r in histogram2d(df, "x", "y", 5, 5).collect()}
    assert (4, 4) in out  # max lands in the LAST bin, not bins


def test_hist2d_degenerate_axis(spark):
    rows = [(1.0, float(y)) for y in range(10)]
    df = spark.createDataFrame(rows, "x DOUBLE, y DOUBLE")
    out = histogram2d(df, "x", "y", 5, 2).collect()
    assert all(r["x_bin"] == 0 for r in out)  # constant x: one column


def test_hist2d_bad_bins_raises(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "x DOUBLE, y DOUBLE")
    with pytest.raises(ValueError, match="bins"):
        histogram2d(df, "x", "y", 0, 5)


# -------------------------------------------------------------------- qte


def test_qte_shift_recovered(spark):
    # arm b = arm a + 10 everywhere: every quantile difference = -10
    rows = [("a", float(v)) for v in range(1, 101)] + [
        ("b", float(v + 10)) for v in range(1, 101)
    ]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    out = quantile_treatment_effect(df, "v", "g", "a", "b").collect()
    assert len(out) == 9
    for r in out:
        assert r["qte"] == pytest.approx(-10.0)
        assert r["n_a"] == 100 and r["n_b"] == 100


def test_qte_tail_only_effect(spark):
    # arms identical except the top decile of b is boosted
    base = [float(v) for v in range(1, 101)]
    boosted = base[:90] + [v + 50 for v in base[90:]]
    rows = [("a", v) for v in base] + [("b", v) for v in boosted]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    out = {r["tau"]: r["qte"] for r in quantile_treatment_effect(df, "v", "g", "a", "b").collect()}
    assert out[0.5] == pytest.approx(0.0)
    assert out[0.9] == pytest.approx(0.0)  # ceil(.9*100)=90th = unboosted
    # explicit high tau catches it
    out95 = {
        r["tau"]: r["qte"]
        for r in quantile_treatment_effect(
            df, "v", "g", "a", "b", taus=[0.95]
        ).collect()
    }
    assert out95[0.95] == pytest.approx(-50.0)


def test_qte_bad_taus_raise(spark):
    df = spark.createDataFrame([("a", 1.0)], "g STRING, v DOUBLE")
    with pytest.raises(ValueError, match="taus"):
        quantile_treatment_effect(df, "v", "g", "a", "b", taus=[1.5])

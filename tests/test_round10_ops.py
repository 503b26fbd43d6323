"""Planted-fixture tests for the round-10 widening operators:
inequality/concentration (theil, HHI), Pareto ABC classification,
robust z-score anomalies, autocorrelation, the deterministic Poisson
bootstrap, Brown double smoothing, and HITS."""

import math

import pytest
from pyspark.sql import functions as F

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    abc_classification,
    autocorrelation,
    herfindahl_index,
    poisson_bootstrap_mean,
    robust_zscore_anomalies,
    theil_index,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.windows import (
    brown_double_smooth,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.graph import hits


# ------------------------------------------------------------- theil


def test_theil_perfect_equality_is_zero(spark):
    df = spark.createDataFrame(
        [("g", 10.0)] * 4, "grp STRING, x DOUBLE"
    )
    r = theil_index(df, "x", ["grp"]).collect()[0]
    assert r["n"] == 4
    assert abs(r["theil_t"]) < 1e-9


def test_theil_hand_computed_and_nonpositive_excluded(spark):
    # values 1 and 3 (plus excluded 0/-5): mu=2,
    # T = ((1*ln1 + 3*ln3)/2)/2 - ln 2  [avg(x ln x)/mu - ln mu]
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 3.0), ("g", 0.0), ("g", -5.0)],
        "grp STRING, x DOUBLE",
    )
    r = theil_index(df, "x", ["grp"]).collect()[0]
    assert r["n"] == 2
    want = (3.0 * math.log(3.0) / 2.0) / 2.0 - math.log(2.0)
    assert abs(r["theil_t"] - want) < 1e-5


def test_theil_max_when_one_holds_all(spark):
    # one holder of everything among n positive -> excluded zeros;
    # with a single positive member T = 0 trivially, so use near-all:
    # [eps, big] with eps -> T approaches ln 2 for n=2 concentration
    df = spark.createDataFrame(
        [("g", 0.000001), ("g", 1000000.0)], "grp STRING, x DOUBLE"
    )
    r = theil_index(df, "x", ["grp"]).collect()[0]
    assert r["theil_t"] > 0.6  # ln 2 = 0.693 minus the eps share


# ---------------------------------------------------------------- hhi


def test_hhi_even_and_monopoly(spark):
    df = spark.createDataFrame(
        [("even", 50.0), ("even", 50.0), ("mono", 100.0)],
        "grp STRING, x DOUBLE",
    )
    out = {
        r["grp"]: r for r in herfindahl_index(df, "x", ["grp"]).collect()
    }
    assert abs(out["even"]["hhi"] - 0.5) < 1e-9
    assert abs(out["even"]["equiv_n"] - 2.0) < 1e-9
    assert abs(out["mono"]["hhi"] - 1.0) < 1e-9
    assert out["mono"]["n_members"] == 1


def test_hhi_zero_total_is_null(spark):
    df = spark.createDataFrame(
        [("z", 0.0), ("z", 0.0)], "grp STRING, x DOUBLE"
    )
    r = herfindahl_index(df, "x", ["grp"]).collect()[0]
    assert r["hhi"] is None and r["equiv_n"] is None


# ---------------------------------------------------------------- abc


def test_abc_classes_hand_planted(spark):
    # values 60, 25, 10, 5 (total 100): cum shares .60/.85/.95/1.0
    # -> A (<=.8), B (<=.95 twice), C
    df = spark.createDataFrame(
        [(1, 60.0), (2, 25.0), (3, 10.0), (4, 5.0)],
        "k LONG, v DOUBLE",
    )
    out = {
        r["key"]: (r["cum_share"], r["abc_class"])
        for r in abc_classification(df, "k", "v").collect()
    }
    assert out[1] == (0.6, "A")
    assert out[2] == (0.85, "B")
    assert out[3] == (0.95, "B")
    assert out[4] == (1.0, "C")


def test_abc_ties_break_on_key(spark):
    df = spark.createDataFrame(
        [(2, 50.0), (1, 50.0)], "k LONG, v DOUBLE"
    )
    out = {
        r["key"]: r["cum_share"]
        for r in abc_classification(df, "k", "v").collect()
    }
    assert out[1] == 0.5 and out[2] == 1.0


# ------------------------------------------------------ robust zscore


def test_robust_zscore_flags_planted_outlier(spark):
    rows = [("g", f"d{i}", 100.0 + (i % 5)) for i in range(20)]
    rows.append(("g", "spike", 500.0))
    df = spark.createDataFrame(rows, "grp STRING, day STRING, v DOUBLE")
    out = robust_zscore_anomalies(
        df, "v", ["grp"], z_cut=3.5, carry_cols=["day"]
    ).collect()
    assert [r["day"] for r in out] == ["spike"]
    assert out[0]["modified_z"] > 3.5


def test_robust_zscore_zero_mad_yields_no_flags(spark):
    df = spark.createDataFrame(
        [("g", str(i), 7.0) for i in range(10)],
        "grp STRING, day STRING, v DOUBLE",
    )
    assert (
        robust_zscore_anomalies(df, "v", ["grp"], carry_cols=["day"]).count()
        == 0
    )


# ------------------------------------------------------------------ acf


def test_acf_alternating_series_lag1(spark):
    # x alternates a/b: z alternates ±1, so r1 = -(n-1)/n, r2 = (n-2)/n
    n = 10
    df = spark.createDataFrame(
        [("g", t, 1.0 if t % 2 == 0 else -1.0) for t in range(n)],
        "grp STRING, t LONG, v DOUBLE",
    )
    out = {
        r["lag"]: r
        for r in autocorrelation(df, "t", "v", 2, ["grp"]).collect()
    }
    assert abs(out[1]["acf"] - (-(n - 1) / n)) < 1e-6
    assert abs(out[2]["acf"] - ((n - 2) / n)) < 1e-6
    assert out[1]["n_pairs"] == n - 1


def test_acf_constant_series_is_null(spark):
    df = spark.createDataFrame(
        [("g", t, 5.0) for t in range(6)], "grp STRING, t LONG, v DOUBLE"
    )
    out = autocorrelation(df, "t", "v", 1, ["grp"]).collect()
    assert out[0]["acf"] is None


def test_acf_gaps_drop_pairs(spark):
    # periods 0,1,2,5: lag-1 pairs are (0,1),(1,2) only
    df = spark.createDataFrame(
        [("g", 0, 1.0), ("g", 1, 2.0), ("g", 2, 1.0), ("g", 5, 2.0)],
        "grp STRING, t LONG, v DOUBLE",
    )
    out = autocorrelation(df, "t", "v", 1, ["grp"]).collect()
    assert out[0]["n_pairs"] == 2


# ------------------------------------------------------------ bootstrap


def test_poisson_bootstrap_deterministic_and_brackets(spark):
    df = spark.createDataFrame(
        [(i, (i % 7) + 1) for i in range(500)], "k LONG, v LONG"
    )
    r1 = poisson_bootstrap_mean(df, "v", "k", replicates=50).collect()[0]
    r2 = poisson_bootstrap_mean(df, "v", "k", replicates=50).collect()[0]
    assert r1 == r2, "deterministic weights must reproduce exactly"
    true_mean = sum((i % 7) + 1 for i in range(500)) / 500
    assert r1["ci_lo"] <= true_mean <= r1["ci_hi"]
    assert abs(r1["point_mean"] - true_mean) < 0.3
    assert r1["n_rows"] == 500 and r1["replicates"] == 50


def test_poisson_bootstrap_constant_metric_degenerate_ci(spark):
    df = spark.createDataFrame(
        [(i, 4) for i in range(200)], "k LONG, v LONG"
    )
    r = poisson_bootstrap_mean(df, "v", "k", replicates=20).collect()[0]
    assert r["ci_lo"] == 4.0 and r["ci_hi"] == 4.0 and r["point_mean"] == 4.0


# ---------------------------------------------------------- brown holt


def test_brown_constant_series_zero_trend(spark):
    df = spark.createDataFrame(
        [("g", t, 10) for t in range(8)], "grp STRING, t LONG, v LONG"
    )
    out = brown_double_smooth(df, ["grp"], "t", "v").collect()
    for r in out:
        assert abs(r["s1"] - 10.0) < 1e-12
        assert abs(r["sm_trend"]) < 1e-12
        assert abs(r["forecast_next"] - 10.0) < 1e-12


def test_brown_linear_ramp_forecast_converges(spark):
    # on x_t = t the one-step forecast approaches t+1 as the window
    # warms (double smoothing removes EWMA's lag on a linear trend)
    df = spark.createDataFrame(
        [("g", t, float(t)) for t in range(30)],
        "grp STRING, t LONG, v DOUBLE",
    )
    last = (
        brown_double_smooth(df, ["grp"], "t", "v")
        .orderBy("t")
        .collect()[-1]
    )
    assert abs(last["forecast_next"] - 30.0) < 0.05


# ---------------------------------------------------------------- hits


def test_hits_star_graph_ordering(spark):
    # u1 -> v1,v2 ; u2 -> v1: v1 out-authorities v2, u1 out-hubs u2
    df = spark.createDataFrame(
        [("u1", "v1"), ("u1", "v2"), ("u2", "v1")],
        "src STRING, dst STRING",
    )
    out = {(r["side"], r["node"]): r["score"] for r in hits(df).collect()}
    assert out[("auth", "v1")] > out[("auth", "v2")]
    assert out[("hub", "u1")] > out[("hub", "u2")]
    hubs = sum(v for (s, _), v in out.items() if s == "hub")
    auths = sum(v for (s, _), v in out.items() if s == "auth")
    assert abs(hubs - 1.0) < 1e-5 and abs(auths - 1.0) < 1e-5


def test_hits_end_normalization_equals_stepwise(spark):
    """Normalizing once at the end must equal per-step L1
    normalization (linearity) — the plan-shape optimization must not
    change semantics."""
    edges = [
        ("a", "x"), ("a", "y"), ("b", "x"), ("c", "y"), ("c", "z"),
    ]
    df = spark.createDataFrame(edges, "src STRING, dst STRING")
    got = {(r["side"], r["node"]): r["score"] for r in hits(df, iterations=2).collect()}

    # stepwise reference in plain python
    from collections import defaultdict

    h = {u: 1.0 for u, _ in edges}
    a = {}
    for _ in range(2):
        a = defaultdict(float)
        for u, v in edges:
            a[v] += h[u]
        s = sum(a.values())
        a = {k: x / s for k, x in a.items()}
        h = defaultdict(float)
        for u, v in edges:
            h[u] += a[v]
        s = sum(h.values())
        h = {k: x / s for k, x in h.items()}
    for k, x in h.items():
        assert abs(got[("hub", k)] - x) < 1e-6
    for k, x in a.items():
        assert abs(got[("auth", k)] - x) < 1e-6

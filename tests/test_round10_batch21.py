"""Round-10 widening batch 21: Page-Hinkley drift, Nelson-Aalen
hazard, Western Electric control rules, Cramer's V, Cohen's d."""

from __future__ import annotations

import math

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    cohens_d,
    control_chart_violations,
    cramers_v,
    nelson_aalen,
    page_hinkley,
)

# --------------------------------------------------------- page-hinkley


def test_ph_flat_series_stays_zero(spark):
    rows = [("g", i, 5.0) for i in range(20)]
    df = spark.createDataFrame(rows, "g STRING, t INT, v DOUBLE")
    out = page_hinkley(df, "g", "t", "v", threshold=1.0).collect()
    assert all(r["ph_stat"] == pytest.approx(0.0) for r in out)
    assert not any(r["drift"] for r in out)


def test_ph_step_up_alarms(spark):
    rows = [("g", i, 0.0) for i in range(20)] + [
        ("g", 20 + i, 10.0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g STRING, t INT, v DOUBLE")
    out = sorted(
        page_hinkley(df, "g", "t", "v", threshold=5.0).collect(),
        key=lambda r: r["t"],
    )
    assert not any(r["drift"] for r in out[:20])
    assert any(r["drift"] for r in out[20:])
    # ph is monotone-ish after the step and ends well above threshold
    assert out[-1]["ph_stat"] > 5.0


def test_ph_step_down_no_upward_alarm(spark):
    rows = [("g", i, 10.0) for i in range(10)] + [
        ("g", 10 + i, 0.0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g STRING, t INT, v DOUBLE")
    out = page_hinkley(df, "g", "t", "v", threshold=3.0).collect()
    assert not any(r["drift"] for r in out)


def test_ph_first_point_zero(spark):
    df = spark.createDataFrame([("g", 1, 42.0)], "g STRING, t INT, v DOUBLE")
    row = page_hinkley(df, "g", "t", "v").collect()[0]
    assert row["ph_stat"] == pytest.approx(0.0)


# --------------------------------------------------------- nelson-aalen


def test_na_hand_computed(spark):
    # durations 1,2,3 all events, n=3: H = 1/3, 1/3+1/2, 1/3+1/2+1
    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (3.0, 1)], "dur DOUBLE, ev INT"
    )
    out = sorted(nelson_aalen(df, "dur", "ev").collect(), key=lambda r: r["duration"])
    assert [r["n_risk"] for r in out] == [3, 2, 1]
    assert out[0]["cum_hazard"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[1]["cum_hazard"] == pytest.approx(1 / 3 + 1 / 2, abs=1e-6)
    assert out[2]["cum_hazard"] == pytest.approx(1 / 3 + 1 / 2 + 1.0, abs=1e-6)
    assert out[0]["na_var"] == pytest.approx(1 / 9, abs=1e-6)


def test_na_censoring_depletes_risk_without_hazard(spark):
    # event at t=1 (n=3), censor at t=2, event at t=3 (n=1)
    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 0), (3.0, 1)], "dur DOUBLE, ev INT"
    )
    out = sorted(nelson_aalen(df, "dur", "ev").collect(), key=lambda r: r["duration"])
    assert len(out) == 2  # censor-only time emits no row
    assert out[1]["n_risk"] == 1
    assert out[1]["cum_hazard"] == pytest.approx(1 / 3 + 1.0, abs=1e-6)


def test_na_groups_independent(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 2.0, 1), ("b", 1.0, 1)],
        "g STRING, dur DOUBLE, ev INT",
    )
    out = nelson_aalen(df, "dur", "ev", group_cols=["g"]).collect()
    by = {(r["g"], r["duration"]): r for r in out}
    assert by[("a", 1.0)]["n_risk"] == 2
    assert by[("b", 1.0)]["n_risk"] == 1
    assert by[("b", 1.0)]["cum_hazard"] == pytest.approx(1.0)


# ------------------------------------------------------- control chart


def _series(vals):
    return [("g", i, float(v)) for i, v in enumerate(vals)]


def test_cc_r1_extreme_point(spark):
    vals = [0, 1, -1, 0, 1, -1, 0, 1, -1, 0, 1, -1, 30]
    df = spark.createDataFrame(_series(vals), "g STRING, t INT, v DOUBLE")
    out = control_chart_violations(df, "g", "t", "v").collect()
    assert any(r["r1"] and r["t"] == 12 for r in out)


def test_cc_r4_eight_same_side(spark):
    # mean pulled low by early negatives; last 8 all above center
    vals = [-5, -5, -5, -5, -5, -5, -5, -5, 1, 1, 1, 1, 1, 1, 1, 1]
    df = spark.createDataFrame(_series(vals), "g STRING, t INT, v DOUBLE")
    out = control_chart_violations(df, "g", "t", "v").collect()
    r4_times = {r["t"] for r in out if r["r4"]}
    assert 15 in r4_times  # 8th consecutive positive-z point completes R4


def test_cc_constant_series_emits_nothing(spark):
    df = spark.createDataFrame(_series([3] * 10), "g STRING, t INT, v DOUBLE")
    assert control_chart_violations(df, "g", "t", "v").count() == 0


def test_cc_r2_two_of_three_beyond_2sigma(spark):
    # tight noise, then two big spikes within a 3-window
    vals = [0, 1, -1, 0, 1, -1, 0, 1, -1, 0, 1, -1, 8, 0, 8]
    df = spark.createDataFrame(_series(vals), "g STRING, t INT, v DOUBLE")
    out = {r["t"]: r for r in control_chart_violations(df, "g", "t", "v").collect()}
    assert 14 in out and out[14]["r2"]  # second spike completes 2-of-3


# ----------------------------------------------------------- cramers v


def test_cramers_v_perfect_association(spark):
    rows = [("a", "x")] * 20 + [("b", "y")] * 20
    df = spark.createDataFrame(rows, "u STRING, w STRING")
    row = cramers_v(df, "u", "w").collect()[0]
    # 2x2 perfect: chi2 = n, phi2 = 1; corrected V slightly below 1
    assert row["chi2"] == pytest.approx(40.0, abs=1e-4)
    assert 0.9 < row["v_corrected"] <= 1.0


def test_cramers_v_independence_near_zero(spark):
    rows = []
    for a in ("a", "b"):
        for w in ("x", "y"):
            rows += [(a, w)] * 25  # perfectly balanced
    df = spark.createDataFrame(rows, "u STRING, w STRING")
    row = cramers_v(df, "u", "w").collect()[0]
    assert row["chi2"] == pytest.approx(0.0, abs=1e-6)
    assert row["v_corrected"] == pytest.approx(0.0, abs=1e-4)


def test_cramers_v_empty_cells_handled(spark):
    # 3x2 with a structurally empty cell: chi2 must include its E mass
    rows = [("a", "x")] * 10 + [("b", "x")] * 5 + [("b", "y")] * 5 + [
        ("c", "y")
    ] * 10
    df = spark.createDataFrame(rows, "u STRING, w STRING")
    row = cramers_v(df, "u", "w").collect()[0]
    # every E = 10*15/30 = 5: chi2 = 25/5 + 25/5 + 0 + 0 + 25/5 + 25/5
    assert row["chi2"] == pytest.approx(20.0, abs=1e-4)
    assert row["r_cats"] == 3 and row["c_cats"] == 2


def test_cramers_v_single_row_null(spark):
    df = spark.createDataFrame([("a", "x")], "u STRING, w STRING")
    row = cramers_v(df, "u", "w").collect()[0]
    assert row["v_corrected"] is None  # n = 1: correction undefined


# ------------------------------------------------------------ cohens d


def test_cohens_d_known_value(spark):
    rows = [("a", v) for v in [1.0, 2.0, 3.0, 4.0, 5.0]] + [
        ("b", v) for v in [3.0, 4.0, 5.0, 6.0, 7.0]
    ]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    row = cohens_d(df, "v", "g", "a", "b").collect()[0]
    # both arms var = 2.5 -> pooled sd = sqrt(2.5), d = -2/sqrt(2.5)
    assert row["pooled_sd"] == pytest.approx(math.sqrt(2.5), abs=1e-5)
    assert row["d"] == pytest.approx(-2 / math.sqrt(2.5), abs=1e-3)
    j = 1 - 3 / (4 * 8 - 1)
    assert row["hedges_g"] == pytest.approx(row["d"] * j, abs=1e-3)


def test_cohens_d_zero_variance_null(spark):
    rows = [("a", 1.0)] * 3 + [("b", 1.0)] * 3
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    row = cohens_d(df, "v", "g", "a", "b").collect()[0]
    assert row["d"] is None


def test_cohens_d_tiny_arm_null(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("b", 3.0)], "g STRING, v DOUBLE"
    )
    row = cohens_d(df, "v", "g", "a", "b").collect()[0]
    assert row["d"] is None  # n_a = 1: no sample variance

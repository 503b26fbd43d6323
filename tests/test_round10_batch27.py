"""Round-10 widening batch 27: VaR/expected shortfall, two-way fixed
effects, relative risk."""

from __future__ import annotations

import math

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    fixed_effects_ols,
    relative_risk,
    tail_risk,
)

# ------------------------------------------------------------- tail risk


def test_tail_risk_hand(spark):
    rows = [("g", float(v)) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    row = tail_risk(df, "g", "v", q=0.95).collect()[0]
    assert row["var_q"] == pytest.approx(95.0)  # ceil(0.95*100) = 95th
    assert row["tail_n"] == 6  # 95..100
    assert row["es_q"] == pytest.approx(sum(range(95, 101)) / 6)


def test_tail_risk_tie_invariant(spark):
    rows = [("g", 1.0)] * 9 + [("g", 10.0)]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    row = tail_risk(df, "g", "v", q=0.5).collect()[0]
    # VaR = 5th order stat = 1.0; ES averages ALL values >= 1.0
    assert row["var_q"] == pytest.approx(1.0)
    assert row["es_q"] == pytest.approx((9 * 1 + 10) / 10)


def test_tail_risk_groups(spark):
    rows = [("a", float(v)) for v in range(10)] + [("b", 100.0)]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    out = {r["g"]: r for r in tail_risk(df, "g", "v", q=0.9).collect()}
    assert out["b"]["var_q"] == pytest.approx(100.0)
    assert out["a"]["var_q"] == pytest.approx(8.0)  # ceil(0.9*10)=9th of 0..9


def test_tail_risk_bad_q_raises(spark):
    df = spark.createDataFrame([("g", 1.0)], "g STRING, v DOUBLE")
    with pytest.raises(ValueError, match="q must"):
        tail_risk(df, "g", "v", q=1.0)


# --------------------------------------------------------- fixed effects


def test_fe_recovers_beta_with_entity_confounder(spark):
    # y = 2x + entity_effect; pooled OLS would be biased by the
    # correlation between entity effect and x level; within is exact
    rows = []
    for i, (eff, base) in enumerate([(100.0, 0.0), (-50.0, 5.0), (0.0, 10.0)]):
        for t in range(4):
            # interaction term keeps within-variation after two-way
            # demeaning (a purely additive base+t design is absorbed)
            x = base + t + float((i * t) % 3)
            rows.append((f"e{i}", t, x, 2.0 * x + eff))
    df = spark.createDataFrame(rows, "e STRING, t INT, x DOUBLE, y DOUBLE")
    row = fixed_effects_ols(df, "e", "t", "x", "y").collect()[0]
    assert row["beta"] == pytest.approx(2.0, abs=1e-3)
    assert row["n_entities"] == 3 and row["n_periods"] == 4


def test_fe_absorbs_time_shock(spark):
    # y = 3x + shock_t: time demeaning removes the shock exactly
    shocks = {0: 50.0, 1: -20.0, 2: 0.0}
    rows = []
    for i in range(4):
        for t, s in shocks.items():
            x = float(i * 3 + t * 2 + (i * t) % 5)
            rows.append((f"e{i}", t, x, 3.0 * x + s))
    df = spark.createDataFrame(rows, "e STRING, t INT, x DOUBLE, y DOUBLE")
    row = fixed_effects_ols(df, "e", "t", "x", "y").collect()[0]
    assert row["beta"] == pytest.approx(3.0, abs=1e-3)
    assert row["se"] == pytest.approx(0.0, abs=1e-3)  # exact fit


def test_fe_no_within_variance_null(spark):
    # x = entity constant + time constant: fully absorbed
    rows = [
        (f"e{i}", t, float(i * 10 + t), 1.0)
        for i in range(3)
        for t in range(3)
    ]
    df = spark.createDataFrame(rows, "e STRING, t INT, x DOUBLE, y DOUBLE")
    row = fixed_effects_ols(df, "e", "t", "x", "y").collect()[0]
    assert row["beta"] is None


# --------------------------------------------------------- relative risk


def test_rr_textbook(spark):
    # exposed: 30/100 outcome; unexposed: 10/100
    rows = (
        [(True, True)] * 30
        + [(True, False)] * 70
        + [(False, True)] * 10
        + [(False, False)] * 90
    )
    df = spark.createDataFrame(rows, "e BOOLEAN, o BOOLEAN")
    row = relative_risk(df, "e", "o").collect()[0]
    assert row["risk_exposed"] == pytest.approx(0.3)
    assert row["risk_unexposed"] == pytest.approx(0.1)
    assert row["relative_risk"] == pytest.approx(3.0, abs=1e-3)
    se = math.sqrt(1 / 30 - 1 / 100 + 1 / 10 - 1 / 100)
    assert row["ci_low"] == pytest.approx(3 * math.exp(-1.96 * se), abs=1e-2)
    assert row["ci_high"] == pytest.approx(3 * math.exp(1.96 * se), abs=1e-2)


def test_rr_zero_numerator_haldane(spark):
    rows = [(True, False)] * 10 + [(False, True)] * 5 + [(False, False)] * 5
    df = spark.createDataFrame(rows, "e BOOLEAN, o BOOLEAN")
    row = relative_risk(df, "e", "o").collect()[0]
    assert row["relative_risk"] is not None
    assert math.isfinite(row["ci_low"]) and row["ci_low"] > 0


def test_rr_one_is_null_effect(spark):
    rows = (
        [(True, True)] * 20
        + [(True, False)] * 80
        + [(False, True)] * 20
        + [(False, False)] * 80
    )
    df = spark.createDataFrame(rows, "e BOOLEAN, o BOOLEAN")
    row = relative_risk(df, "e", "o").collect()[0]
    assert row["relative_risk"] == pytest.approx(1.0)
    assert row["ci_low"] < 1.0 < row["ci_high"]

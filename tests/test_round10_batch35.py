"""Round-10 widening batch 35: A/B power planning, Holm step-down."""

from __future__ import annotations

import math

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    ab_power_plan,
    holm_adjust,
    norm_ppf,
)

# ------------------------------------------------------------- norm_ppf


def test_ppf_known_quantiles():
    assert norm_ppf(0.975) == pytest.approx(1.959964, abs=1e-5)
    assert norm_ppf(0.8) == pytest.approx(0.841621, abs=1e-5)
    assert norm_ppf(0.5) == pytest.approx(0.0, abs=1e-9)
    assert norm_ppf(0.025) == pytest.approx(-1.959964, abs=1e-5)


def test_ppf_tails_and_bounds():
    assert norm_ppf(1e-6) == pytest.approx(-4.753424, abs=1e-4)
    with pytest.raises(ValueError):
        norm_ppf(0.0)
    with pytest.raises(ValueError):
        norm_ppf(1.0)


# ----------------------------------------------------------- power plan


def test_power_plan_textbook_n(spark):
    # baseline 10%, +10% relative -> p2 = 0.11: classic n ~ 14,744
    rows = (
        [("a", 1)] * 100 + [("a", 0)] * 900 + [("b", 0)] * 1000
    )
    df = spark.createDataFrame(rows, "g STRING, y INT")
    row = ab_power_plan(df, "g", "y", "a", mde_rel=0.1).collect()[0]
    assert row["p_base"] == pytest.approx(0.1)
    assert row["p_target"] == pytest.approx(0.11)
    assert row["n_a"] == 1000 and row["n_b"] == 1000
    z = (norm_ppf(0.975) + norm_ppf(0.8)) ** 2
    expect = math.ceil(z * (0.1 * 0.9 + 0.11 * 0.89) / (0.01**2))
    assert row["n_required_per_arm"] == expect
    # current per-arm n (1000) is far below required: power is low
    assert row["power_at_current_n"] < 0.2


def test_power_plan_large_effect_high_power(spark):
    rows = (
        [("a", 1)] * 500 + [("a", 0)] * 500 + [("b", 0)] * 1000
    )
    df = spark.createDataFrame(rows, "g STRING, y INT")
    row = ab_power_plan(df, "g", "y", "a", mde_rel=0.5).collect()[0]
    assert row["n_required_per_arm"] < 1000
    assert row["power_at_current_n"] > 0.9


def test_power_plan_imbalanced_arms_use_harmonic_n(spark):
    # tiny non-baseline arm drags achieved power DOWN via the
    # harmonic per-arm n, even with a large baseline
    big = [("a", 1)] * 500 + [("a", 0)] * 500
    df_bal = spark.createDataFrame(
        big + [("b", 0)] * 1000, "g STRING, y INT"
    )
    df_imb = spark.createDataFrame(
        big + [("b", 0)] * 20, "g STRING, y INT"
    )
    bal = ab_power_plan(df_bal, "g", "y", "a", mde_rel=0.5).collect()[0]
    imb = ab_power_plan(df_imb, "g", "y", "a", mde_rel=0.5).collect()[0]
    assert imb["n_b"] == 20
    assert imb["power_at_current_n"] < bal["power_at_current_n"]


def test_power_plan_missing_other_arm_null_power(spark):
    rows = [("a", 1)] * 10 + [("a", 0)] * 90
    df = spark.createDataFrame(rows, "g STRING, y INT")
    row = ab_power_plan(df, "g", "y", "a", mde_rel=0.1).collect()[0]
    assert row["n_b"] == 0
    assert row["power_at_current_n"] is None
    # planning outputs are still produced from the baseline arm
    assert row["n_required_per_arm"] is not None


def test_power_plan_bad_mde_raises(spark):
    df = spark.createDataFrame([("a", 1)], "g STRING, y INT")
    with pytest.raises(ValueError, match="mde_rel"):
        ab_power_plan(df, "g", "y", "a", mde_rel=0.0)


# ----------------------------------------------------------------- holm


def test_holm_hand_computed(spark):
    # m=3, sorted p: .01, .02, .2 -> raw: .03, .04, .2 -> cummax same
    rows = [("t1", 0.01), ("t2", 0.02), ("t3", 0.2)]
    df = spark.createDataFrame(rows, "test STRING, p DOUBLE")
    out = {r["test"]: r for r in holm_adjust(df, "p").collect()}
    assert out["t1"]["p_holm"] == pytest.approx(0.03)
    assert out["t2"]["p_holm"] == pytest.approx(0.04)
    assert out["t3"]["p_holm"] == pytest.approx(0.2)
    assert out["t1"]["reject"] and out["t2"]["reject"]
    assert not out["t3"]["reject"]


def test_holm_monotone_enforced(spark):
    # p .001 then .5 then .002: step-down max keeps adjusted monotone
    rows = [("a", 0.001), ("b", 0.5), ("c", 0.002)]
    df = spark.createDataFrame(rows, "test STRING, p DOUBLE")
    out = sorted(holm_adjust(df, "p").collect(), key=lambda r: r["rank"])
    vals = [r["p_holm"] for r in out]
    assert vals == sorted(vals)


def test_holm_more_powerful_than_bonferroni(spark):
    rows = [(f"t{i}", 0.012) for i in range(4)]
    df = spark.createDataFrame(rows, "test STRING, p DOUBLE")
    out = sorted(holm_adjust(df, "p").collect(), key=lambda r: r["rank"])
    # bonferroni would be .048 for all; holm shrinks later ranks'
    # multiplier but the running max keeps them at the first value
    assert out[0]["p_holm"] == pytest.approx(0.048)
    assert out[3]["p_holm"] == pytest.approx(0.048)


def test_holm_null_p_excluded(spark):
    rows = [("a", 0.01), ("b", None)]
    df = spark.createDataFrame(rows, "test STRING, p DOUBLE")
    out = holm_adjust(df, "p").collect()
    assert len(out) == 1
    assert out[0]["p_holm"] == pytest.approx(0.01)  # m = 1

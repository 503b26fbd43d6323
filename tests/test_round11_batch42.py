"""Round-11 widening batch 42: Erlang-C, Mantel-Haenszel OR,
Cronbach's alpha."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    cronbach_alpha,
    erlang_c_wait,
    mh_odds_ratio,
)

# ------------------------------------------------------------- erlang-c


def _erlang_c_py(a: float, c: int) -> float:
    series = sum(a**k / math.factorial(k) for k in range(c))
    tail = a**c / math.factorial(c)
    rho = a / c
    return tail / ((1 - rho) * series + tail)


def test_erlang_c_matches_closed_form(spark):
    # 121 arrivals over 60 min -> lam ~ 2.0167/min; mu=1, c=3
    t0 = dt.datetime(2023, 1, 1)
    rows = [("q", t0 + dt.timedelta(seconds=30 * i)) for i in range(121)]
    df = spark.createDataFrame(rows, "g STRING, ts TIMESTAMP")
    r = erlang_c_wait(df, "g", "ts", 1.0, 3).collect()[0]
    lam = round(121 / 60.0, 6)
    a = round(lam / 1.0, 6)
    assert r["lam"] == pytest.approx(lam, abs=1e-6)
    assert r["p_wait"] == pytest.approx(_erlang_c_py(a, 3), abs=1e-5)
    assert r["avg_wait_min"] == pytest.approx(
        _erlang_c_py(a, 3) / (3 - lam), abs=1e-5
    )


def test_erlang_c_unstable_queue_null(spark):
    # lam ~ 2/min with ONE 1/min server: rho >= 1 -> NULL metrics
    t0 = dt.datetime(2023, 1, 1)
    rows = [("q", t0 + dt.timedelta(seconds=30 * i)) for i in range(121)]
    df = spark.createDataFrame(rows, "g STRING, ts TIMESTAMP")
    r = erlang_c_wait(df, "g", "ts", 1.0, 1).collect()[0]
    assert r["rho"] >= 1.0
    assert r["p_wait"] is None and r["avg_wait_min"] is None


def test_erlang_c_validates(spark):
    df = spark.createDataFrame(
        [("q", dt.datetime(2023, 1, 1))], "g STRING, ts TIMESTAMP"
    )
    with pytest.raises(ValueError, match="servers"):
        erlang_c_wait(df, "g", "ts", 1.0, 0)
    with pytest.raises(ValueError, match="service_rate"):
        erlang_c_wait(df, "g", "ts", 0.0, 2)


# ------------------------------------------------------- mantel-haenszel


def _mh_rows(spec):
    rows = []
    for stratum, arm, success, n in spec:
        rows += [(stratum, arm, success)] * n
    return rows


def test_mh_simpsons_paradox_direction(spark):
    # within each stratum arm 'a' is BETTER (OR > 1), but 'a'
    # concentrates in the hard stratum -> crude OR understates
    spec = [
        ("easy", "a", 1, 9), ("easy", "a", 0, 1),
        ("easy", "b", 1, 70), ("easy", "b", 0, 30),
        ("hard", "a", 1, 30), ("hard", "a", 0, 70),
        ("hard", "b", 1, 1), ("hard", "b", 0, 9),
    ]
    df = spark.createDataFrame(
        _mh_rows(spec), "s STRING, g STRING, y INT"
    )
    r = mh_odds_ratio(df, "s", "g", "y", "a", "b").collect()[0]
    assert r["k_strata"] == 2
    # hand: easy n=110, a*d/n = 9*30/110, b*c/n = 1*70/110
    #       hard n=110, a*d/n = 30*9/110, b*c/n = 70*1/110
    num = 9 * 30 / 110 + 30 * 9 / 110
    den = 1 * 70 / 110 + 70 * 1 / 110
    assert r["or_mh"] == pytest.approx(num / den, abs=1e-5)
    assert r["or_mh"] > r["or_crude"]  # pooling removes the confound


def test_mh_degenerate_denominator_null(spark):
    spec = [("s1", "a", 1, 5), ("s1", "b", 1, 5)]  # no failures at all
    df = spark.createDataFrame(
        _mh_rows(spec), "s STRING, g STRING, y INT"
    )
    r = mh_odds_ratio(df, "s", "g", "y", "a", "b").collect()[0]
    assert r["or_mh"] is None


# -------------------------------------------------------------- cronbach


def test_cronbach_hand_computed(spark):
    # 4 subjects x 2 items; item2 = item1 + noise-free shift ->
    # perfectly correlated items give alpha = 1 in the k=2 formula?
    # No: alpha = 2*(1 - (v1+v2)/vt); with item2 = item1 + 1,
    # vt = var(2*item1+1) = 4*v1, v1=v2 -> alpha = 2*(1 - 2v/4v) = 1.
    rows = []
    for i, base in enumerate([1.0, 2.0, 3.0, 4.0], start=1):
        rows += [(f"s{i}", 1, base), (f"s{i}", 2, base + 1.0)]
    df = spark.createDataFrame(rows, "subj STRING, item INT, x DOUBLE")
    r = cronbach_alpha(df, "subj", "item", "x", n_items=2).collect()[0]
    assert r["n_subjects"] == 4
    assert r["alpha"] == pytest.approx(1.0, abs=1e-6)


def test_cronbach_uncorrelated_items_low_alpha(spark):
    # independent items: alpha near 0 (can be negative)
    vals1 = [1.0, 2.0, 3.0, 4.0]
    vals2 = [4.0, 1.0, 3.0, 2.0]
    rows = []
    for i in range(4):
        rows += [(f"s{i}", 1, vals1[i]), (f"s{i}", 2, vals2[i])]
    df = spark.createDataFrame(rows, "subj STRING, item INT, x DOUBLE")
    r = cronbach_alpha(df, "subj", "item", "x", n_items=2).collect()[0]
    assert r["alpha"] < 0.5


def test_cronbach_excludes_incomplete_batteries(spark):
    rows = [("s1", 1, 1.0), ("s1", 2, 2.0), ("s2", 1, 3.0)]
    df = spark.createDataFrame(rows, "subj STRING, item INT, x DOUBLE")
    r = cronbach_alpha(df, "subj", "item", "x", n_items=2).collect()[0]
    assert r["n_subjects"] == 1 and r["n_excluded_subjects"] == 1
    with pytest.raises(ValueError, match="n_items"):
        cronbach_alpha(df, "subj", "item", "x", n_items=1)

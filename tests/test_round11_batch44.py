"""Round-11 widening batch 44: Jonckheere-Terpstra ordered-trend
test."""

from __future__ import annotations

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    jonckheere_terpstra,
)


def _df(spark, spec):
    rows = [(g, float(v)) for g, vals in spec for v in vals]
    return spark.createDataFrame(rows, "g STRING, x DOUBLE")


def test_jt_hand_computed_no_ties(spark):
    # groups g1 < g2 < g3, values perfectly ordered:
    # every cross-pair favors the higher group -> JT = max = sum of
    # n_i*n_j over pairs = 2*2*3 = 12
    spec = [("g1", [1, 2]), ("g2", [3, 4]), ("g3", [5, 6])]
    r = jonckheere_terpstra(
        _df(spark, spec), "g", "x", ["g1", "g2", "g3"]
    ).collect()[0]
    assert r["n"] == 6 and r["k"] == 3
    assert r["jt_stat"] == 12.0
    # mean = (36 - 12)/4 = 6; no-tie var = [n^2(2n+3) - sum ni^2(2ni+3)]/72
    assert r["mean_jt"] == 6.0
    var = (36 * 15 - 3 * (4 * 7)) / 72
    assert r["sigma_jt"] == pytest.approx(var**0.5, abs=1e-6)
    assert r["z"] == pytest.approx((12 - 6) / var**0.5, abs=1e-5)


def test_jt_reversed_order_negative(spark):
    spec = [("g1", [5, 6]), ("g2", [3, 4]), ("g3", [1, 2])]
    r = jonckheere_terpstra(
        _df(spark, spec), "g", "x", ["g1", "g2", "g3"]
    ).collect()[0]
    assert r["jt_stat"] == 0.0
    assert r["z"] < 0


def test_jt_ties_count_half(spark):
    # all values identical: every pair is a tie -> JT = pairs/2 = mean
    spec = [("g1", [7, 7]), ("g2", [7, 7]), ("g3", [7, 7])]
    r = jonckheere_terpstra(
        _df(spark, spec), "g", "x", ["g1", "g2", "g3"]
    ).collect()[0]
    assert r["jt_stat"] == r["mean_jt"] == 6.0
    # one giant tie block: variance collapses to 0 -> z NULL
    assert r["sigma_jt"] == 0.0 and r["z"] is None


def test_jt_requires_three_groups(spark):
    df = _df(spark, [("g1", [1]), ("g2", [2])])
    with pytest.raises(ValueError, match="3 ordered groups"):
        jonckheere_terpstra(df, "g", "x", ["g1", "g2"])

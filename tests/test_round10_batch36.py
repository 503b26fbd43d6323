"""Round-10 widening batch 36: Cochran's Q, Friedman rank test."""

from __future__ import annotations

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    cochran_q,
    friedman_test,
)

_T3 = ["m1", "m2", "m3"]


def test_cochran_textbook(spark):
    # 4 items x 3 treatments; hand-computable
    data = {
        1: (1, 1, 0),
        2: (1, 0, 0),
        3: (1, 1, 1),
        4: (1, 0, 0),
    }
    rows = [
        (i, t, y)
        for i, ys in data.items()
        for t, y in zip(_T3, ys)
    ]
    df = spark.createDataFrame(rows, "item INT, t STRING, y INT")
    row = cochran_q(df, "item", "t", "y", _T3).collect()[0]
    cj = [4, 2, 1]
    ri = [2, 1, 3, 1]
    n = sum(cj)
    q = 2 * (3 * sum(c * c for c in cj) - n * n) / (3 * n - sum(r * r for r in ri))
    assert row["q_stat"] == pytest.approx(q, abs=1e-5)
    assert row["n_items"] == 4 and row["dof"] == 2


def test_cochran_no_difference_zero(spark):
    rows = [(i, t, 1 if i % 2 == 0 else 0) for i in range(6) for t in _T3]
    df = spark.createDataFrame(rows, "item INT, t STRING, y INT")
    row = cochran_q(df, "item", "t", "y", _T3).collect()[0]
    # every item all-0 or all-1: denominator k*N - sum(R^2) = 0 -> NULL
    assert row["q_stat"] is None


def test_cochran_incomplete_blocks_excluded(spark):
    rows = [(1, "m1", 1), (1, "m2", 0), (1, "m3", 1), (2, "m1", 1)]
    df = spark.createDataFrame(rows, "item INT, t STRING, y INT")
    row = cochran_q(df, "item", "t", "y", _T3).collect()[0]
    assert row["n_items"] == 1 and row["n_excluded"] == 1


def test_cochran_bad_arms_raise(spark):
    df = spark.createDataFrame([(1, "m1", 1)], "item INT, t STRING, y INT")
    with pytest.raises(ValueError, match="treatments"):
        cochran_q(df, "item", "t", "y", ["only"])


# --------------------------------------------------------------- friedman


def test_friedman_consistent_ordering_max_stat(spark):
    # m3 > m2 > m1 in every block: ranks 1,2,3 everywhere
    rows = [
        (i, t, float(j + 1) + i * 10)
        for i in range(5)
        for j, t in enumerate(_T3)
    ]
    df = spark.createDataFrame(rows, "item INT, t STRING, v DOUBLE")
    row = friedman_test(df, "item", "t", "v", _T3).collect()[0]
    n, k = 5, 3
    s = [n * 1, n * 2, n * 3]
    chi2 = 12 / (n * k * (k + 1)) * sum(x * x for x in s) - 3 * n * (k + 1)
    assert row["chi2_f"] == pytest.approx(chi2, abs=1e-5)
    assert row["chi2_f"] == pytest.approx(10.0, abs=1e-5)  # max for k=3,n=5


def test_friedman_ties_average_ranks(spark):
    # all equal within block: every rank = 2 -> chi2 = 0
    rows = [(i, t, 7.0) for i in range(4) for t in _T3]
    df = spark.createDataFrame(rows, "item INT, t STRING, v DOUBLE")
    row = friedman_test(df, "item", "t", "v", _T3).collect()[0]
    assert row["chi2_f"] == pytest.approx(0.0, abs=1e-6)


def test_friedman_incomplete_blocks_excluded(spark):
    rows = [(1, "m1", 1.0), (1, "m2", 2.0), (1, "m3", 3.0), (2, "m1", 1.0)]
    df = spark.createDataFrame(rows, "item INT, t STRING, v DOUBLE")
    row = friedman_test(df, "item", "t", "v", _T3).collect()[0]
    assert row["n_items"] == 1 and row["n_excluded"] == 1

"""Round-10 widening batch 23: Croston intermittent-demand forecast,
nearest-centroid (Rocchio) label audit, centroid silhouette."""

from __future__ import annotations

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.similarity import (
    centroid_silhouette,
    label_centroids,
    rocchio_assign,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.windows import (
    croston_forecast,
)

# -------------------------------------------------------------- croston


def test_croston_steady_intermittent(spark):
    # demand 6 every 3rd period: z_hat -> 6, p_hat -> 3, forecast -> 2
    rows = [("sku", p, 6.0 if p % 3 == 0 else 0.0) for p in range(1, 19)]
    df = spark.createDataFrame(rows, "k STRING, p INT, d DOUBLE")
    row = croston_forecast(df, ["k"], "p", "d").collect()[0]
    assert row["n_demands"] == 6
    assert row["z_hat"] == pytest.approx(6.0)
    assert row["p_hat"] == pytest.approx(3.0)
    assert row["forecast"] == pytest.approx(2.0)


def test_croston_single_demand_null_interval(spark):
    rows = [("sku", 1, 5.0), ("sku", 2, 0.0)]
    df = spark.createDataFrame(rows, "k STRING, p INT, d DOUBLE")
    row = croston_forecast(df, ["k"], "p", "d").collect()[0]
    assert row["z_hat"] == pytest.approx(5.0)
    assert row["p_hat"] is None
    assert row["forecast"] is None


def test_croston_weights_recent_sizes(spark):
    # sizes 2 then 10 (alpha .5, adjust): (10*1 + 2*0.5)/(1.5) = 7.3333
    rows = [("sku", 1, 2.0), ("sku", 5, 10.0)]
    df = spark.createDataFrame(rows, "k STRING, p INT, d DOUBLE")
    row = croston_forecast(df, ["k"], "p", "d").collect()[0]
    assert row["z_hat"] == pytest.approx((10 + 1) / 1.5, abs=1e-4)
    assert row["p_hat"] == pytest.approx(4.0)  # single interval


def test_croston_zero_rows_ignored_vs_absent(spark):
    # same non-zero pattern with and without explicit zero rows
    nz = [("a", 2, 4.0), ("a", 6, 8.0)]
    with_zeros = nz + [("a", p, 0.0) for p in (1, 3, 4, 5)]
    d1 = spark.createDataFrame(nz, "k STRING, p INT, d DOUBLE")
    d2 = spark.createDataFrame(with_zeros, "k STRING, p INT, d DOUBLE")
    r1 = croston_forecast(d1, ["k"], "p", "d").collect()[0]
    r2 = croston_forecast(d2, ["k"], "p", "d").collect()[0]
    assert r1 == r2


def test_croston_bad_alpha_raises(spark):
    df = spark.createDataFrame([("a", 1, 1.0)], "k STRING, p INT, d DOUBLE")
    with pytest.raises(ValueError, match="alpha"):
        croston_forecast(df, ["k"], "p", "d", alpha=0.0)


# ------------------------------------------------------------ centroids


_EMB = "id INT, lbl INT, emb ARRAY<FLOAT>"


def _emb_df(spark):
    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [0.9, 0.1]),
        (3, 1, [0.0, 1.0]),
        (4, 1, [0.1, 0.9]),
    ]
    return spark.createDataFrame(rows, _EMB)


def test_label_centroids_means(spark):
    out = {r["label"]: r for r in label_centroids(_emb_df(spark), "lbl", "emb").collect()}
    assert out[0]["centroid"] == pytest.approx([0.95, 0.05])
    assert out[1]["centroid"] == pytest.approx([0.05, 0.95])
    assert out[0]["n_vecs"] == 2


def test_rocchio_separable_is_diagonal(spark):
    out = rocchio_assign(_emb_df(spark), "id", "lbl", "emb").collect()
    cells = {(r["label"], r["assigned_label"]): r["n_vecs"] for r in out}
    assert cells == {(0, 0): 2, (1, 1): 2}


def test_rocchio_mislabeled_point_lands_off_diagonal(spark):
    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [0.9, 0.1]),
        (3, 0, [0.95, 0.05]),
        (4, 1, [0.0, 1.0]),
        (5, 1, [0.1, 0.9]),
        (6, 1, [0.05, 0.95]),
        (7, 0, [0.0, 1.0]),  # labeled 0, clearly class 1
    ]
    df = spark.createDataFrame(rows, _EMB)
    out = rocchio_assign(df, "id", "lbl", "emb").collect()
    cells = {(r["label"], r["assigned_label"]): r["n_vecs"] for r in out}
    assert cells[(0, 1)] == 1  # the planted noise point


def test_silhouette_separated_near_one(spark):
    out = {
        r["label"]: r
        for r in centroid_silhouette(_emb_df(spark), "id", "lbl", "emb").collect()
    }
    assert out[0]["avg_silhouette"] > 0.8
    assert out[1]["avg_silhouette"] > 0.8
    assert out[0]["n_vecs"] == 2


def test_silhouette_overlapping_near_zero(spark):
    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [0.0, 1.0]),
        (3, 1, [1.0, 0.0]),
        (4, 1, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, _EMB)
    out = centroid_silhouette(df, "id", "lbl", "emb").collect()
    # identical class distributions: a == b for every point -> s == 0
    for r in out:
        assert r["avg_silhouette"] == pytest.approx(0.0, abs=1e-6)


def test_silhouette_single_label_null(spark):
    rows = [(1, 0, [1.0, 0.0]), (2, 0, [0.9, 0.1])]
    df = spark.createDataFrame(rows, _EMB)
    out = centroid_silhouette(df, "id", "lbl", "emb").collect()
    assert len(out) == 1
    assert out[0]["avg_silhouette"] is None  # no "other" centroid exists

"""Planted-fixture tests for round-10 widening batch 10: the
expectation audit, semantic outlier screen, sample-ratio-mismatch
check, leave-one-out target encoding, and DP noisy counts."""

import pytest
from pyspark.sql import functions as F

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.profiling import (
    expectation_audit,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.similarity import (
    semantic_outlier,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    dp_noisy_counts,
    srm_check,
    target_encode,
)


# -------------------------------------------------------- expectation


def test_expectation_audit_counts_violations(spark):
    df = spark.createDataFrame(
        [
            (1, 5.0, "x"),
            (2, -1.0, "y"),  # range violation
            (2, 50.0, "zz"),  # dup id, regexp violation
            (None, None, "x"),  # null id; null value skips range
        ],
        "id INT, v DOUBLE, tag STRING",
    )
    out = {
        (r["column"], r["expectation"]): r
        for r in expectation_audit(
            df,
            [
                {"column": "id", "kind": "not_null"},
                {"column": "id", "kind": "unique"},
                {"column": "v", "kind": "range", "lo": 0, "hi": 10},
                {"column": "tag", "kind": "regexp", "pattern": "^[xy]$"},
                {"column": "tag", "kind": "in_set", "values": ["x", "y"]},
            ],
        ).collect()
    }
    assert out[("id", "not_null")]["n_violations"] == 1
    assert out[("id", "unique")]["n_violations"] == 1  # 3 non-null, 2 distinct
    assert out[("v", "range")]["n_violations"] == 2  # -1 and 50
    assert out[("tag", "regexp")]["n_violations"] == 1  # 'zz'
    assert out[("tag", "in_set")]["n_violations"] == 1
    assert out[("id", "not_null")]["n_rows"] == 4
    assert out[("id", "not_null")]["violation_rate"] == pytest.approx(0.25)
    assert not out[("v", "range")]["passed"]


def test_expectation_audit_all_pass(spark):
    df = spark.createDataFrame([(1,), (2,)], "id INT")
    rows = expectation_audit(
        df,
        [
            {"column": "id", "kind": "not_null"},
            {"column": "id", "kind": "unique"},
        ],
    ).collect()
    assert all(r["passed"] for r in rows)


def test_expectation_audit_unknown_kind_raises(spark):
    df = spark.createDataFrame([(1,)], "id INT")
    with pytest.raises(ValueError, match="unknown expectation"):
        expectation_audit(df, [{"column": "id", "kind": "positive"}])


# ----------------------------------------------------------- semantic


def test_semantic_outlier_flags_flipped_vector(spark):
    rows = [
        (1, "g", [1.0, 0.0]),
        (2, "g", [0.95, 0.05]),
        (3, "g", [0.9, 0.1]),
        (4, "g", [-1.0, 0.0]),  # the planted outlier
    ]
    df = spark.createDataFrame(
        rows, "vid INT, grp STRING, emb ARRAY<FLOAT>"
    )
    out = {
        r["vid"]: r
        for r in semantic_outlier(
            df, "vid", "grp", "emb", bottom_frac=0.25
        ).collect()
    }
    assert out[4]["is_outlier"] is True
    assert out[4]["cos_centroid"] < 0
    assert all(not out[i]["is_outlier"] for i in (1, 2, 3))


def test_semantic_outlier_bad_frac_raises(spark):
    df = spark.createDataFrame([(1, "g", [1.0])], "vid INT, grp STRING, emb ARRAY<FLOAT>")
    with pytest.raises(ValueError, match="bottom_frac"):
        semantic_outlier(df, "vid", "grp", "emb", bottom_frac=1.5)


# ---------------------------------------------------------------- srm


def test_srm_chi2_pinned(spark):
    # 60/40 on a 50/50 design, n=100: chi2 = 2 * 10^2/50 = 4.0
    rows = [("a",)] * 60 + [("b",)] * 40 + [("c",)] * 5
    df = spark.createDataFrame(rows, "arm STRING")
    r = srm_check(df, "arm", {"a": 0.5, "b": 0.5}).collect()[0]
    assert r["k"] == 2 and r["n"] == 100 and r["dof"] == 1
    assert r["n_undeclared"] == 5
    assert r["chi2"] == pytest.approx(4.0)


def test_srm_missing_arm_counts_zero(spark):
    df = spark.createDataFrame([("a",)] * 10, "arm STRING")
    r = srm_check(df, "arm", {"a": 0.5, "b": 0.5}).collect()[0]
    # arm b observed 0: chi2 = 5^2/5 + 5^2/5 = 10
    assert r["n"] == 10 and r["chi2"] == pytest.approx(10.0)


def test_srm_bad_shares_raise(spark):
    df = spark.createDataFrame([("a",)], "arm STRING")
    with pytest.raises(ValueError, match="sum positive"):
        srm_check(df, "arm", {"a": 0.0})


# -------------------------------------------------------- target enc


def test_target_encode_loo_pinned(spark):
    # cat a: targets [1,2,3]; cat b: [10]; m=2; global mean 4
    rows = [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0), (4, "b", 10.0)]
    df = spark.createDataFrame(rows, "id INT, cat STRING, t DOUBLE")
    out = {
        r["id"]: r["target_enc"]
        for r in target_encode(df, "cat", "t", smoothing=2.0).collect()
    }
    assert out[1] == pytest.approx((6 - 1 + 2 * 4) / 4)  # 3.25
    assert out[2] == pytest.approx(3.0)
    assert out[3] == pytest.approx(2.75)
    assert out[4] == pytest.approx(4.0)  # singleton -> global mean


def test_target_encode_own_label_excluded(spark):
    # two rows in one cat with very different targets: each row's
    # encoding moves AWAY from its own label (no leakage)
    rows = [(1, "a", 0.0), (2, "a", 100.0)]
    df = spark.createDataFrame(rows, "id INT, cat STRING, t DOUBLE")
    out = {
        r["id"]: r["target_enc"]
        for r in target_encode(df, "cat", "t", smoothing=0.0).collect()
    }
    assert out[1] == pytest.approx(100.0)  # the OTHER row's mean
    assert out[2] == pytest.approx(0.0)


# ----------------------------------------------------------------- dp


def test_dp_counts_deterministic_and_scaled(spark):
    df = spark.createDataFrame(
        [("x",)] * 100 + [("y",)] * 50, "g STRING"
    )
    a = {
        r["g"]: r["noisy_count"]
        for r in dp_noisy_counts(df, ["g"], epsilon=1.0, salt=3).collect()
    }
    b = {
        r["g"]: r["noisy_count"]
        for r in dp_noisy_counts(df, ["g"], epsilon=1.0, salt=3).collect()
    }
    assert a == b  # deterministic per (group, salt)
    ten = {
        r["g"]: r["noisy_count"]
        for r in dp_noisy_counts(df, ["g"], epsilon=10.0, salt=3).collect()
    }
    for g, true_n in (("x", 100), ("y", 50)):
        n1 = a[g] - true_n
        n10 = ten[g] - true_n
        # same uniform draw, scale b = 1/eps: noise shrinks 10x
        # (abs tolerance: both outputs are rounded to 6 dp, and the
        # x10 amplifies the n10 rounding error to 5e-6)
        assert n1 == pytest.approx(10 * n10, abs=2e-5)


def test_dp_counts_salt_changes_noise(spark):
    df = spark.createDataFrame([("x",)] * 100, "g STRING")
    a = dp_noisy_counts(df, ["g"], epsilon=0.1, salt=1).collect()[0]
    b = dp_noisy_counts(df, ["g"], epsilon=0.1, salt=2).collect()[0]
    assert a["noisy_count"] != b["noisy_count"]


def test_dp_counts_bad_epsilon_raises(spark):
    df = spark.createDataFrame([("x",)], "g STRING")
    with pytest.raises(ValueError, match="epsilon"):
        dp_noisy_counts(df, ["g"], epsilon=0.0)

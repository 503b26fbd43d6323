"""Round-10 widening batch 34: leave-one-source-out data valuation."""

from __future__ import annotations

import math

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.text import (
    loso_source_value,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "source STRING, text STRING")


def test_loso_matching_source_is_valuable(spark):
    # src_a speaks the eval language; src_b is noise: removing a must
    # cost held-out likelihood, removing b must not
    rows = [
        ("a", "apple banana apple banana apple"),
        ("b", "zebra xylophone quark gluon meson"),
        ("eval", "apple banana apple"),
    ]
    out = {
        r["source"]: r
        for r in loso_source_value(_df(spark, rows), eval_source="eval").collect()
    }
    assert out["a"]["value"] > 0
    assert out["a"]["value"] > out["b"]["value"]


def test_loso_hand_computed_single_word(spark):
    # train: a: "x x", b: "y". eval: "x".
    # full: c_x=2, N=3, V=2 -> p = 3/5
    # loo(a): c_x=0, N=1, V=2 -> p = 1/3
    # loo(b): c_x=2, N=2, V=2 -> p = 3/4
    rows = [("a", "x x"), ("b", "y"), ("eval", "x")]
    out = {
        r["source"]: r
        for r in loso_source_value(_df(spark, rows), eval_source="eval").collect()
    }
    assert out["a"]["full_logprob"] == pytest.approx(math.log(3 / 5), abs=1e-5)
    assert out["a"]["loo_logprob"] == pytest.approx(math.log(1 / 3), abs=1e-5)
    assert out["b"]["loo_logprob"] == pytest.approx(math.log(3 / 4), abs=1e-5)
    assert out["a"]["value"] == pytest.approx(
        math.log(3 / 5) - math.log(1 / 3), abs=1e-5
    )
    assert out["b"]["value"] < 0  # removing noise IMPROVES the fit
    # per-source training-token counts vs the shared eval-slice size
    assert out["a"]["n_train_tokens"] == 2
    assert out["b"]["n_train_tokens"] == 1
    assert out["a"]["n_eval_tokens"] == 1
    assert out["b"]["n_eval_tokens"] == 1


def test_loso_eval_never_trains(spark):
    # eval tokens absent from training: smoothing handles them, and
    # the eval slice must not leak into counts
    rows = [("a", "p q"), ("eval", "zzz")]
    out = loso_source_value(_df(spark, rows), eval_source="eval").collect()
    assert len(out) == 1
    # c_zzz = 0 -> full p = 1/(2+2); removing a -> 1/(0+2)
    assert out[0]["full_logprob"] == pytest.approx(math.log(1 / 4), abs=1e-5)
    assert out[0]["loo_logprob"] == pytest.approx(math.log(1 / 2), abs=1e-5)


def test_loso_requires_eval_source(spark):
    df = _df(spark, [("a", "x")])
    with pytest.raises(ValueError, match="eval_source"):
        loso_source_value(df)

"""Planted-fixture tests for round-10 widening batch 19: time-decay
attribution and MMR reranking."""

import datetime as dt

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.funnels import (
    time_decay_attribution,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.similarity import (
    mmr_rerank,
)

_E_SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"


def _ts(day):
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=day)


# ----------------------------------------------------------- time decay


def test_time_decay_recent_touch_outranks_old(spark):
    rows = [
        (1, _ts(0), 1, "view", 0.0),
        (2, _ts(7), 1, "click", 0.0),
        (3, _ts(7), 1, "purchase", 100.0),
    ]
    df = spark.createDataFrame(rows, _E_SCHEMA)
    out = {
        r["channel"]: r
        for r in time_decay_attribution(
            df, "purchase", ["view", "click"], halflife_days=7.0
        ).collect()
    }
    # weights: view 2^0 = 1, click 2^1 = 2 -> shares 1/3 and 2/3
    assert out["view"]["attributed_value"] == pytest.approx(33.3333, abs=1e-3)
    assert out["click"]["attributed_value"] == pytest.approx(66.6667, abs=1e-3)
    assert out["view"]["n_conversions"] == 1


def test_time_decay_untouched_goes_to_none(spark):
    rows = [(1, _ts(0), 2, "purchase", 50.0)]
    df = spark.createDataFrame(rows, _E_SCHEMA)
    out = time_decay_attribution(
        df, "purchase", ["view", "click"]
    ).collect()
    assert len(out) == 1
    assert out[0]["channel"] == "(none)"
    assert out[0]["attributed_value"] == pytest.approx(50.0)


def test_time_decay_equal_times_equal_credit(spark):
    rows = [
        (1, _ts(3), 1, "view", 0.0),
        (2, _ts(3), 1, "click", 0.0),
        (3, _ts(5), 1, "purchase", 10.0),
    ]
    df = spark.createDataFrame(rows, _E_SCHEMA)
    out = {
        r["channel"]: r["attributed_value"]
        for r in time_decay_attribution(
            df, "purchase", ["view", "click"]
        ).collect()
    }
    assert out["view"] == pytest.approx(out["click"])


# ------------------------------------------------------------------ mmr


def _cands(spark):
    rows = [
        ("q", 1, [1.0, 0.0], 1.0),
        ("q", 2, [0.999, 0.0447], 0.95),  # near-duplicate of 1
        ("q", 3, [0.0, 1.0], 0.5),  # orthogonal
        ("q", 4, [0.0, 0.9], 0.4),  # parallel to 3
    ]
    return spark.createDataFrame(
        rows, "query_id STRING, cand_id INT, emb ARRAY<FLOAT>, rel DOUBLE"
    )


def test_mmr_diversity_beats_near_duplicate(spark):
    out = sorted(
        mmr_rerank(
            _cands(spark), "query_id", "cand_id", "emb", "rel",
            k=3, lam=0.5,
        ).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["cand_id"] for r in out] == [1, 3, 2]
    assert out[0]["mmr_score"] == pytest.approx(1.0)
    # round 2: c3 wins with 0.5*0.5 - 0.5*0 = 0.25
    assert out[1]["mmr_score"] == pytest.approx(0.25)


def test_mmr_k_beyond_candidates(spark):
    df = _cands(spark).filter("cand_id <= 2")
    out = mmr_rerank(
        df, "query_id", "cand_id", "emb", "rel", k=10, lam=0.5
    ).collect()
    assert len(out) == 2  # rounds past exhaustion emit nothing


def test_mmr_lam_one_is_pure_relevance(spark):
    out = sorted(
        mmr_rerank(
            _cands(spark), "query_id", "cand_id", "emb", "rel",
            k=4, lam=1.0,
        ).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["cand_id"] for r in out] == [1, 2, 3, 4]  # rel order


def test_mmr_bad_params_raise(spark):
    df = _cands(spark)
    with pytest.raises(ValueError, match="k must"):
        mmr_rerank(df, "query_id", "cand_id", "emb", "rel", k=0)
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(df, "query_id", "cand_id", "emb", "rel", lam=1.5)

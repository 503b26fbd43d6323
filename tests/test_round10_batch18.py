"""Planted-fixture tests for round-10 widening batch 18: sentence
chunking, pseudonymization, DP noisy sums."""

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import dp_noisy_sum
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.text import (
    sentence_chunks,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.sources.cleanser import (
    pseudonymize,
)


# ------------------------------------------------------------ chunks


def test_sentence_chunks_windows(spark):
    df = spark.createDataFrame(
        [(1, "One. Two! Three? Four. Five. Six.")],
        "doc_id INT, text STRING",
    )
    out = {
        r["chunk_id"]: r
        for r in sentence_chunks(
            df, sents_per_chunk=5, stride=4
        ).collect()
    }
    assert len(out) == 2
    assert out[0]["n_sentences"] == 5
    assert out[0]["chunk_text"] == "One. Two! Three? Four. Five."
    assert out[1]["n_sentences"] == 2
    assert out[1]["chunk_text"] == "Five. Six."


def test_sentence_chunks_short_doc_single_chunk(spark):
    df = spark.createDataFrame(
        [(1, "Hello world")], "doc_id INT, text STRING"
    )
    out = sentence_chunks(df).collect()
    assert len(out) == 1
    assert out[0]["n_sentences"] == 1
    assert out[0]["chunk_text"] == "Hello world"


def test_sentence_chunks_bad_params_raise(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id INT, text STRING")
    with pytest.raises(ValueError, match="must be >= 1"):
        sentence_chunks(df, stride=0)


# ------------------------------------------------------- pseudonymize


def test_pseudonymize_stable_and_null_preserving(spark):
    df = spark.createDataFrame(
        [(1, "alice", 5.0), (2, "alice", 6.0), (3, None, 7.0)],
        "id INT, name STRING, v DOUBLE",
    )
    out = pseudonymize(df, ["name"], salt=3).collect()
    toks = {r["id"]: r["name"] for r in out}
    assert toks[1] == toks[2]  # stable mapping
    assert toks[1].startswith("P") and toks[1] != "alice"
    assert toks[3] is None
    assert {r["v"] for r in out} == {5.0, 6.0, 7.0}  # others untouched


def test_pseudonymize_salt_rotates_tokens(spark):
    df = spark.createDataFrame([(1, "alice")], "id INT, name STRING")
    a = pseudonymize(df, ["name"], salt=1).collect()[0]["name"]
    b = pseudonymize(df, ["name"], salt=2).collect()[0]["name"]
    assert a != b


def test_pseudonymize_preserves_joinability(spark):
    left = spark.createDataFrame([(1, "bob")], "id INT, name STRING")
    right = spark.createDataFrame([("bob", "x")], "name STRING, attr STRING")
    lp = pseudonymize(left, ["name"], salt=9)
    rp = pseudonymize(right, ["name"], salt=9)
    assert lp.join(rp, "name").count() == 1


# ----------------------------------------------------------- dp sums


def test_dp_sum_clips_and_converges_at_huge_epsilon(spark):
    df = spark.createDataFrame(
        [("g", 100.0), ("g", 2000.0)], "g STRING, v DOUBLE"
    )
    r = dp_noisy_sum(
        df, ["g"], "v", clip_lo=0.0, clip_hi=1000.0, epsilon=1e9
    ).collect()[0]
    # 2000 clips to 1000; noise scale (hi-lo)/eps = 1e-6
    assert r["noisy_sum"] == pytest.approx(1100.0, abs=1e-3)


def test_dp_sum_deterministic_and_noisy(spark):
    df = spark.createDataFrame([("g", 10.0)] * 50, "g STRING, v DOUBLE")
    a = dp_noisy_sum(df, ["g"], "v", 0.0, 20.0, epsilon=1.0, salt=4)
    b = dp_noisy_sum(df, ["g"], "v", 0.0, 20.0, epsilon=1.0, salt=4)
    va, vb = a.collect()[0]["noisy_sum"], b.collect()[0]["noisy_sum"]
    assert va == vb  # deterministic per (group, salt)
    assert va != pytest.approx(500.0, abs=1e-9)  # noise present


def test_dp_sum_bad_params_raise(spark):
    df = spark.createDataFrame([("g", 1.0)], "g STRING, v DOUBLE")
    with pytest.raises(ValueError, match="epsilon"):
        dp_noisy_sum(df, ["g"], "v", 0.0, 1.0, epsilon=0.0)
    with pytest.raises(ValueError, match="clip_lo"):
        dp_noisy_sum(df, ["g"], "v", 2.0, 1.0, epsilon=1.0)

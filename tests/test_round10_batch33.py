"""Round-10 widening batch 33: winnowing fingerprints (MOSS) and
fingerprint-overlap pairing."""

from __future__ import annotations

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.text import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)

K, W = 3, 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_winnow_density_and_full_windows(spark):
    words = " ".join(f"w{i}" for i in range(30))  # 28 grams, 25 windows
    df = _docs(spark, [(1, words)])
    out = winnow_fingerprints(df, k=K, w=W).collect()
    n_windows = 28 - W + 1
    assert 0 < len(out) <= n_windows
    # winnowing guarantees gap between consecutive picks <= w
    picks = sorted(r["pos"] for r in out)
    assert all(b - a <= W for a, b in zip(picks, picks[1:]))


def test_winnow_short_doc_empty(spark):
    # k+w-1 = 6 words needed for one full window of 3-gram hashes
    df = _docs(spark, [(1, "a b c d e")])
    assert winnow_fingerprints(df, k=K, w=W).count() == 0


def test_winnow_deterministic(spark):
    words = " ".join(f"t{i % 7}" for i in range(40))
    df = _docs(spark, [(1, words)])
    a = sorted(map(tuple, winnow_fingerprints(df, k=K, w=W).collect()))
    b = sorted(map(tuple, winnow_fingerprints(df, k=K, w=W).collect()))
    assert a == b


def test_winnow_shared_substring_guarantee(spark):
    # docs share a run of w+k-1 = 6 words -> >= 1 shared fingerprint
    shared = "alpha beta gamma delta epsilon zeta"
    d1 = "one two three " + shared + " four five six"
    d2 = "seven eight nine ten " + shared + " eleven"
    df = _docs(spark, [(1, d1), (2, d2)])
    pairs = winnow_overlap_pairs(df, k=K, w=W, min_shared=1).collect()
    assert len(pairs) == 1
    assert (pairs[0]["id_a"], pairs[0]["id_b"]) == (1, 2)


def test_winnow_disjoint_docs_share_nothing(spark):
    d1 = " ".join(f"a{i}" for i in range(20))
    d2 = " ".join(f"b{i}" for i in range(20))
    df = _docs(spark, [(1, d1), (2, d2)])
    assert winnow_overlap_pairs(df, k=K, w=W, min_shared=1).count() == 0


def test_winnow_max_df_drops_boilerplate(spark):
    # the same text in 5 docs: with max_df=2 every fingerprint is
    # ubiquitous, so no pairs survive
    text = " ".join(f"c{i}" for i in range(15))
    df = _docs(spark, [(i, text) for i in range(1, 6)])
    assert (
        winnow_overlap_pairs(df, k=K, w=W, min_shared=1, max_df=2).count()
        == 0
    )
    # with a loose cap, all 10 pairs appear
    assert (
        winnow_overlap_pairs(df, k=K, w=W, min_shared=1, max_df=10).count()
        == 10
    )


def test_winnow_bad_params_raise(spark):
    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="k and w"):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError, match="max_df"):
        winnow_overlap_pairs(df, max_df=1)

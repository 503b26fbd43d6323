"""Round-10 widening batch 24: capture-recapture, Good-Turing unseen
mass, co-occurrence lift, Heaps'-law fit."""

from __future__ import annotations

import math

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.funnels import (
    cooccurrence_lift,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.profiling import (
    capture_recapture,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.text import (
    heaps_law_fit,
    unseen_mass,
)

# ---------------------------------------------------- capture-recapture


def test_chapman_textbook(spark):
    # n1=10 captured by A, n2=8 by B, overlap 4:
    # N_hat = 11*9/5 - 1 = 18.8
    rows = (
        [("A", f"k{i}") for i in range(10)]
        + [("B", f"k{i}") for i in range(4)]  # overlap k0-k3
        + [("B", f"x{i}") for i in range(4)]
    )
    df = spark.createDataFrame(rows, "src STRING, key STRING")
    row = capture_recapture(df, "src", "key", "A", "B").collect()[0]
    assert (row["n_a"], row["n_b"], row["n_both"]) == (10, 8, 4)
    assert row["n_hat"] == pytest.approx(11 * 9 / 5 - 1, abs=1e-2)
    var = 11 * 9 * 6 * 4 / (25 * 6)
    assert row["se_hat"] == pytest.approx(math.sqrt(var), abs=1e-2)
    assert row["ci_low"] <= row["n_hat"] <= row["ci_high"]


def test_chapman_no_overlap_still_finite(spark):
    rows = [("A", "a1"), ("A", "a2"), ("B", "b1")]
    df = spark.createDataFrame(rows, "src STRING, key STRING")
    row = capture_recapture(df, "src", "key", "A", "B").collect()[0]
    assert row["n_both"] == 0
    assert row["n_hat"] == pytest.approx(3 * 2 / 1 - 1)


def test_chapman_duplicates_within_source_collapse(spark):
    rows = [("A", "k"), ("A", "k"), ("B", "k"), ("C", "ignored")]
    df = spark.createDataFrame(rows, "src STRING, key STRING")
    row = capture_recapture(df, "src", "key", "A", "B").collect()[0]
    assert (row["n_a"], row["n_b"], row["n_both"]) == (1, 1, 1)


# ----------------------------------------------------------- unseen mass


def test_unseen_mass_hand(spark):
    # corpus: "a a b c" -> N=4, V=3, N1=2 (b,c), N2=1 (a)
    df = spark.createDataFrame([("g", "a a b c")], "g STRING, text STRING")
    row = unseen_mass(df, "g").collect()[0]
    assert row["n_tokens"] == 4 and row["vocab"] == 3
    assert row["n_singletons"] == 2 and row["n_doubletons"] == 1
    assert row["p_unseen"] == pytest.approx(0.5)
    assert row["r_star_1"] == pytest.approx(1.0)


def test_unseen_mass_saturated_vocab(spark):
    df = spark.createDataFrame(
        [("g", "a a a a b b b b")], "g STRING, text STRING"
    )
    row = unseen_mass(df, "g").collect()[0]
    assert row["p_unseen"] == pytest.approx(0.0)
    assert row["r_star_1"] is None  # no singletons


def test_unseen_mass_groups_independent(spark):
    df = spark.createDataFrame(
        [("x", "a b"), ("y", "a a")], "g STRING, text STRING"
    )
    out = {r["g"]: r for r in unseen_mass(df, "g").collect()}
    assert out["x"]["p_unseen"] == pytest.approx(1.0)
    assert out["y"]["p_unseen"] == pytest.approx(0.0)


# -------------------------------------------------------------- co-lift


def test_lift_independent_pair_is_one(spark):
    # 4 users, every combination of x/y exactly balanced
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"),
        (3, "y"),
        (4, "x"), (4, "y"),
    ]
    df = spark.createDataFrame(rows, "u INT, item STRING")
    row = cooccurrence_lift(df, "u", "item").collect()[0]
    # P(x)=3/4, P(y)=3/4, P(xy)=2/4 -> lift = 0.5/(0.5625) = 0.8889
    assert row["n_both"] == 2
    assert row["lift"] == pytest.approx(4 * 2 / (3 * 3), abs=1e-4)
    assert row["support"] == pytest.approx(0.5)


def test_lift_always_together_high(spark):
    rows = [(u, i) for u in range(1, 6) for i in ("a", "b")]
    df = spark.createDataFrame(rows, "u INT, item STRING")
    row = cooccurrence_lift(df, "u", "item").collect()[0]
    assert row["lift"] == pytest.approx(1.0)  # both in every basket
    rows2 = rows + [(9, "c"), (10, "c")]
    df2 = spark.createDataFrame(rows2, "u INT, item STRING")
    out = {(r["item_a"], r["item_b"]): r for r in cooccurrence_lift(df2, "u", "item").collect()}
    assert out[("a", "b")]["lift"] == pytest.approx(7 / 5, abs=1e-4)


def test_lift_duplicate_events_collapse(spark):
    rows = [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y")]
    df = spark.createDataFrame(rows, "u INT, item STRING")
    row = cooccurrence_lift(df, "u", "item").collect()[0]
    assert row["n_both"] == 2  # per-entity incidence, not event count


def test_lift_min_both_filters(spark):
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "z")]
    df = spark.createDataFrame(rows, "u INT, item STRING")
    out = cooccurrence_lift(df, "u", "item", min_both=2).collect()
    assert out == []


# ------------------------------------------------------------ heaps law


def test_heaps_fit_recovers_exponent(spark):
    # synth slices with V = 2 * N^0.5 exactly: beta -> 0.5, k -> 2
    rows = []
    for gi, n in enumerate([100, 400, 2500]):
        v = int(2 * math.sqrt(n))
        # v distinct words, then pad with repeats of word w0 up to n
        words = [f"w{j}" for j in range(v)] + ["w0"] * (n - v)
        rows.append((f"g{gi}", " ".join(words)))
    df = spark.createDataFrame(rows, "g STRING, text STRING")
    row = heaps_law_fit(df, "g").collect()[0]
    assert row["n_slices"] == 3
    assert row["beta"] == pytest.approx(0.5, abs=0.01)
    assert row["k_coef"] == pytest.approx(2.0, abs=0.1)
    assert row["r2"] == pytest.approx(1.0, abs=1e-3)


def test_heaps_single_slice_null(spark):
    df = spark.createDataFrame([("g", "a b c")], "g STRING, text STRING")
    row = heaps_law_fit(df, "g").collect()[0]
    assert row["beta"] is None and row["r2"] is None

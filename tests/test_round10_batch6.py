"""Planted-fixture tests for round-10 widening batch 6: Spearman rank
correlation, one-way ANOVA, Kruskal–Wallis, the t-closeness EMD audit,
and VWAP — values pinned against hand-computed / scipy-textbook
fixtures small enough to check by hand."""

import pytest
from pyspark.sql import functions as F

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    anova_f,
    empirical_bayes_rates,
    feature_info_gain,
    kendall_tau,
    mutual_information,
    kruskal_wallis,
    spearman_corr,
    t_closeness_audit,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.windows import volume_weighted_avg


# ---------------------------------------------------------- spearman


def test_spearman_perfect_monotone_is_one(spark):
    # y = x^3 is perfectly monotone but wildly non-linear: Pearson
    # would be < 1, Spearman must be exactly 1
    df = spark.createDataFrame(
        [("g", float(x), float(x) ** 3) for x in range(1, 20)],
        "g STRING, x DOUBLE, y DOUBLE",
    )
    row = spearman_corr(df, "x", "y", "g").collect()[0]
    assert row["n"] == 19
    assert row["rho"] == pytest.approx(1.0)


def test_spearman_ties_average_rank(spark):
    # textbook tie case: x = [1,2,2,4], y = [1,3,2,4]
    # rank_x = [1, 2.5, 2.5, 4], rank_y = [1,3,2,4]
    # rho = 1 - not applicable with ties -> Pearson of ranks = 0.9487
    df = spark.createDataFrame(
        [
            ("g", 1.0, 1.0),
            ("g", 2.0, 3.0),
            ("g", 2.0, 2.0),
            ("g", 4.0, 4.0),
        ],
        "g STRING, x DOUBLE, y DOUBLE",
    )
    row = spearman_corr(df, "x", "y", "g").collect()[0]
    # scipy.stats.spearmanr -> 0.9486832980505138
    assert row["rho"] == pytest.approx(0.948683, abs=1e-6)


def test_spearman_constant_column_is_null(spark):
    df = spark.createDataFrame(
        [("g", 1.0, float(i)) for i in range(5)],
        "g STRING, x DOUBLE, y DOUBLE",
    )
    row = spearman_corr(df, "x", "y", "g").collect()[0]
    assert row["rho"] is None  # zero rank variance -> guarded NULL


# ------------------------------------------------------------- anova


def test_anova_textbook_f(spark):
    # three groups [1,2,3], [2,3,4], [5,6,7]:
    # grand mean 3.6667; SSB = 3*( (2-3.667)^2+(3-3.667)^2+(6-3.667)^2 )
    # = 3*(2.7778+0.4444+5.4444)=26.0; SSW = 6.0
    # F = (26/2)/(6/6) = 13.0 ; eta^2 = 26/32
    rows = [("a", v) for v in (1.0, 2.0, 3.0)]
    rows += [("b", v) for v in (2.0, 3.0, 4.0)]
    rows += [("c", v) for v in (5.0, 6.0, 7.0)]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    r = anova_f(df, "v", "g").collect()[0]
    assert r["k"] == 3 and r["n"] == 9
    assert r["f_stat"] == pytest.approx(13.0, abs=1e-6)
    assert r["eta_sq"] == pytest.approx(26.0 / 32.0, abs=1e-6)
    assert r["dof_between"] == 2 and r["dof_within"] == 6


def test_anova_identical_groups_f_zero(spark):
    rows = [(g, v) for g in "ab" for v in (1.0, 2.0, 3.0)]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    r = anova_f(df, "v", "g").collect()[0]
    assert r["f_stat"] == pytest.approx(0.0, abs=1e-9)


def test_anova_degenerate_single_group_null(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "g STRING, v DOUBLE"
    )
    r = anova_f(df, "v", "g").collect()[0]
    assert r["f_stat"] is None  # dof_between = 0 -> guarded NULL


# ---------------------------------------------------- kruskal-wallis


def test_kruskal_wallis_textbook_fixture(spark):
    # ranks 1..12, no ties: R = (16, 20, 42)
    # H = 12/(12*13) * (256/4 + 400/4 + 1764/4) - 3*13 = 7.538462
    rows = [("a", v) for v in (1.0, 3.0, 5.0, 7.0)]
    rows += [("b", v) for v in (2.0, 4.0, 6.0, 8.0)]
    rows += [("c", v) for v in (10.0, 11.0, 12.0, 13.0)]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    r = kruskal_wallis(df, "v", "g").collect()[0]
    assert r["k"] == 3 and r["n"] == 12 and r["dof"] == 2
    assert r["h_stat"] == pytest.approx(7.538462, abs=1e-6)


def test_kruskal_wallis_ties_corrected(spark):
    # scipy.stats.kruskal([1,1,1],[2,2,2]) -> H = 5.0 (tie-corrected)
    rows = [("a", 1.0)] * 3 + [("b", 2.0)] * 3
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    r = kruskal_wallis(df, "v", "g").collect()[0]
    assert r["h_stat"] == pytest.approx(5.0, abs=1e-6)


def test_kruskal_wallis_all_tied_null(spark):
    # every value identical: correction divisor hits 0 -> guarded NULL
    rows = [("a", 2.0)] * 3 + [("b", 2.0)] * 4
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    r = kruskal_wallis(df, "v", "g").collect()[0]
    assert r["h_stat"] is None


# ------------------------------------------------------- t-closeness


def test_t_closeness_flags_skewed_group(spark):
    # global bands ~ uniform over {0,1}; group "z" sits entirely in
    # band 1 -> its CDF gap at band 0 is ~0.5 -> EMD ~ 0.5 (m=2)
    rows = [("a", i % 2) for i in range(40)]
    rows += [("z", 1) for _ in range(10)]
    df = spark.createDataFrame(rows, "qi STRING, band INT")
    out = t_closeness_audit(df, ["qi"], "band", t_max=0.25).collect()
    flagged = {r["qi"]: r for r in out}
    assert "z" in flagged and "a" not in flagged
    # exact EMD: |0/10 - 20/50| = 0.4 at band 0, 0 at band 1; /(m-1)=1
    assert flagged["z"]["emd"] == pytest.approx(0.4, abs=1e-9)
    assert flagged["z"]["n"] == 10


def test_t_closeness_zero_fills_missing_bands(spark):
    # group "b" never appears in band 2; without zero-fill its CDF
    # would be short and the EMD wrong
    rows = [("a", b) for b in (0, 1, 2)] * 5
    rows += [("b", 0)] * 5
    df = spark.createDataFrame(rows, "qi STRING, band INT")
    out = t_closeness_audit(df, ["qi"], "band", t_max=0.1).collect()
    flagged = {r["qi"]: r["emd"] for r in out}
    # global CDF over bands 0,1,2 = (0.5, 0.75, 1); n_all = 20
    # group b (all band 0): CDF (1,1,1) -> EMD = (0.5 + 0.25)/2 = 0.375
    # group a (uniform):    CDF (1/3, 2/3, 1) -> EMD = 0.125
    assert flagged["b"] == pytest.approx(0.375, abs=1e-6)
    assert flagged["a"] == pytest.approx(0.125, abs=1e-6)


def test_t_closeness_uniform_groups_unflagged(spark):
    rows = [(g, b) for g in "abcd" for b in (0, 1, 2) for _ in range(7)]
    df = spark.createDataFrame(rows, "qi STRING, band INT")
    assert t_closeness_audit(df, ["qi"], "band", t_max=0.01).count() == 0


# -------------------------------------------------------------- vwap


def test_vwap_weights_by_size(spark):
    # two trades: 1 @ 100.00 and 9 @ 50.00
    # vwap = (100 + 450)/10 = 55.0 ; mean price = 75.0 ; bias = -20
    df = spark.createDataFrame(
        [("k", 100.0, 1.0), ("k", 50.0, 9.0)],
        "k STRING, price DOUBLE, qty DOUBLE",
    )
    r = volume_weighted_avg(df, ["k"], "price", "qty").collect()[0]
    assert r["n"] == 2 and r["total_qty"] == 10
    assert r["vwap"] == pytest.approx(55.0)
    assert r["avg_price"] == pytest.approx(75.0)
    assert r["size_bias"] == pytest.approx(-20.0)


def test_vwap_notional_column_exact(spark):
    # notional already on the row (extended-price shape): vwap uses it
    df = spark.createDataFrame(
        [("k", 10.01, 3.0, 30.03), ("k", 9.99, 1.0, 9.99)],
        "k STRING, price DOUBLE, qty DOUBLE, notional DOUBLE",
    )
    r = volume_weighted_avg(
        df, ["k"], "price", "qty", notional_col="notional"
    ).collect()[0]
    assert r["vwap"] == pytest.approx((30.03 + 9.99) / 4.0, abs=1e-6)
    assert r["avg_price"] == pytest.approx(10.0, abs=1e-6)


def test_vwap_zero_qty_group_null(spark):
    df = spark.createDataFrame(
        [("k", 5.0, 0.0)], "k STRING, price DOUBLE, qty DOUBLE"
    )
    r = volume_weighted_avg(df, ["k"], "price", "qty").collect()[0]
    assert r["vwap"] is None and r["size_bias"] is None


# ------------------------------------------- information-theory pair


def test_mutual_information_independent_is_zero(spark):
    # x and y independent uniform: MI = 0 exactly (counts are uniform)
    rows = [(str(i % 2), str(j % 3)) for i in range(2) for j in range(3)] * 5
    df = spark.createDataFrame(rows, "x STRING, y STRING")
    r = mutual_information(df, "x", "y").collect()[0]
    assert r["mi_nats"] == pytest.approx(0.0, abs=1e-9)
    assert r["h_x"] == pytest.approx(0.693147, abs=1e-6)  # ln 2
    assert r["h_y"] == pytest.approx(1.098612, abs=1e-6)  # ln 3


def test_mutual_information_identity_equals_entropy(spark):
    # y == x: MI = H(x) = H(y), NMI = 1
    rows = [(str(i % 4), str(i % 4)) for i in range(40)]
    df = spark.createDataFrame(rows, "x STRING, y STRING")
    r = mutual_information(df, "x", "y").collect()[0]
    assert r["mi_nats"] == pytest.approx(r["h_x"], abs=1e-6)
    assert r["nmi"] == pytest.approx(1.0, abs=1e-6)


def test_info_gain_perfect_feature_ranks_first(spark):
    # f1 determines the label exactly; f2 is pure noise
    rows = [
        (float(i % 2), float((i * 7) % 5), "yes" if i % 2 else "no")
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "f1 DOUBLE, f2 DOUBLE, y STRING")
    out = feature_info_gain(df, ["f1", "f2"], "y", bins=4).collect()
    assert out[0]["feature"] == "f1"  # ordered by info_gain desc
    # perfect feature: IG = H(label) = ln 2
    assert out[0]["info_gain"] == pytest.approx(0.693147, abs=1e-6)
    assert out[1]["info_gain"] == pytest.approx(0.0, abs=1e-6)


def test_info_gain_constant_feature_guarded(spark):
    rows = [(1.0, "a")] * 5 + [(1.0, "b")] * 5
    df = spark.createDataFrame(rows, "f DOUBLE, y STRING")
    r = feature_info_gain(df, ["f"], "y", bins=4).collect()[0]
    # single bin: no information, and gain_ratio guarded NULL
    assert r["info_gain"] == pytest.approx(0.0, abs=1e-9)
    assert r["gain_ratio"] is None


# ------------------------------------- concordance + shrinkage pair


def test_kendall_tau_textbook_no_ties(spark):
    # y by x-order = [3,4,1,2,5]: C = 6, D = 4, tau = 0.2
    df = spark.createDataFrame(
        [(1, 3), (2, 4), (3, 1), (4, 2), (5, 5)], "x INT, y INT"
    )
    r = kendall_tau(df, "x", "y").collect()[0]
    assert r["n"] == 5
    assert r["concordant"] == 6 and r["discordant"] == 4
    assert r["tau_b"] == pytest.approx(0.2, abs=1e-9)


def test_kendall_tau_b_tie_correction(spark):
    # x = [1,1,2,2], y = [1,2,3,4]: C = 4, D = 0, n1 = 2, n2 = 0
    # tau_b = 4 / sqrt((6-2)*(6-0)) = 0.816497
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 3), (2, 4)], "x INT, y INT"
    )
    r = kendall_tau(df, "x", "y").collect()[0]
    assert r["concordant"] == 4 and r["discordant"] == 0
    assert r["tau_b"] == pytest.approx(0.816497, abs=1e-6)


def test_kendall_tau_perfect_inverse(spark):
    df = spark.createDataFrame(
        [(i, 10 - i) for i in range(10)], "x INT, y INT"
    )
    r = kendall_tau(df, "x", "y").collect()[0]
    assert r["tau_b"] == pytest.approx(-1.0, abs=1e-9)


def test_empirical_bayes_shrinks_small_samples(spark):
    # a 1-for-1 entity must NOT outrank a 980-for-1000 one after
    # shrinkage, even though its raw rate is higher
    rows = [("A", 1)]  # 1/1
    rows += [("B", 1)] * 980 + [("B", 0)] * 20  # 980/1000
    for e in "cdefghij":
        rows += [(e, 1)] * 2 + [(e, 0)] * 8  # 0.2 background
    df = spark.createDataFrame(rows, "k STRING, s INT")
    out = {
        r["k"]: r
        for r in empirical_bayes_rates(
            df, ["k"], F.col("s") == 1, min_n=1
        ).collect()
    }
    assert out["A"]["raw_rate"] == pytest.approx(1.0)
    assert out["A"]["shrunk_rate"] < out["B"]["shrunk_rate"]
    # big-sample entity barely moves
    assert abs(out["B"]["shrunk_rate"] - 0.98) < 0.01


def test_empirical_bayes_degenerate_prior_null(spark):
    # every entity has the same rate: zero variance -> guarded NULL
    rows = [(e, s) for e in "abc" for s in (1, 0)]
    df = spark.createDataFrame(rows, "k STRING, s INT")
    out = empirical_bayes_rates(df, ["k"], F.col("s") == 1).collect()
    assert all(r["shrunk_rate"] is None for r in out)
    assert all(r["raw_rate"] == pytest.approx(0.5) for r in out)

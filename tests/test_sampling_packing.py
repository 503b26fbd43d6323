from __future__ import annotations

from pyspark.sql import functions as F

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators import sampling


def _docs(spark, n=400):
    return spark.createDataFrame(
        [(i, "en" if i % 4 else "es", 10 + i % 50) for i in range(n)],
        "doc_id LONG, lang STRING, tokens LONG",
    )


def test_stable_sample_deterministic_subset(spark):
    d = _docs(spark)
    a = {r["doc_id"] for r in sampling.stable_sample(d, 0.3).collect()}
    b = {r["doc_id"] for r in sampling.stable_sample(d, 0.3).collect()}
    assert a == b  # reproducible, no RNG state
    bigger = {r["doc_id"] for r in sampling.stable_sample(d, 0.6).collect()}
    assert a <= bigger  # gates nest: raising the fraction only adds rows
    assert 0.15 <= len(a) / 400 <= 0.45  # near the target rate
    # different salt -> a decorrelated sample
    c = {r["doc_id"] for r in sampling.stable_sample(d, 0.3, salt=99).collect()}
    assert c != a


def test_stable_sample_fast_path_matches_shape(spark):
    d = _docs(spark)
    fast = sampling.stable_sample(d, 0.3, portable=False)
    n = fast.count()
    assert 0.15 * 400 <= n <= 0.45 * 400
    assert fast.count() == n  # deterministic too


def test_stratified_sample_respects_per_stratum_rates(spark):
    d = _docs(spark)  # 300 en / 100 es
    out = sampling.stratified_sample(
        d, {"en": 0.5, "es": 0.0}, strata_col="lang"
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert "es" not in by_lang  # 0% stratum fully dropped
    assert 0.3 * 300 <= by_lang["en"] <= 0.7 * 300
    # unlisted strata use default_fraction (0.0 here -> only en survives)
    assert set(by_lang) == {"en"}


def test_pack_sequences_contract(spark):
    d = _docs(spark)
    packed = sampling.pack_sequences(
        d.withColumn("shard", F.pmod("doc_id", F.lit(4))),
        token_col="tokens",
        budget=100,
        shard_col="shard",
    ).collect()
    by_shard: dict[int, list] = {}
    for r in packed:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        offset = 0
        for r in rows:
            # offsets are the exact concatenation layout, in order
            assert r["pack_offset"] == offset
            assert r["pack_id"] == offset // 100
            assert r["pack_pos"] == offset % 100
            offset += r["tokens"]


def test_pack_sequences_rejects_bad_budget(spark):
    import pytest

    with pytest.raises(ValueError):
        sampling.pack_sequences(_docs(spark), "tokens", 0, "lang")
    with pytest.raises(ValueError):
        sampling.stable_sample(_docs(spark), 1.5)

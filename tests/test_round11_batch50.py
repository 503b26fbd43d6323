"""Round-11 widening batch 50: annotation-budget composition, Storey
q-values."""

from __future__ import annotations

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    bh_adjust,
    storey_qvalue,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.queries.curation import (
    q_annotation_budget,
)


def test_storey_scales_bh_by_pi0(spark):
    # 6 small p (signal) + 4 clearly null above lambda=0.5 ->
    # pi0 = 4 / (0.5 * 10) = 0.8
    ps = [0.001, 0.002, 0.003, 0.004, 0.005, 0.01,
          0.6, 0.7, 0.8, 0.9]
    df = spark.createDataFrame(
        [(f"t{i}", p) for i, p in enumerate(ps)], "t STRING, p DOUBLE"
    )
    bh = {r["t"]: r["q_value"] for r in bh_adjust(df, "p").collect()}
    st = {r["t"]: r for r in storey_qvalue(df, "p").collect()}
    assert all(r["pi0"] == pytest.approx(0.8) for r in st.values())
    for t in bh:
        assert st[t]["q_value"] == pytest.approx(
            min(bh[t] * 0.8, 1.0), abs=1e-5
        )
    # Storey is uniformly no more conservative than BH
    assert all(st[t]["q_value"] <= bh[t] + 1e-12 for t in bh)


def test_storey_all_null_pi0_capped(spark):
    ps = [0.6, 0.7, 0.8, 0.9, 0.95]
    df = spark.createDataFrame(
        [(f"t{i}", p) for i, p in enumerate(ps)], "t STRING, p DOUBLE"
    )
    out = storey_qvalue(df, "p").collect()
    assert all(r["pi0"] == 1.0 for r in out)  # capped
    assert all(r["reject"] is False for r in out)
    with pytest.raises(ValueError, match="lambda_"):
        storey_qvalue(df, "p", lambda_=1.0)


def test_annotation_budget_end_to_end(spark, tmp_path):
    rows = []
    # src_a: 6 unique docs with VERY different lengths (high sigma)
    texts_a = ["w " * n for n in (5, 10, 200, 300, 400, 500)]
    for i, t in enumerate(texts_a):
        rows.append((i, "src_a", t.strip(), "en"))
    # src_b: 6 docs but three are exact dups; uniform lengths
    for i in range(6):
        rows.append((100 + i, "src_b", "same text here" if i < 3
                     else f"uniq {i} " * 30, "en"))
    spark.createDataFrame(
        rows, "doc_id LONG, source STRING, text STRING, lang STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["source"]: r for r in q_annotation_budget(spark, str(tmp_path)).collect()}
    total = sum(r["n_alloc"] for r in out.values())
    # allocations sum to the budget unless a stratum saturated
    assert total <= 500
    # dedup happened: src_b's population reflects keepers/quality
    # gate, never the raw 6
    assert out["src_b"]["n_pop"] < 6

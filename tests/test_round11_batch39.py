"""Round-11 widening batch 39: dedup savings accounting, LSH
threshold sweep."""

from __future__ import annotations

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.queries.curation import (
    q_dedup_savings,
    q_lsh_threshold_sweep,
)


@pytest.fixture()
def docs_dir(spark, tmp_path):
    rows = [
        # src_a: "x y z" twice (dup, 3 tokens each) + one unique
        (1, "src_a", "x y z", "en"),
        (2, "src_a", "x y z", "en"),
        (3, "src_a", "unique alpha", "en"),
        # src_b: a cross-source dup of doc 1 (keeper is doc 1, so
        # src_b's copy is pure savings) + one unique
        (4, "src_b", "x y z", "en"),
        (5, "src_b", "solo beta gamma delta", "en"),
    ]
    spark.createDataFrame(
        rows, "doc_id LONG, source STRING, text STRING, lang STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_dedup_savings_hand_computed(spark, docs_dir):
    out = {r["source"]: r for r in q_dedup_savings(spark, docs_dir).collect()}
    a, b = out["src_a"], out["src_b"]
    # src_a: 3 docs, keeper set = {1 (min id for "x y z"), 3}
    assert a["n_docs"] == 3 and a["n_kept"] == 2
    assert a["tokens_total"] == 8 and a["tokens_kept"] == 5
    assert a["token_savings"] == pytest.approx(3 / 8, abs=1e-6)
    # src_b: its "x y z" copy loses to doc 1 across sources
    assert b["n_docs"] == 2 and b["n_kept"] == 1
    assert b["tokens_total"] == 7 and b["tokens_kept"] == 4
    assert b["token_savings"] == pytest.approx(3 / 7, abs=1e-6)


def test_lsh_sweep_monotone_and_complete(spark, docs_dir):
    rows = q_lsh_threshold_sweep(spark, docs_dir).collect()
    # every threshold reports, even zero-match cuts
    assert [r["threshold"] for r in rows] == [0.25, 0.5, 0.75, 1.0]
    counts = [r["n_pairs"] for r in rows]
    assert counts == sorted(counts, reverse=True)  # cuts only shrink
    # the exact dups (docs 1/2/4 pairwise) agree on every slot
    assert rows[-1]["n_pairs"] >= 3
    assert rows[-1]["mean_est_jaccard"] == pytest.approx(1.0)

"""Regression gate for physical-plan anti-patterns.

Runs the plan auditor (tools/plan_audit.py) over EVERY registered
query at sf0.01 and fails on any hard flag — a row-at-a-time Python
UDF (BatchEvalPython), a cartesian product, or an unkeyed
BroadcastNestedLoopJoin against a non-scalar build side.  This is the
pytest form of the manual audit tool: without it nothing would stop a
future edit from reintroducing a row-UDF into a hot path unnoticed.

The detector itself is exercised by planting each anti-pattern in a
small DataFrame and asserting the auditor flags it — proof the gate
actually fires, not just that today's queries happen to be clean.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from plan_audit import audit_flags, hard_flags  # noqa: E402

SF_DIR_AUDIT = "/root/testdata/sf0.01"


def test_every_query_plan_is_clean(spark):
    from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark import queries as q

    audited = dict(q.QUERIES)
    audited.update(
        {n: f for n, f in q.AUX_QUERIES.items() if not n.startswith("streaming_")}
    )
    failures = {}
    # The scan count is CACHE-SENSITIVE: an InMemoryRelation left by
    # an earlier test (or by a just-audited query whose operator calls
    # .persist() at construction) substitutes into matching subtrees
    # and changes how many "Scan parquet" lines the formatted plan
    # prints — the suite-order flake this guards against.  Audit each
    # query against a clean cache.
    spark.catalog.clearCache()
    for name, fn in audited.items():
        flags, _scans = audit_flags(fn(spark, SF_DIR_AUDIT))
        spark.catalog.clearCache()
        hard = hard_flags(flags)
        if hard:
            failures[name] = hard
    assert not failures, f"plan anti-patterns: {failures}"


def test_detector_catches_row_python_udf(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    df = spark.range(10)
    # deliberate row-at-a-time UDF: the exact mutation the suite gate
    # must catch if one ever lands in a registered query
    bad = F.udf(lambda x: x + 1, LongType())
    flags, _ = audit_flags(df.select(bad("id").alias("y")))
    assert "ROW-PYTHON-UDF" in flags


def test_detector_catches_cartesian_product(spark):
    # a small crossJoin broadcasts (BNLJ-Cross); a true CartesianProduct
    # only appears when neither side can broadcast — force that by
    # disabling auto-broadcast for the check
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(5)
        b = spark.range(5).withColumnRenamed("id", "id2")
        flags, _ = audit_flags(a.crossJoin(b))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "CARTESIAN" in flags


def test_detector_catches_theta_bnlj(spark):
    a = spark.range(50).withColumnRenamed("id", "id_a")
    b = spark.range(50).withColumnRenamed("id", "id_b")
    from pyspark.sql import functions as F

    flags, _ = audit_flags(a.join(b, F.col("id_a") < F.col("id_b")))
    assert "THETA-BNLJ" in flags

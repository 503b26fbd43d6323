"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL project
(anhassan/Azure-Databricks-SharePoint-On-Premise-to-Cloud-ETL), rebuilt
Spark-first.

The reference is a set of Databricks notebooks that ingest CSV / nested
JSON / SharePoint-Excel into a normalized, RUN_ID-versioned Delta
schema with watermark-driven incremental processing, hierarchical
interval joins, batched/retried side-effecting sinks, and table
maintenance.  This package re-expresses every one of those capabilities
as a library of composable, independently testable DataFrame->DataFrame
operators (SURVEY.md section 2 is the coverage checklist), plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) the reference's domain implies at
100 TB scale.

Design stance (SURVEY.md section 7.1):
- declarative DataFrame/SQL plans, Catalyst does the optimizing;
- no driver-side collect loops in the data plane;
- Python UDFs only where built-ins genuinely cannot express the
  semantics, and then Arrow-batched (pandas UDFs / mapInPandas);
- explicit schemas everywhere, deterministic results (injectable clock
  / run_id) so every operator is oracle-checkable against DuckDB.
"""

__version__ = "0.1.0"

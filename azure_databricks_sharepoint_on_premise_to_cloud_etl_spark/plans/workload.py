"""Workload-detail and staffing-matrix ingestion pipelines (SURVEY.md
3.2, entry point B — code/ukg_wrkload_dtl.py:207-241 and
code/ukg_stf_matrx.py).

Reference flow: token -> valid-qualifier filter (collect to list) ->
per-batch API POST -> Python JSON walk -> pandas -> fold-union ->
Delta append.  Here: the qualifier filter stays a DataFrame (semi-join
semantics), documents fetch through the pluggable REST source, the
JSON walk is the explode-based normalizer, and the master/child pair
lands via the audit writer — no pandas hop, no fold-union (all
documents parse as ONE DataFrame).
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.writers import append_versioned
from ..sources.json_source import (
    STAFFING_SCHEMA,
    WORKLOAD_SCHEMA,
    json_documents_df,
    normalize_staffing,
    normalize_workload,
)
from ..sources.rest_source import Transport, fetch_documents

WORKLOAD_SELECT_KEYS = (
    "SCHEDULE_COVERAGE_SCHEDULED_COUNT",
    "SCHEDULE_WORKLOAD_PLANNED_COUNT",
)


def valid_qualifiers(mapping: DataFrame, flag_col: str = "mwod_yes_no") -> list[str]:
    """The reference's get_valid_qualifiers
    (code/ukg_wrkload_dtl.py:65-72): latest snapshot, flag filter,
    qualifier list.  Collecting IS correct here — the list steers
    driver-side HTTP batching (control plane), not data processing."""
    from ..operators.snapshots import latest_snapshot

    rows = (
        latest_snapshot(mapping, "run_id")
        .filter(F.lower(F.col(flag_col)) == "yes")
        .select("dept_bus_strctr")
        .distinct()
        .collect()
    )
    return [r["dept_bus_strctr"] for r in rows]


def ingest_workload(
    spark: SparkSession,
    url: str,
    transport: Transport,
    qualifiers: Sequence[str],
    date_start: str,
    date_end: str,
    master_path: str,
    child_path: str,
    run_id: int,
    now: _dt.datetime | None = None,
    batch_size: int = 1,
) -> tuple[DataFrame, DataFrame, "BatchReport"]:
    """Fetch + normalize + persist the workload master/child pair.

    Backfill (R5) = widen ``date_start``/``date_end``.  Failed batches
    retry element-by-element (R2); persistent failures come back in
    the report (R3) so the caller can alert (sinks/notify.py) — the
    persisted run is still written, but the gap is VISIBLE, unlike a
    silent skip.
    """
    docs, report = fetch_documents(
        url, transport, WORKLOAD_SELECT_KEYS, qualifiers, date_start, date_end,
        batch_size=batch_size,
    )
    doc_df = json_documents_df(spark, docs, WORKLOAD_SCHEMA)
    master, child = normalize_workload(doc_df)
    append_versioned(master, master_path, run_id=run_id, now=now)
    append_versioned(child, child_path, run_id=run_id, now=now)
    return master, child, report


def ingest_staffing(
    spark: SparkSession,
    docs: list[str],
    master_path: str,
    child_path: str,
    run_id: int,
    now: _dt.datetime | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Staffing-matrix ingest from fetched documents (the fetch side is
    identical to ingest_workload's; split so tests can target the
    normalize+persist half)."""
    doc_df = json_documents_df(spark, docs, STAFFING_SCHEMA)
    master, child = normalize_staffing(doc_df)
    append_versioned(master, master_path, run_id=run_id, now=now)
    append_versioned(child, child_path, run_id=run_id, now=now)
    return master, child

"""Department/business-structure mapping refresh (SURVEY.md 3.3, entry
point C — code/ukg_dept_bus_strctr.py + code/download_from_sharepoint.py).

Reference flow: Graph OAuth -> drive traversal -> last-modified gate ->
Excel download -> pandas -> CSV -> schema'd CSV scan -> drop_na ->
audit append.  Here the change gate and Excel conversion come from
sources/sharepoint.py (pluggable fetcher), na-dropping and audit
stamping are the engine's operators, and the whole refresh is one
testable function that returns None when the source is unchanged
(the reference's early exit).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.writers import append_versioned, make_run_id
from ..sources.sharepoint import (
    Fetcher,
    check_modified,
    commit_last_modified,
    excel_bytes_to_df,
)

MAPPING_COLUMNS = (
    "epic_dept_id",
    "dept_bus_strctr",
    "frcst_yn",
    "mwod_yes_no",
    "stf_matrx_yes_no",
)


def refresh_mapping(
    spark: SparkSession,
    fetcher: Fetcher,
    control_dir: str,
    table_path: str,
    now: _dt.datetime | None = None,
    required_cols: tuple[str, ...] = ("epic_dept_id", "dept_bus_strctr"),
    probe=None,
) -> DataFrame | None:
    """Refresh the mapping table from the remote workbook.

    Returns the ingested DataFrame, or None when the remote file is
    unchanged (T4 gate — the pipeline is skipped entirely,
    code/download_from_sharepoint.py:104-124).  Rows with NULL key
    columns are dropped (P5, code/ukg_dept_bus_strctr.py:36-39); casts
    are ANSI-safe (`try_cast`); the append is RUN_ID-versioned so
    readers use ``latest_snapshot``.
    """
    remote = check_modified(spark, fetcher, control_dir, "mapping", probe=probe)
    if remote is None:
        return None
    raw = excel_bytes_to_df(spark, remote.content)
    lowered = raw.select(
        *[F.col(c).alias(c.lower()) for c in raw.columns]
    )
    typed = lowered.withColumn(
        "epic_dept_id", F.col("epic_dept_id").try_cast("long")
    )
    cleaned = typed.na.drop(subset=list(required_cols))
    run_id = make_run_id(now or _dt.datetime.now(_dt.timezone.utc))
    append_versioned(cleaned, table_path, run_id=run_id, now=now)
    # watermark advances ONLY after the versioned append succeeded — a
    # failed ingest must be retried next run, not skipped forever
    commit_last_modified(spark, control_dir, "mapping", remote)
    return cleaned

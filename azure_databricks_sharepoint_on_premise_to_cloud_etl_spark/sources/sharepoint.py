"""SharePoint/Excel source with change-detection gate (SURVEY.md 2.1
S6/S7, 2.9 T4).

The reference OAuths against MS Graph, walks site->channel->folder->
item, downloads the Excel, converts to CSV with pandas, and — before
any of that — compares the file's lastModifiedDateTime against a
persisted 1-row control table, skipping the whole pipeline when
unchanged (code/download_from_sharepoint.py:35-141).

The Graph client here is PLUGGABLE (tests inject a fake returning
bytes + a timestamp; production wires msal/requests — not available in
this container).  The change gate and Excel->DataFrame conversion are
real and tested.

Production wiring recipe (mirrors code/download_from_sharepoint.py:35-69
using only the public MS Graph REST surface; every step is a plain
HTTPS GET/POST, so a ~30-line ``Fetcher``/``MtimeProbe`` closes the
gap mechanically):

1. token: POST https://login.microsoftonline.com/{tenant}/oauth2/v2.0/token
   with grant_type=client_credentials, client_id, client_secret,
   scope=https://graph.microsoft.com/.default -> access_token (bearer
   header for every call below).
2. site id: GET /v1.0/sites/{hostname}:/sites/{site-path}
   -> json["id"].
3. drive + folder walk: GET /v1.0/sites/{site_id}/drives to find the
   document library's drive id, then
   GET /v1.0/drives/{drive_id}/root:/{folder/path}:/children.
4. item metadata (the ``MtimeProbe``):
   GET /v1.0/drives/{drive_id}/items/{item_id}
   -> json["lastModifiedDateTime"]  (ISO-8601, 'Z' suffix — the
   change gate normalizes tz-aware vs naive, see ``_naive_utc``).
5. content (the ``Fetcher``):
   GET /v1.0/drives/{drive_id}/items/{item_id}/content
   -> bytes, wrapped as ``RemoteFile(content, last_modified)``.

Order matters for cost: run the probe FIRST (``check_modified`` with
``probe=``) so an unchanged file never pays the content download.
"""

from __future__ import annotations

import datetime as _dt
import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class RemoteFile:
    """What a Graph lookup returns: content + server-side mtime."""

    content: bytes
    last_modified: _dt.datetime


# fetcher() -> RemoteFile; production: Graph OAuth + download URL
Fetcher = Callable[[], RemoteFile]

# probe() -> last-modified timestamp ONLY (Graph item metadata, no
# download) — lets the gate skip the payload transfer entirely
MtimeProbe = Callable[[], _dt.datetime]


def _naive_utc(ts: _dt.datetime) -> _dt.datetime:
    """Normalize to tz-naive UTC: Graph returns tz-aware ('...Z')
    datetimes while Spark hands back tz-naive ones from the control
    table; comparing the two raises TypeError."""
    if ts.tzinfo is not None:
        return ts.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return ts


def _control_path(control_dir: str, key: str) -> str:
    return os.path.join(control_dir, f"last_modified_{key}")


def read_last_modified(
    spark: SparkSession, control_dir: str, key: str
) -> _dt.datetime | None:
    """Persisted watermark (the 1-row control table
    ukg.teams_file_last_modified_tm, code/download_from_sharepoint.py:104-124)."""
    path = _control_path(control_dir, key)
    if not os.path.isdir(path):
        return None
    row = spark.read.parquet(path).agg(F.max("last_modified")).first()
    return row[0]


def write_last_modified(
    spark: SparkSession, control_dir: str, key: str, ts: _dt.datetime
) -> None:
    spark.createDataFrame(
        [(ts,)], "last_modified TIMESTAMP"
    ).write.mode("overwrite").parquet(_control_path(control_dir, key))


def check_modified(
    spark: SparkSession,
    fetcher: Fetcher,
    control_dir: str,
    key: str,
    probe: MtimeProbe | None = None,
) -> RemoteFile | None:
    """T4 gate, check side only: return the file when its mtime is
    newer than the persisted watermark, else None (skip the pipeline —
    the reference's early-exit, code/download_from_sharepoint.py:104-124).

    With a ``probe`` (a metadata-only mtime lookup), an unchanged file
    skips the payload download entirely — the reference checked
    lastModifiedDateTime before downloading for exactly this reason.
    Does NOT advance the watermark — call :func:`commit_last_modified`
    after the ingest succeeds, so a failed ingest is retried on the
    next run instead of being skipped forever."""
    prev = read_last_modified(spark, control_dir, key)
    if probe is not None and prev is not None:
        if _naive_utc(probe()) <= _naive_utc(prev):
            return None
    remote = fetcher()
    if prev is not None and _naive_utc(remote.last_modified) <= _naive_utc(prev):
        return None
    return remote


def commit_last_modified(
    spark: SparkSession, control_dir: str, key: str, remote: RemoteFile
) -> None:
    """Advance the change-gate watermark — only after downstream
    persistence succeeded (same ordering discipline as the
    POST-success-gated audit, R6)."""
    write_last_modified(
        spark, control_dir, key, _naive_utc(remote.last_modified)
    )


def fetch_if_modified(
    spark: SparkSession,
    fetcher: Fetcher,
    control_dir: str,
    key: str,
) -> RemoteFile | None:
    """Check + eager commit in one call — for pipelines whose ingest
    cannot fail after the gate.  Prefer check_modified/commit_last_modified
    when anything between the gate and persistence can raise."""
    remote = check_modified(spark, fetcher, control_dir, key)
    if remote is not None:
        commit_last_modified(spark, control_dir, key, remote)
    return remote


def excel_bytes_to_df(
    spark: SparkSession, content: bytes, schema: str | None = None
) -> DataFrame:
    """Excel -> DataFrame via pandas on the driver (S6 — the workbook
    is control-plane-sized; code/download_from_sharepoint.py:133-141
    does pd.read_excel the same way).  Falls back to CSV parsing ONLY
    when the payload is not actually an Excel workbook (sniffed by
    magic bytes) or no Excel engine is installed (this container has
    none); a corrupt/truncated real workbook re-raises instead of being
    silently mis-parsed as one-garbage-column CSV."""
    import io

    import pandas as pd

    # xlsx = zip container (PK\x03\x04); legacy xls = OLE2 compound doc
    is_excel_payload = content[:4] == b"PK\x03\x04" or content[:8] == (
        b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    )
    try:
        pdf = pd.read_excel(io.BytesIO(content))
    except ImportError:
        if is_excel_payload:
            raise  # a real workbook needs a real engine — don't guess CSV
        pdf = pd.read_csv(io.BytesIO(content))
    except ValueError:
        if is_excel_payload:
            raise  # corrupt/truncated workbook — surface, don't mis-parse
        pdf = pd.read_csv(io.BytesIO(content))
    return (
        spark.createDataFrame(pdf, schema=schema)
        if schema
        else spark.createDataFrame(pdf)
    )

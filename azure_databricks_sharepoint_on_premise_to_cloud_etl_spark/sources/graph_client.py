"""MS Graph drive client — the production wiring for the SharePoint
source (SURVEY.md 2.1 S6), behind a pluggable HTTP transport.

Implements the reference's exact traversal
(code/download_from_sharepoint.py:35-94): client-credentials token →
drive root → document-folder children → named item →
lastModifiedDateTime probe / @microsoft.graph.downloadUrl → bytes —
using ONLY the public Graph REST surface (every call is a plain
HTTPS GET/POST documented at learn.microsoft.com/graph).

The transport is a callable ``(method, url, headers, data) ->
(status, body_bytes)``; tests inject canned public-API response
shapes (no network in this container), production passes a ~5-line
``requests`` adapter::

    def requests_transport(method, url, headers, data):
        r = requests.request(method, url, headers=headers, data=data)
        return r.status_code, r.content

Departures from the reference, deliberate:
- the token is CACHED until ``expires_in`` elapses (the reference
  re-POSTs per call; at one token request per item per run that is
  both slower and a throttling risk at fleet scale);
- errors raise with the Graph error payload attached (the reference
  only checks the token call, then KeyErrors on missing files);
- the metadata probe and the content download are separate methods so
  the change gate (sharepoint.check_modified) can skip the payload
  transfer for unchanged files — the reference downloads first and
  compares after.
"""

from __future__ import annotations

import datetime as _dt
import json
import time
import urllib.parse
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import ClassVar

from .sharepoint import MtimeProbe, RemoteFile

# (method, url, headers, data) -> (status_code, body_bytes)
GraphTransport = Callable[
    [str, str, dict[str, str], dict[str, str] | None], tuple[int, bytes]
]

GRAPH_ROOT = "https://graph.microsoft.com/v1.0"
LOGIN_ROOT = "https://login.microsoftonline.com"


class GraphError(RuntimeError):
    """Non-2xx or error-shaped Graph/identity response, payload kept."""

    def __init__(self, message: str, status: int, payload: object):
        super().__init__(f"{message} (HTTP {status}): {payload}")
        self.status = status
        self.payload = payload


@dataclass
class GraphClient:
    """Site-scoped Graph drive client.

    ``site_id`` is the composite Graph site id (the reference hard
    codes one at code/download_from_sharepoint.py:75); resolve it once
    via ``GET /sites/{hostname}:/sites/{path}`` out of band or with
    :meth:`resolve_site_id`.
    """

    tenant_id: str
    client_id: str
    client_secret: str
    site_id: str
    transport: GraphTransport
    # injectable clock so token-expiry tests don't sleep
    clock: Callable[[], float] = time.monotonic
    _token: str | None = field(default=None, init=False, repr=False)
    _token_expiry: float = field(default=0.0, init=False, repr=False)
    # pagination backstop: a misbehaving server must not hold the
    # client in an infinite @odata.nextLink chase (see child_id)
    _MAX_CHILD_PAGES: ClassVar[int] = 100

    # ----------------------------------------------------------- auth

    def token(self) -> str:
        """Client-credentials token (reference :35-51), cached until
        60 s before ``expires_in`` elapses."""
        if self._token is not None and self.clock() < self._token_expiry:
            return self._token
        url = f"{LOGIN_ROOT}/{self.tenant_id}/oauth2/v2.0/token"
        data = {
            "grant_type": "client_credentials",
            "client_id": self.client_id,
            "client_secret": self.client_secret,
            "scope": "https://graph.microsoft.com/.default",
        }
        status, body = self.transport(
            "POST",
            url,
            {"Content-Type": "application/x-www-form-urlencoded"},
            data,
        )
        payload = json.loads(body)
        # the identity endpoint signals failure via "error" even on
        # some 200s; the reference checks "errorCode" (:48) — accept
        # either shape
        if status >= 400 or "error" in payload or "errorCode" in payload:
            raise GraphError("token request failed", status, payload)
        self._token = payload["access_token"]
        self._token_expiry = (
            self.clock() + float(payload.get("expires_in", 3599)) - 60.0
        )
        return self._token

    # ------------------------------------------------------ raw calls

    def _get(self, path_or_url: str) -> dict:
        url = (
            path_or_url
            if path_or_url.startswith("http")
            else f"{GRAPH_ROOT}{path_or_url}"
        )
        status, body = self.transport(
            "GET", url, {"Authorization": f"Bearer {self.token()}"}, None
        )
        payload = json.loads(body)
        if status >= 400 or "error" in payload:
            raise GraphError(f"GET {url} failed", status, payload)
        return payload

    def _get_bytes(self, url: str, *, authenticated: bool = True) -> bytes:
        """Raw byte fetch.  ``authenticated=False`` for pre-signed URLs
        (@microsoft.graph.downloadUrl): those need no auth and live on
        a different host, so sending the Bearer token there would
        disclose it to another origin."""
        headers = (
            {"Authorization": f"Bearer {self.token()}"}
            if authenticated
            else {}
        )
        status, body = self.transport("GET", url, headers, None)
        if status >= 400:
            raise GraphError(f"GET {url} failed", status, body[:200])
        return body

    # ------------------------------------------------------- traversal

    def resolve_site_id(self, hostname: str, site_path: str) -> str:
        """``GET /sites/{hostname}:/sites/{path}`` → composite id."""
        quoted = urllib.parse.quote(site_path)
        return self._get(f"/sites/{hostname}:/sites/{quoted}")["id"]

    def drive_root_id(self) -> str:
        """Drive root item (reference :59-60)."""
        return self._get(f"/sites/{self.site_id}/drive/root")["id"]

    def child_id(self, parent_item_id: str, name: str) -> str:
        """Named child of a drive item (reference :62-67 walks
        root → doc folder → file with two children listings).

        Follows ``@odata.nextLink`` pagination: Graph pages /children
        at ~200 items, so a single-page read (the reference's flaw)
        would raise a spurious FileNotFoundError for files past the
        first page.

        Termination guard: the transport is untrusted network input, so
        a server replaying the same ``@odata.nextLink`` (or an endless
        chain of fresh ones) must fail fast instead of looping forever
        — repeated links raise immediately, and the chain is capped at
        ``_MAX_CHILD_PAGES`` (~20k items at Graph's ~200/page)."""
        names = []
        next_url: str | None = (
            f"/sites/{self.site_id}/drive/items/{parent_item_id}/children"
        )
        seen_urls: set[str] = set()
        pages = 0
        while next_url is not None:
            if next_url in seen_urls:
                raise GraphError(
                    f"@odata.nextLink loop detected at {next_url!r}", 0, ""
                )
            seen_urls.add(next_url)
            pages += 1
            if pages > self._MAX_CHILD_PAGES:
                raise GraphError(
                    f"children listing of {parent_item_id} exceeded "
                    f"{self._MAX_CHILD_PAGES} pages; refusing to follow "
                    "further @odata.nextLink",
                    0,
                    "",
                )
            payload = self._get(next_url)
            for child in payload["value"]:
                if child["name"] == name:
                    return child["id"]
                names.append(child["name"])
            next_url = payload.get("@odata.nextLink")
        raise FileNotFoundError(
            f"{name!r} not under item {parent_item_id}; children: {names}"
        )

    def item_id(self, doc_folder: str, file_name: str) -> str:
        """root → {doc_folder} → {file_name} (reference get_item_id,
        :55-69, same two-hop walk)."""
        root = self.drive_root_id()
        folder = self.child_id(root, doc_folder)
        return self.child_id(folder, file_name)

    # ------------------------------------------------- item operations

    def last_modified(self, item_id: str) -> _dt.datetime:
        """Metadata-only mtime (reference get_last_modified_tm,
        :88-94) — the cheap probe the change gate runs BEFORE any
        download.  Graph returns ISO-8601 with a Z suffix; parsed
        tz-aware (the gate normalizes, sharepoint._naive_utc)."""
        payload = self._get(
            f"/sites/{self.site_id}/drive/items/{item_id}"
            "?select=lastModifiedDateTime"
        )
        raw = payload["lastModifiedDateTime"]
        return _dt.datetime.fromisoformat(raw.replace("Z", "+00:00"))

    def download_url(self, item_id: str) -> str:
        """Pre-authenticated short-lived URL (reference
        get_download_link, :75-83)."""
        payload = self._get(
            f"/sites/{self.site_id}/drive/items/{item_id}/"
            "?select=id,@microsoft.graph.downloadUrl"
        )
        return payload["@microsoft.graph.downloadUrl"]

    def download(self, item_id: str) -> bytes:
        # pre-signed URL: fetched WITHOUT the Authorization header
        return self._get_bytes(self.download_url(item_id), authenticated=False)

    # ---------------------------------------- change-gate integration

    def fetcher(self, doc_folder: str, file_name: str):
        """A ``sharepoint.Fetcher``: one call = item walk + mtime +
        content, bundled as RemoteFile for check_modified."""

        def _fetch() -> RemoteFile:
            item = self.item_id(doc_folder, file_name)
            return RemoteFile(
                content=self.download(item),
                last_modified=self.last_modified(item),
            )

        return _fetch

    def mtime_probe(self, doc_folder: str, file_name: str) -> MtimeProbe:
        """A ``sharepoint.MtimeProbe``: metadata only, NO content
        transfer — give this to check_modified so unchanged files
        never pay the download."""

        def _probe() -> _dt.datetime:
            return self.last_modified(self.item_id(doc_folder, file_name))

        return _probe

"""Canned-fixture MS Graph client tests (round-11 task 7): the full
token → root → folder → item → probe/download traversal of
``sources/graph_client.py`` against recorded PUBLIC Graph API response
shapes — no network, the transport is a dict-backed fake.

Reference spec: code/download_from_sharepoint.py:35-94.
"""

from __future__ import annotations

import datetime as dt
import json

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.sources.graph_client import (
    GraphClient,
    GraphError,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.sources.sharepoint import (
    check_modified,
    commit_last_modified,
)

SITE = "contoso.sharepoint.com,5c85c577-d44c-4164,8426-f07970334690"
G = "https://graph.microsoft.com/v1.0"

TOKEN_URL = "https://login.microsoftonline.com/tid/oauth2/v2.0/token"

# canned public-API response shapes (fields as documented at
# learn.microsoft.com/graph/api/resources/driveitem)
FIXTURES = {
    ("POST", TOKEN_URL): (
        200,
        {
            "token_type": "Bearer",
            "expires_in": 3599,
            "access_token": "tok-1",
        },
    ),
    ("GET", f"{G}/sites/{SITE}/drive/root"): (
        200,
        {"id": "root-id", "name": "root", "folder": {"childCount": 2}},
    ),
    ("GET", f"{G}/sites/{SITE}/drive/items/root-id/children"): (
        200,
        {
            "value": [
                {"id": "doc-id", "name": "Weekly Census", "folder": {}},
                {"id": "other-id", "name": "Archive", "folder": {}},
            ]
        },
    ),
    ("GET", f"{G}/sites/{SITE}/drive/items/doc-id/children"): (
        200,
        {
            "value": [
                {
                    "id": "item-id",
                    "name": "census.xlsx",
                    "size": 1234,
                    "file": {"mimeType": "application/vnd.ms-excel"},
                },
                {"id": "noise-id", "name": "notes.txt", "file": {}},
            ]
        },
    ),
    (
        "GET",
        f"{G}/sites/{SITE}/drive/items/item-id"
        "?select=lastModifiedDateTime",
    ): (
        200,
        {"lastModifiedDateTime": "2023-04-12T14:30:00Z"},
    ),
    (
        "GET",
        f"{G}/sites/{SITE}/drive/items/item-id/"
        "?select=id,@microsoft.graph.downloadUrl",
    ): (
        200,
        {
            "id": "item-id",
            "@microsoft.graph.downloadUrl": "https://dl.example/abc",
        },
    ),
    ("GET", "https://dl.example/abc"): (200, b"EXCEL-BYTES"),
    ("GET", f"{G}/sites/contoso.sharepoint.com:/sites/hr-site"): (
        200,
        {"id": SITE, "displayName": "HR"},
    ),
}


class FakeTransport:
    """Dict-backed transport recording every call + headers."""

    def __init__(self, fixtures=FIXTURES):
        self.fixtures = dict(fixtures)
        self.calls: list[tuple[str, str]] = []
        self.headers: list[dict] = []
        self.post_data: list[dict] = []

    def __call__(self, method, url, headers, data):
        self.calls.append((method, url))
        self.headers.append(headers)
        if data is not None:
            self.post_data.append(data)
        status, body = self.fixtures[(method, url)]
        if isinstance(body, (dict, list)):
            body = json.dumps(body).encode()
        return status, body


def _client(transport=None, **over):
    return GraphClient(
        tenant_id="tid",
        client_id="cid",
        client_secret="secret",
        site_id=SITE,
        transport=transport or FakeTransport(),
        **over,
    )


def test_token_posts_client_credentials_form():
    tr = FakeTransport()
    c = _client(tr)
    assert c.token() == "tok-1"
    assert tr.calls == [("POST", TOKEN_URL)]
    form = tr.post_data[0]
    assert form["grant_type"] == "client_credentials"
    assert form["client_id"] == "cid"
    assert form["scope"] == "https://graph.microsoft.com/.default"
    assert tr.headers[0]["Content-Type"] == (
        "application/x-www-form-urlencoded"
    )


def test_token_cached_until_expiry_then_refreshed():
    tr = FakeTransport()
    now = [0.0]
    c = _client(tr, clock=lambda: now[0])
    c.token()
    c.token()
    assert tr.calls.count(("POST", TOKEN_URL)) == 1  # cached
    now[0] = 3600.0  # past expires_in - 60s slack
    c.token()
    assert tr.calls.count(("POST", TOKEN_URL)) == 2  # refreshed


def test_token_error_shape_raises():
    tr = FakeTransport()
    tr.fixtures[("POST", TOKEN_URL)] = (
        200,
        {"errorCode": 7000215, "error": "invalid_client"},
    )
    with pytest.raises(GraphError, match="token request failed"):
        _client(tr).token()


def test_item_walk_matches_reference_traversal():
    # root -> "Weekly Census" -> "census.xlsx", same two-hop children
    # walk as reference get_item_id (:55-69)
    tr = FakeTransport()
    c = _client(tr)
    assert c.item_id("Weekly Census", "census.xlsx") == "item-id"
    gets = [u for m, u in tr.calls if m == "GET"]
    assert gets == [
        f"{G}/sites/{SITE}/drive/root",
        f"{G}/sites/{SITE}/drive/items/root-id/children",
        f"{G}/sites/{SITE}/drive/items/doc-id/children",
    ]
    # bearer header on every Graph call
    for h in tr.headers[1:]:
        assert h["Authorization"] == "Bearer tok-1"


def test_missing_file_lists_available_children():
    tr = FakeTransport()
    with pytest.raises(FileNotFoundError, match="notes.txt"):
        _client(tr).item_id("Weekly Census", "nope.xlsx")


def test_last_modified_parses_graph_zulu_timestamp():
    ts = _client().last_modified("item-id")
    assert ts == dt.datetime(
        2023, 4, 12, 14, 30, tzinfo=dt.timezone.utc
    )


def test_download_follows_preauthenticated_url():
    tr = FakeTransport()
    assert _client(tr).download("item-id") == b"EXCEL-BYTES"
    assert ("GET", "https://dl.example/abc") in tr.calls


def test_graph_error_payload_surfaces():
    tr = FakeTransport()
    tr.fixtures[("GET", f"{G}/sites/{SITE}/drive/root")] = (
        404,
        {"error": {"code": "itemNotFound", "message": "gone"}},
    )
    with pytest.raises(GraphError, match="itemNotFound"):
        _client(tr).drive_root_id()


def test_resolve_site_id():
    assert (
        _client().resolve_site_id("contoso.sharepoint.com", "hr-site")
        == SITE
    )


def test_change_gate_probe_skips_download(spark, tmp_path):
    """End-to-end with the T4 gate: first run downloads + commits;
    second run with an unchanged mtime stops at the metadata probe —
    the download URL is never requested."""
    control = str(tmp_path / "control")
    tr = FakeTransport()
    c = _client(tr)
    fetch = c.fetcher("Weekly Census", "census.xlsx")
    probe = c.mtime_probe("Weekly Census", "census.xlsx")

    remote = check_modified(spark, fetch, control, "census", probe=probe)
    assert remote is not None and remote.content == b"EXCEL-BYTES"
    commit_last_modified(spark, control, "census", remote)

    tr.calls.clear()
    assert (
        check_modified(spark, fetch, control, "census", probe=probe)
        is None
    )
    urls = [u for _, u in tr.calls]
    assert "https://dl.example/abc" not in urls  # no payload transfer
    assert not any("downloadUrl" in u for u in urls)


def test_children_pagination_follows_next_link():
    """Graph pages /children at ~200 items; child_id must walk
    @odata.nextLink instead of raising a spurious FileNotFoundError
    for files past the first page (ADVICE r11 — the reference shares
    the single-page flaw, download_from_sharepoint.py:62-67)."""
    tr = FakeTransport()
    page2 = f"{G}/sites/{SITE}/drive/items/doc-id/children?$skiptoken=p2"
    tr.fixtures[("GET", f"{G}/sites/{SITE}/drive/items/doc-id/children")] = (
        200,
        {
            "value": [{"id": f"f{i}", "name": f"file{i}.txt"} for i in range(3)],
            "@odata.nextLink": page2,
        },
    )
    tr.fixtures[("GET", page2)] = (
        200,
        {
            "value": [
                {"id": "deep-id", "name": "census.xlsx", "file": {}},
            ]
        },
    )
    c = _client(tr)
    assert c.child_id("doc-id", "census.xlsx") == "deep-id"
    # the miss path must also exhaust every page before raising, and
    # report children from ALL pages
    with pytest.raises(FileNotFoundError, match="file2.txt"):
        c.child_id("doc-id", "nope.xlsx")


def test_download_omits_bearer_token_on_presigned_url():
    """@microsoft.graph.downloadUrl is pre-authenticated and on a
    different host; the OAuth token must NOT be disclosed to that
    origin (ADVICE r11)."""
    tr = FakeTransport()
    c = _client(tr)
    item = c.item_id("Weekly Census", "census.xlsx")
    assert c.download(item) == b"EXCEL-BYTES"
    dl_headers = [
        h
        for (m, u), h in zip(tr.calls, tr.headers)
        if u == "https://dl.example/abc"
    ]
    assert dl_headers and all("Authorization" not in h for h in dl_headers)
    # ...while every Graph-host GET stays authenticated
    graph_headers = [
        h
        for (m, u), h in zip(tr.calls, tr.headers)
        if u.startswith(G) and m == "GET"
    ]
    assert graph_headers
    assert all(
        h.get("Authorization", "").startswith("Bearer ")
        for h in graph_headers
    )


def test_next_link_loop_detected(monkeypatch):
    """A server replaying the same @odata.nextLink must raise, not
    loop forever (ADVICE r12 — the transport is untrusted network
    input)."""
    tr = FakeTransport()
    first = f"{G}/sites/{SITE}/drive/items/doc-id/children"
    loop = f"{first}?$skiptoken=again"
    tr.fixtures[("GET", first)] = (
        200,
        {"value": [{"id": "x", "name": "a.txt"}], "@odata.nextLink": loop},
    )
    tr.fixtures[("GET", loop)] = (
        200,
        {"value": [{"id": "y", "name": "b.txt"}], "@odata.nextLink": loop},
    )
    c = _client(tr)
    with pytest.raises(GraphError, match="nextLink loop"):
        c.child_id("doc-id", "nope.xlsx")
    # the loop was cut on its first repeat: 1 token POST + 2 GETs
    assert len([u for m, u in tr.calls if m == "GET"]) == 2


def test_next_link_page_cap(monkeypatch):
    """An endless chain of FRESH nextLinks (no repeats) is cut by the
    page cap instead of chasing forever."""

    class EndlessTransport(FakeTransport):
        def __call__(self, method, url, headers, data):
            self.calls.append((method, url))
            if url.endswith("/token"):
                return super().__call__(method, url, headers, data)
            n = len(self.calls)
            return 200, json.dumps(
                {
                    "value": [{"id": f"i{n}", "name": f"f{n}.txt"}],
                    "@odata.nextLink": f"{G}/page/{n}",
                }
            ).encode()

    tr = EndlessTransport()
    c = _client(tr)
    monkeypatch.setattr(type(c), "_MAX_CHILD_PAGES", 5)
    with pytest.raises(GraphError, match="exceeded 5 pages"):
        c.child_id("doc-id", "nope.xlsx")
    # exactly cap-many child pages were fetched (plus the token POST)
    assert len([u for m, u in tr.calls if m == "GET"]) == 5

"""docs/OPERATORS.md drift gate (r11 verdict task 2).

Round 11 shipped ~31 operators that never reached the user-facing
index because it was hand-maintained.  The index's query section is
now generated (tools/gen_operators_md.py); these tests fail the suite
the moment a registry key is added without regenerating.
"""

from __future__ import annotations

import subprocess
import sys

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark import queries as q

DOC = "/root/repo/docs/OPERATORS.md"


def test_every_registry_key_in_operators_md():
    doc = open(DOC).read()
    missing = [
        k
        for k in sorted(set(q.QUERIES) | set(q.AUX_QUERIES))
        if f"`{k}`" not in doc
    ]
    assert not missing, (
        f"registry keys absent from docs/OPERATORS.md: {missing} — "
        "run python tools/gen_operators_md.py"
    )


def test_generated_index_is_current():
    """Byte-exact check: the committed generated section equals what
    the generator produces from the live registries."""
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/gen_operators_md.py", "--check"],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stderr or r.stdout

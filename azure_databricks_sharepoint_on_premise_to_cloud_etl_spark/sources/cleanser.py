"""Byte-level file cleansing (SURVEY.md 2.1 S9).

The reference pre-processes raw census files before Spark ever sees
them: strip bare ``\\n`` not preceded by ``\\r`` (embedded newlines
inside fields, code/ukg_open_census_file_cleanser.py:55-63), drop
quotes and embedded commas, drop the header row, with a utf-8 ->
cp1252 decode fallback (:69-93).  Kept as a pre-Spark byte step
(cleansing must happen before line-splitting can be trusted), but
path-based and side-effect-free so it composes with any object store.
"""

from __future__ import annotations

import re


def decode_bytes(raw: bytes) -> str:
    """utf-8 with cp1252 fallback (code/ukg_open_census_file_cleanser.py:82-84)."""
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("cp1252")


def strip_bare_newlines(text: str) -> str:
    """Replace ``\\n`` not preceded by ``\\r`` with a space — embedded
    newlines inside CSV fields (:55-63)."""
    return re.sub(r"(?<!\r)\n", " ", text)


def cleanse_csv_text(
    text: str, drop_header: bool = True, line_sep: str = "\r\n"
) -> str:
    """Quote/comma cleanse + header drop (:69-93): within quoted
    fields, embedded commas are removed and the quotes dropped, so the
    output is an unquoted, comma-safe CSV."""

    def _clean_line(line: str) -> str:
        out, in_quotes, buf = [], False, []
        for ch in line:
            if ch == '"':
                in_quotes = not in_quotes
            elif ch == "," and in_quotes:
                continue  # comma inside a quoted field: drop
            else:
                buf.append(ch)
        out.append("".join(buf))
        return "".join(out)

    lines = text.split(line_sep)
    if drop_header and lines:
        lines = lines[1:]
    return line_sep.join(_clean_line(ln) for ln in lines if ln != "")


def cleanse_file(in_path: str, out_path: str, drop_header: bool = True) -> None:
    """End-to-end: read bytes -> decode -> strip bare newlines ->
    quote/comma cleanse -> write utf-8.  The reference's ADLS
    download/upload becomes plain paths (mounts/fuse at deploy time)."""
    with open(in_path, "rb") as f:
        raw = f.read()
    text = cleanse_csv_text(strip_bare_newlines(decode_bytes(raw)), drop_header)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(text)


def pseudonymize(
    df,
    cols: list[str],
    salt: int = 0,
    prefix: str = "P",
):
    """Keyed pseudonymization: replace each listed column's value with
    ``prefix + portable-60-bit-hash(salt, value)`` — stable (the same
    value maps to the same pseudonym everywhere, so joins and
    group-bys still line up across tables sharing the salt),
    non-reversible without the salt, NULL-preserving.  The
    tokenization step a dataset goes through before leaving its
    trust boundary; rotate ``salt`` per data-sharing agreement.

    Scale shape: pure per-row hash expressions — codegen scan, no
    shuffle, no UDF.
    """
    from pyspark.sql import functions as F

    from ..functions import portable_hash64

    out = df
    for c in cols:
        out = out.withColumn(
            c,
            F.when(
                F.col(c).isNotNull(),
                F.concat(
                    F.lit(prefix),
                    portable_hash64(
                        F.col(c).cast("string"), seed=salt
                    ).cast("string"),
                ),
            ),
        )
    return out

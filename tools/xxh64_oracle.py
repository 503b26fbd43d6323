"""Pure-python XXH64 matching Spark's ``F.xxhash64`` on STRING input.

Spark's ``xxhash64(col)`` hashes a string column's UTF-8 bytes with the
standard XXH64 algorithm (Cyan4973 reference spec, public domain),
seed 42, and returns the result as a SIGNED 64-bit long.  DuckDB ships
no xxhash64, which is why ``minhash_lsh_pairs_fast`` was a rows-only
AUX record through round 5.  Registering :func:`spark_xxhash64` as a
DuckDB scalar UDF closes that gap: the fast path's oracle SQL is the
portable oracle with the hash swapped, and the comparison becomes a
full value-hash check.

Only the string path is implemented — that is the only shape the fast
path hashes (one shingle string per call).  Not a performance path:
the oracle runs at sf0.01 where a few hundred thousand pure-python
hashes cost ~1 s.
"""

from __future__ import annotations

_M = 0xFFFFFFFFFFFFFFFF
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned XXH64 of ``data`` (reference algorithm)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        acc = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        acc = _merge(acc, v1)
        acc = _merge(acc, v2)
        acc = _merge(acc, v3)
        acc = _merge(acc, v4)
    else:
        acc = (seed + _P5) & _M
    acc = (acc + n) & _M
    while i + 8 <= n:
        acc ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        acc = (_rotl(acc, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        acc ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        acc = (_rotl(acc, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        acc ^= (data[i] * _P5) & _M
        acc = (_rotl(acc, 11) * _P1) & _M
        i += 1
    acc ^= acc >> 33
    acc = (acc * _P2) & _M
    acc ^= acc >> 29
    acc = (acc * _P3) & _M
    acc ^= acc >> 32
    return acc


def spark_xxhash64(s: str) -> int:
    """Signed 64-bit ``F.xxhash64(string_col)`` twin (seed 42)."""
    if s is None:
        return None
    u = xxh64(s.encode("utf-8"), 42)
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64_seeded(s: str, salt: int) -> int:
    """Signed twin of ``F.xxhash64(string_col, F.lit(salt))`` — the
    fast sample gate's shape (``functions.fast_hash64``).

    Spark folds multiple children iteratively: the running hash seeds
    the next child's hash (string first, then the salt).  A string
    child hashes its UTF-8 bytes; the salt literal hashes its
    little-endian bytes — 4 of them, because ``F.lit(int)`` types as
    IntegerType and Spark's ``hashInt`` is the XXH64 4-byte path
    (verified equal to Spark output for both int and long literals).
    So: ``hashInt(salt, seed=hashString(s, 42))``."""
    if s is None or salt is None:
        return None
    import struct

    h1 = xxh64(s.encode("utf-8"), 42)
    pack = "<i" if -(1 << 31) <= salt < (1 << 31) else "<q"
    u = xxh64(struct.pack(pack, salt), h1)
    return u - (1 << 64) if u >= (1 << 63) else u


def register(con) -> None:
    """Register the xxhash64 twins on a DuckDB connection (idempotent)."""
    for name, fn, argtypes in (
        ("spark_xxhash64", spark_xxhash64, ["VARCHAR"]),
        ("spark_xxhash64_seeded", spark_xxhash64_seeded, ["VARCHAR", "BIGINT"]),
    ):
        try:
            con.create_function(name, fn, argtypes, "BIGINT")
        except Exception:
            pass  # already registered on this connection

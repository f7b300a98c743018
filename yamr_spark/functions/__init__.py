"""Scalar building blocks (SURVEY.md §2.3, F1–F9).

Every function here is a Column→Column expression built from
``pyspark.sql.functions`` so it stays inside whole-stage codegen — no
Python UDFs in this module. Reference call sites cited per function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Unicode-aware word-break pattern. The reference tokenizes with Python's
# re ``\w+`` (unicode-aware: matches Cyrillic in the `onegin` corpus) —
# /root/reference/map_libs/word_count.py:16. Java's default ``\w`` is
# ASCII-only, so we spell the unicode class out; RE2 (DuckDB oracle) accepts
# the same pattern, keeping Spark and oracle tokenization identical.
WORD_BREAK_RE = r"[^\p{L}\p{N}_]+"

# The same pattern for use INSIDE a Spark SQL string literal (F.expr):
# Spark SQL's string parser consumes one level of backslash escapes.
WORD_BREAK_SQL = WORD_BREAK_RE.replace("\\", "\\\\")


def tokenize(col: Column | str) -> Column:
    """F1+F3: lowercase then split into ``\\w+``-style word tokens.

    Returns an array<string> that may contain empty strings at the edges
    (filter with ``F.length > 0`` downstream, mirroring the reference's
    empty-token guard at word_count.py:19).
    """
    return F.split(F.lower(F.col(col) if isinstance(col, str) else col), WORD_BREAK_RE)


def strip_punct(col: Column | str) -> Column:
    """F2: ``word.strip(',.')`` (word_count.py:17) — trim leading/trailing
    ',' and '.' characters. A no-op after ``tokenize`` (kept for fidelity
    with the reference's mapper, which strips before lowercasing)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.regexp_replace(c, r"^[.,]+", ""), r"[.,]+$", "")


def non_empty(col: Column | str) -> Column:
    """F4: predicate guarding emit — ``len(word) > 0`` (word_count.py:19)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) > 0


def year_of_yyyymm(col: Column | str) -> Column:
    """F7: yyyymm → yyyy, reference does ``int(str(t[0])[:4])``
    (max_year_temp.py:21). Integer division keeps it arithmetic (no string
    round-trip) and codegen-friendly."""
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("long") / 100).cast("long")


def key_hash(col: Column | str) -> Column:
    """F8 analogue: deterministic content hash of the key for partitioning.

    The reference hashes ``int(hexlify(str(key).encode()), 16)``
    (hash_partitioner.py:5-9) — an arbitrary-precision content hash. Tests
    assert only partition-count invariants, not exact hash values
    (tests/test_partition.py), so we use the JVM-side xxhash64."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c.cast("string"))


def hash60(col: Column | str) -> Column:
    """Oracle-reproducible 60-bit content hash: the first 15 hex chars of
    md5 as a non-negative BIGINT.

    DuckDB computes the identical value with
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``, so plans can shuffle
    8-byte hashed keys instead of raw text while the oracle replays the
    hash exactly. 60 bits (not 64) keeps the value positive in a signed
    long in both engines; collision probability for k distinct keys is
    ~k²/2⁶¹ (≈10⁻⁷ even at 10⁷ distinct shingles per comparison scope).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast("long")


# The same 60-bit hash as a SQL fragment for use inside higher-order
# functions (transform lambdas), where Column expressions can't reach.
def hash60_sql(x: str) -> str:
    return f"cast(conv(substring(md5(cast({x} as binary)), 1, 15), 16, 10) as bigint)"


def kv_to_json(key: Column | str, value: Column | str) -> Column:
    """F9: serialize a (key, value) pair as a JSON array string, matching
    the reference's shuffle/result file format ``[key, value]``
    (mapper.py:152-155, reducer.py:146)."""
    k = F.col(key) if isinstance(key, str) else key
    v = F.col(value) if isinstance(value, str) else value
    return F.to_json(F.array(k.cast("string"), v.cast("string")))

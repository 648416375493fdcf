"""Text expression helpers: tokenizer (UDTF analog) + portable hashing.

U1 in the reference is an IK Chinese tokenizer UDTF applied via LATERAL
TABLE (KeywordUDTF.java:14-21, KeywordUtil.java:16-41). The synthetic corpus
is whitespace-delimited ASCII, so the Spark-first equivalent is a pure
Catalyst expression: lowercase → split on non-word runs → filter empties →
explode. No Python UDF: the tokenizer stays inside whole-stage codegen.

``poly_hash_sql`` is a *portable* polynomial string hash expressible in both
Spark SQL and DuckDB SQL (same SQL text modulo lambda syntax), used by the
MinHash/fingerprint dedup operators so the oracle can recompute identical
hashes. xxhash64/md5-to-int would differ or need non-portable casts.
Bounds: h < P < 2^55, so h*31 + c < 2^60 — no int64 overflow in either
engine (DuckDB checks overflow; Spark would silently wrap).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Prime below 2^55 keeps the recurrence overflow-free in signed 64-bit.
POLY_P = 36028797018963913


def tokenize(col: Column | str) -> Column:
    """string → array<string> of lowercase word tokens (empties removed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: F.length(t) > 0
    )


def poly_hash(col: Column | str) -> Column:
    """Polynomial rolling hash of a string, in [0, POLY_P)."""
    c = F.col(col) if isinstance(col, str) else col
    codes = F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("bigint"))
    return F.aggregate(
        codes,
        F.lit(7).cast("bigint"),
        lambda h, code: (h * F.lit(31) + code) % F.lit(POLY_P),
    )


def poly_hash_sql(expr: str) -> str:
    """DuckDB twin of :func:`poly_hash` over string expression *expr*.

    Verified equal to the Spark expression (e.g. both hash 'abc' → 304891).
    """
    return (
        "list_reduce(list_prepend(CAST(7 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(h, c) -> (h * 31 + c) % {POLY_P})"
    )


def tokenize_sql(expr: str) -> str:
    """DuckDB twin of :func:`tokenize`."""
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), '{TOKEN_SPLIT_RE}'), "
        "t -> length(t) > 0)"
    )


# CJK-aware token pattern (U1 parity for non-ASCII corpora). The
# reference's IK tokenizer (KeywordUtil.java:16-41) does dictionary
# segmentation of Chinese; a dictionary is not reproducible as a
# portable expression, so the deterministic codepoint-class twin is:
# every Han character is its own token (the IK "ik_max_word" degenerate
# case), ASCII word runs split as in :func:`tokenize`. Two spellings of
# the same script class: Java regex (Spark) calls it \p{IsHan}, RE2
# (DuckDB) calls it \p{Han}.
CJK_TOKEN_RE_JAVA = r"\p{IsHan}|[a-z0-9]+"
CJK_TOKEN_RE_RE2 = r"\p{Han}|[a-z0-9]+"


def tokenize_cjk(col: Column | str) -> Column:
    """string → array<string>: Han chars as single tokens + lowercase
    ASCII word runs, in document order. Pure Catalyst (regexp_extract_all
    stays in whole-stage codegen); group idx 0 is explicit because Spark
    defaults to capture group 1."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(
        F.lower(c), F.lit(CJK_TOKEN_RE_JAVA), F.lit(0)
    )


def tokenize_cjk_sql(expr: str) -> str:
    """DuckDB twin of :func:`tokenize_cjk`."""
    return f"regexp_extract_all(lower({expr}), '{CJK_TOKEN_RE_RE2}', 0)"


def md5_hash(col: Column | str, bits: int = 32) -> Column:
    """Portable FAST string hash: integer from the first ``bits//4`` hex
    chars of md5. Native (whole-stage codegen) md5+conv on Spark, native
    md5+hex-cast in DuckDB — identical values at ~100× less cost than the
    interpreted per-character :func:`poly_hash` fold. ``bits`` ≤ 60 keeps
    the value inside int64 for both engines."""
    assert bits % 4 == 0 and bits <= 60
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, bits // 4), 16, 10).cast("bigint")


def md5_hash_sql(expr: str, bits: int = 32) -> str:
    """DuckDB twin of :func:`md5_hash`."""
    assert bits % 4 == 0 and bits <= 60
    return f"CAST(concat('0x', substr(md5({expr}), 1, {bits // 4})) AS BIGINT)"

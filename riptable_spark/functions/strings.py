"""FAString surface (SURVEY §2.8 strings).

Reference: /root/reference/riptable/rt_str.py:122 (FAString accessor, numba
byte-matrix kernels). Here every op is a built-in Column function —
JVM-side, codegen-friendly. ``apply_unique`` (rt_str.py:93-113), which runs
the kernel on Categorical uniques only, is unnecessary on Spark: Catalyst
evaluates per-row inside codegen and dictionary-encoded parquet pages
already amortize storage.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

upper = F.upper  # rt_str.py:519
lower = F.lower  # rt_str.py:534
strlen = F.length  # rt_str.py:609
reverse = F.reverse  # rt_str.py:564


def contains(col: Column, sub: str) -> Column:  # rt_str.py:674 strstr
    return col.contains(sub)


def startswith(col: Column, prefix: str) -> Column:  # rt_str.py:811
    return col.startswith(prefix)


def endswith(col: Column, suffix: str) -> Column:  # rt_str.py:859
    return col.endswith(suffix)


def index(col: Column, sub: str) -> Column:
    """rt_str.py:647 — 0-based index of first occurrence, -1 if absent
    (riptable returns sentinel; we use -1 pre-null-bridge)."""
    return F.instr(col, sub) - F.lit(1)


def replace(col: Column, old: str, new: str) -> Column:  # rt_str.py:773 literal
    return F.replace(col, F.lit(old), F.lit(new))


def regex_match(col: Column, pattern: str) -> Column:  # rt_str.py:907
    return col.rlike(pattern)


def regex_replace(col: Column, pattern: str, repl: str) -> Column:  # rt_str.py:963
    return F.regexp_replace(col, pattern, repl)


def extract(col: Column, pattern: str, group: int = 1) -> Column:  # rt_str.py:1030
    return F.regexp_extract(col, pattern, group)


def substr(col: Column, start: int, length: int | None = None) -> Column:
    """rt_str.py:1229 — 0-based start (riptable convention) → 1-based SQL."""
    if length is None:
        return F.substring(col, start + 1, 2**30)
    return F.substring(col, start + 1, length)


def char(col: Column, position: int) -> Column:  # rt_str.py:1278
    return F.substring(col, position + 1, 1)


def removetrailing(col: Column, remove: int = 32) -> Column:  # rt_str.py:591
    """FAString.removetrailing: strip the trailing character ``remove``
    (an ASCII code, default 32 = space — the matlab-fixup semantics)."""
    return F.rtrim(col) if remove == 32 else F.regexp_replace(
        col, re.escape(chr(remove)) + "+$", ""
    )


def str_append(col: Column, other) -> Column:  # rt_fastarray.py:2266
    return F.concat(col, other if isinstance(other, Column) else F.lit(other))


def index_any_of(col: Column, chars: str) -> Column:
    """rt_str.py:621 index_any_of (strpbrk): first 0-based index of ANY
    character of ``chars`` in the string, -1 if none. Array expression:
    per-char instr positions, drop the misses, take the min — pure
    codegen, no UDF. Empty ``chars`` → 0 (reference returns zeros)."""
    if chars == "":
        return F.lit(0)
    positions = F.array(*[F.instr(col, c) for c in chars])
    found = F.filter(positions, lambda p: p > 0)
    return F.when(F.size(found) > 0, F.array_min(found) - 1).otherwise(F.lit(-1))


def strpbrk(col: Column, chars: str) -> Column:
    """Deprecated alias kept for parity (rt_str.py:642)."""
    return index_any_of(col, chars)


def apply_unique(df, colname: str, expr_fn, out_col: str):
    """rt_str.py:93-113 _handle_apply_unique: evaluate an expensive
    string expression over the DISTINCT values only, then broadcast-join
    the results back — the uniques-only execution trick. Worth it
    exactly when cardinality(col) ≪ rows (the Categorical regime); the
    distinct is one shuffle of the short strings, the join back is
    broadcast."""
    uniq = df.select(colname).distinct().withColumn(out_col, expr_fn(F.col(colname)))
    return df.join(F.broadcast(uniq), on=colname, how="left")


def str_to_bytes(col: Column) -> Column:
    """Encode a string column to UTF-8 bytes (rt_utils.py:737-760
    str_to_bytes; the reference's bytes arrays are the memory-lean form —
    on Spark a BinaryType column)."""
    return F.encode(col, "UTF-8")


def bytes_to_str(col: Column) -> Column:
    """Decode a binary column as UTF-8 (rt_utils.py bytes_to_str; riptable
    stores ASCII bytes arrays, Spark strings are UTF-8 natively so this is
    only needed on true binary columns)."""
    return F.decode(col, "UTF-8")


def to_str(col: Column) -> Column:
    """Stringify any column with sentinel-aware formatting
    (rt_utils.py to_str): NULL renders as the string invalid ''. """
    return F.coalesce(col.cast("string"), F.lit(""))


def str_replace(col: Column, old: list[str], new: list[str], missing: str = "") -> Column:
    """rt_utils.py:1055 str_replace: dictionary remap of string values
    (old[i] → new[i]); values not in ``old`` become ``missing``. A
    literal-map lookup — pure codegen, no join."""
    if len(old) != len(new):
        raise ValueError("old and new must have the same length")
    m = F.map_from_arrays(
        F.array(*[F.lit(o) for o in old]), F.array(*[F.lit(n) for n in new])
    )
    return F.coalesce(F.element_at(m, col), F.lit(missing))


# ------------------------------------------------------- JSON extraction
def json_str(col: Column, field: str) -> Column:
    """Extract a top-level JSON field as a string (semi-structured event
    props — the `$.field` path).  Catalyst's get_json_object is a
    codegen'd Jackson parse; NULL for missing fields or invalid JSON."""
    return F.get_json_object(col, f"$.{field}")


def json_long(col: Column, field: str) -> Column:
    """Extract a top-level JSON field as BIGINT (NULL on non-numeric)."""
    return F.get_json_object(col, f"$.{field}").cast("long")


def json_double(col: Column, field: str) -> Column:
    return F.get_json_object(col, f"$.{field}").cast("double")


def json_has(col: Column, field: str) -> Column:
    """True when the field exists (even with a null value the path
    resolves; missing paths return NULL)."""
    return F.get_json_object(col, f"$.{field}").isNotNull()


def soundex_simple(col: Column) -> Column:
    """Engine-portable Soundex (the phonetic blocking key): keep the
    first letter, map the rest to the classic digit classes, collapse
    adjacent runs, drop vowels' zeros, pad to 3 digits.

    This is the textbook algorithm minus the H/W-separation subtlety,
    built ONLY from translate / global regexp_replace / substr / rpad —
    primitives DuckDB reproduces exactly (its regexp_replace needs the
    'g' flag; Spark's is global by default), so a SQL oracle matches
    byte-for-byte.  Agrees with Spark's builtin ``F.soundex`` on names
    without the H/W edge case (unit-tested).  reference
    rt_str.py-style FAString member in spirit; blocking-key use mirrors
    snm_pairs.
    """
    u = F.upper(F.regexp_replace(col, "[^A-Za-z]", ""))
    d = F.translate(u, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202")
    for c in "0123456":
        d = F.regexp_replace(d, c + "+", c)
    tail = F.replace(d.substr(F.lit(2), F.lit(999)), F.lit("0"), F.lit(""))
    return F.concat(u.substr(F.lit(1), F.lit(1)), F.rpad(tail.substr(F.lit(1), F.lit(3)), 3, "0"))

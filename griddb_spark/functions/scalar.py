"""GridDB string/numeric scalar shims (reference ``sql_expression_string.h:
45-176``, ``sql_expression_numeric.h:45-86``, TQL ``function_map.cpp:52-105``).

Direct built-ins need no shim: ABS, ROUND, TRUNC(→``F.expr("trunc")``/
``F.round``), SQRT, LOG, RANDOM(→``F.rand``), COALESCE, IFNULL, LENGTH,
LIKE, LOWER/UPPER, LTRIM/RTRIM/TRIM, NULLIF, REPLACE, SUBSTR, CONCAT(||),
CHAR_LENGTH, CEILING, FLOOR, ARRAY_LENGTH(→``F.size``),
ELEMENT(→``F.element_at``), MAX/MIN scalar (→``F.greatest/least``).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def glob_to_regex(pattern: str) -> str:
    """Translate a GLOB pattern (SQLite semantics: ``*``, ``?``, ``[...]``,
    case-sensitive) to an anchored Java regex."""
    out, i = [], 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        elif ch == "[":
            j = pattern.find("]", i + 1)
            if j == -1:
                out.append(re.escape(ch))
            else:
                body = pattern[i + 1 : j]
                if body.startswith("^"):
                    body = "^" + re.sub(r"([\\\]])", r"\\\1", body[1:])
                else:
                    body = re.sub(r"([\\\]])", r"\\\1", body)
                out.append("[" + body + "]")
                i = j
        else:
            out.append(re.escape(ch))
        i += 1
    return "^" + "".join(out) + "$"


def glob(col: Column | str, pattern: str) -> Column:
    """GLOB(pattern, x) — case-sensitive shell-style match (EXPR_GLOB)."""
    return _c(col).rlike(glob_to_regex(pattern))


def instr(col: Column | str, sub: Column | str) -> Column:
    """INSTR(x, y) — 1-based position of y in x, 0 if absent."""
    sub_col = F.lit(sub) if isinstance(sub, str) else sub
    return F.instr(_c(col), sub_col)


def char_(*codes: Column | int) -> Column:
    """CHAR(c1, c2, ...) — string from unicode code points."""
    cols = [F.chr(F.lit(c) if isinstance(c, int) else c) for c in codes]
    return F.concat(*cols) if len(cols) > 1 else cols[0]


def unicode_(col: Column | str) -> Column:
    """UNICODE(x) — code point of the first character."""
    return F.ascii(_c(col))


def hex_(col: Column | str) -> Column:
    """HEX(x) — uppercase hex of the blob/string bytes (SQLite semantics)."""
    return F.upper(F.hex(_c(col)))


def hex_to_dec(col: Column | str) -> Column:
    """HEX_TO_DEC(x) — parse hex string to integer (sql_expression_numeric.h)."""
    return F.conv(_c(col), 16, 10).cast("long")


def printf(fmt: str, *cols: Column | str) -> Column:
    """PRINTF(fmt, ...) — C-style formatting (maps to format_string)."""
    return F.format_string(fmt, *[_c(c) for c in cols])


def quote(col: Column | str) -> Column:
    """QUOTE(x) — SQL literal form: strings quoted with '' doubled,
    NULL → 'NULL', numbers as-is (SQLite semantics)."""
    c = _c(col)
    quoted = F.concat(F.lit("'"), F.replace(c.cast("string"), F.lit("'"), F.lit("''")), F.lit("'"))
    return F.when(c.isNull(), F.lit("NULL")).otherwise(quoted)


def typeof(col: Column | str) -> Column:
    """TYPEOF(x) — engine type name of the value's column."""
    return F.typeof(_c(col))


def zeroblob(n: int) -> Column:
    """ZEROBLOB(n) — n zero bytes."""
    return F.expr(f"CAST(repeat(CHAR(0), {int(n)}) AS BINARY)")


def randomblob(n: int) -> Column:
    """RANDOMBLOB(n) — n pseudo-random bytes (non-deterministic)."""
    import pyspark.sql.functions as f

    hexpairs = f.concat_ws(
        "",
        *[f.lpad(f.hex((f.rand() * 256).cast("int")), 2, "0") for _ in range(int(n))],
    )
    return f.unhex(hexpairs)


def translate_(col: Column | str, matching: str, replace: str) -> Column:
    """TRANSLATE(x, from, to)."""
    return F.translate(_c(col), matching, replace)

"""GridDB time function shims (reference ``sql_expression_time.h:47-196``,
TQL ``function_timestamp.h``).

Unit vocabulary (``sql_lexer_keyword.h``): YEAR MONTH DAY HOUR MINUTE SECOND
MILLISECOND MICROSECOND NANOSECOND DAY_OF_WEEK DAY_OF_YEAR. Spark timestamps
are µs-precision; GridDB's NANO_TIMESTAMP (5.3+) is carried as epoch-nanos
LongType columns with the ``*_ns`` helpers here (SURVEY §1.2 risk item 4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: GridDB unit keyword → Spark timestampadd/timestampdiff unit.
TIMESTAMP_UNITS = {
    "YEAR": "YEAR",
    "MONTH": "MONTH",
    "DAY": "DAY",
    "HOUR": "HOUR",
    "MINUTE": "MINUTE",
    "SECOND": "SECOND",
    "MILLISECOND": "MILLISECOND",
    "MICROSECOND": "MICROSECOND",
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def now() -> Column:
    """NOW() — statement-time current timestamp."""
    return F.current_timestamp()


def to_epoch_ms(col: Column | str) -> Column:
    """TO_EPOCH_MS(ts) — epoch milliseconds as LONG."""
    return F.unix_millis(_c(col))


def to_timestamp_ms(col: Column | str) -> Column:
    """TO_TIMESTAMP_MS(ms) — epoch milliseconds → TIMESTAMP."""
    return F.timestamp_millis(_c(col).cast("long"))


def make_timestamp_ms(ms: Column | str) -> Column:
    """MAKE_TIMESTAMP_MS(ms)."""
    return F.timestamp_millis(_c(ms).cast("long"))


def make_timestamp_us(us: Column | str) -> Column:
    """MAKE_TIMESTAMP_US(us) — µs precision (MICRO_TIMESTAMP, 5.3+)."""
    return F.timestamp_micros(_c(us).cast("long"))


def make_timestamp(year, month, day, hour=0, minute=0, sec=0.0) -> Column:
    """MAKE_TIMESTAMP(y, m, d[, h, min, sec]) — UTC."""
    args = [F.lit(a) if not isinstance(a, Column) else a
            for a in (year, month, day, hour, minute, sec)]
    return F.make_timestamp(*args, F.lit("UTC"))


def make_timestamp_by_date(year, month, day) -> Column:
    """MAKE_TIMESTAMP_BY_DATE(y, m, d) — midnight UTC (5.5+ constructor
    family, ``sql_expression_time.h:47-196``)."""
    return make_timestamp(year, month, day)


def timestamp_ms(col: Column | str) -> Column:
    """TIMESTAMP_MS('...') — parse a ms-precision timestamp string."""
    return F.to_timestamp(F.regexp_replace(_c(col), "T|Z", " "))


def timestamp_us(col: Column | str) -> Column:
    """TIMESTAMP_US('...') — parse a µs-precision timestamp string
    (MICRO_TIMESTAMP, 5.3+)."""
    return F.to_timestamp(F.regexp_replace(_c(col), "T|Z", " "))


def timestamp_ns(col: Column | str) -> Column:
    """TIMESTAMP_NS('...') — parse to epoch-nanos LONG (NANO_TIMESTAMP
    carrier; Spark timestamps cap at µs, so the ns digit survives only in
    the long representation). Fractional digits are right-padded to 9."""
    c = _c(col)
    whole = F.to_timestamp(
        F.regexp_replace(F.regexp_replace(c, r"\.\d+", ""), "T|Z", " ")
    )
    frac = F.rpad(F.coalesce(F.regexp_extract(c, r"\.(\d+)", 1), F.lit("")), 9, "0")
    return (
        F.unix_timestamp(whole).cast("long") * F.lit(1_000_000_000)
        + frac.cast("long")
    )


def timestamp_ns_to_ts(col: Column | str) -> Column:
    """Epoch-nanos LONG → TIMESTAMP (truncating to µs, like parquet ns reads).
    Integer division: double math is lossy at epoch-ns magnitude (>2^53)."""
    c = _c(col)
    micros = F.floor(c.cast("decimal(38,0)") / F.lit(1000)).cast("long")
    return F.timestamp_micros(micros)


def ts_to_timestamp_ns(col: Column | str) -> Column:
    """TIMESTAMP → epoch-nanos LONG (NANO_TIMESTAMP carrier)."""
    return (F.unix_micros(_c(col)) * 1000).cast("long")


def timestamp_trunc(unit: str, col: Column | str, tz: str | None = None) -> Column:
    """TIMESTAMP_TRUNC(unit, ts[, timezone]) — truncate to unit boundary.

    ``tz`` is GridDB's optional timezone argument (5.x time functions):
    the boundary is computed in that zone, result stays an instant."""
    u = unit.upper()
    if u not in TIMESTAMP_UNITS and u not in ("MILLISECOND", "MICROSECOND"):
        raise ValueError(f"unsupported TIMESTAMP_TRUNC unit {unit!r}")
    c = _c(col)
    if tz:
        local = F.from_utc_timestamp(c, tz)
        return F.to_utc_timestamp(F.date_trunc(u.lower(), local), tz)
    return F.date_trunc(u.lower(), c)


def timestamp_add(unit: str, col: Column | str, amount) -> Column:
    """TIMESTAMP_ADD(unit, ts, n) / TIMESTAMPADD alias."""
    u = TIMESTAMP_UNITS.get(unit.upper())
    if u is None:
        raise ValueError(f"unsupported TIMESTAMP_ADD unit {unit!r}")
    amt = amount if isinstance(amount, Column) else F.lit(amount)
    return F.timestamp_add(u, amt, _c(col))


def timestamp_diff(unit: str, start: Column | str, end: Column | str) -> Column:
    """TIMESTAMP_DIFF(unit, ts1, ts2) / TIMESTAMPDIFF alias."""
    u = TIMESTAMP_UNITS.get(unit.upper())
    if u is None:
        raise ValueError(f"unsupported TIMESTAMP_DIFF unit {unit!r}")
    return F.timestamp_diff(u, _c(start), _c(end))


def extract_unit(unit: str, col: Column | str, tz: str | None = None) -> Column:
    """EXTRACT(unit, ts[, timezone]) — field extraction incl. GridDB's
    DAY_OF_WEEK (0=Sunday) and DAY_OF_YEAR; fields read in ``tz`` when
    given (GridDB's optional timezone argument)."""
    u = unit.upper()
    c = _c(col)
    if tz:
        c = F.from_utc_timestamp(c, tz)
    if u == "DAY_OF_WEEK":
        return F.dayofweek(c) - 1  # Spark: 1=Sunday → GridDB: 0=Sunday
    if u == "DAY_OF_YEAR":
        return F.dayofyear(c)
    if u == "MILLISECOND":
        return (F.unix_millis(c) % 1000).cast("int")
    if u == "MICROSECOND":
        return (F.unix_micros(c) % 1_000_000).cast("int")
    if u in ("YEAR", "MONTH", "DAY", "HOUR", "MINUTE", "SECOND"):
        return F.extract(F.lit(u), c).cast("int")
    raise ValueError(f"unsupported EXTRACT unit {unit!r}")


#: STRFTIME %-codes → java.time pattern (SQLite-flavored subset).
_STRFTIME_MAP = {
    "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm",
    "%S": "ss", "%f": "ss.SSS", "%j": "DDD", "%%": "%",
}


def strftime(fmt: str, col: Column | str, tz: str | None = None) -> Column:
    """STRFTIME(fmt, ts[, timezone]) — %-code formatting
    (sql_expression_time.h); rendered in ``tz`` when given."""
    out, i = [], 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            code = fmt[i : i + 2]
            if code == "%w":
                # day of week 0-6, no java pattern → splice via concat
                out.append("\u0001w\u0001")
                i += 2
                continue
            mapped = _STRFTIME_MAP.get(code)
            if mapped is None:
                raise ValueError(f"unsupported STRFTIME code {code!r}")
            out.append(mapped)
            i += 2
        else:
            ch = fmt[i]
            out.append("'" + ch + "'" if ch.isalpha() else ch)
            i += 1
    pattern = "".join(out)
    c = _c(col)
    if tz:
        c = F.from_utc_timestamp(c, tz)
    if "\u0001w\u0001" in pattern:
        parts = pattern.split("\u0001w\u0001")
        cols: list[Column] = []
        for k, p in enumerate(parts):
            if p:
                cols.append(F.date_format(c, p))
            if k < len(parts) - 1:
                cols.append((F.dayofweek(c) - 1).cast("string"))
        return F.concat(*cols)
    return F.date_format(c, pattern)

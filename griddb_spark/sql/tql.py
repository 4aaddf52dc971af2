"""TQL — GridDB's per-container query language, executed on DataFrames.

Reference grammar (lemon parser ``tql.cpp:25``, tokens ``tql_token.h:23-82``):

    SELECT <selection> [WHERE <expr>] [ORDER BY col [ASC|DESC], ...]
    [LIMIT n [OFFSET m]]

No FROM (container-bound), no GROUP BY, no joins. ``<selection>`` is ``*``,
a projection list, one TQL aggregation (COUNT/SUM/AVG/MAX/MIN/STDDEV/
VARIANCE/TIME_AVG — registry ``aggregation_func.h:918-929``) or one
time-series selection (TIME_NEXT/_ONLY, TIME_PREV/_ONLY, TIME_INTERPOLATED,
TIME_SAMPLING, MAX_ROWS, MIN_ROWS — registry ``selection_func.h:312-320``).

Strategy: TQL expression syntax is close enough to Spark SQL that WHERE /
projection lists translate token-wise (TIMESTAMP('…') literals, XOR,
GridDB function names) and evaluate via ``F.expr`` — Catalyst then performs
the pushdown that GridDB's per-OR-term index selection
(``query_collection.cpp:270-421``) would do. Selections dispatch to the
batch operators in ``griddb_spark.operators.timeseries``.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from griddb_spark.operators import timeseries as ts_ops

if TYPE_CHECKING:
    from griddb_spark.container import Collection

_AGGS = {
    "COUNT": F.count,
    "SUM": F.sum,
    "AVG": F.avg,
    "MAX": F.max,
    "MIN": F.min,
    "STDDEV": F.stddev_samp,
    "STDDEV_SAMP": F.stddev_samp,
    "STDDEV_POP": F.stddev_pop,
    "VARIANCE": F.var_samp,
    "VARIANCE_SAMP": F.var_samp,
    "VARIANCE_POP": F.var_pop,
}

_SELECTIONS = (
    "TIME_NEXT", "TIME_NEXT_ONLY", "TIME_PREV", "TIME_PREV_ONLY",
    "TIME_INTERPOLATED", "TIME_SAMPLING", "MAX_ROWS", "MIN_ROWS",
)

#: GridDB/TQL function name → Spark SQL name (function_map.cpp:52-105).
_FN_MAP = {
    "CHAR_LENGTH": "char_length",
    "STRING": "string",  # STRING(x) = cast to string; spark `string(x)` works
    "ARRAY_LENGTH": "size",
    "CEILING": "ceiling",
    "TO_EPOCH_MS": "unix_millis",
    "TO_TIMESTAMP_MS": "timestamp_millis",
    "FROM_TIMESTAMP": "date_format",
    "TIMESTAMPADD": "timestampadd",
    "TIMESTAMPDIFF": "timestampdiff",
    "TIMESTAMP_ADD": "timestampadd",
    "TIMESTAMP_DIFF": "timestampdiff",
}


def _envelope_sql(col: str) -> "dict[str, str]":
    """SQL snippets for the WKT envelope of a geometry column — the same
    regex/split/higher-order pipeline as ``functions.gis.st_mbr``, emitted
    as Spark-SQL text so TQL WHERE clauses stay pure ``F.expr``."""
    pairs = (
        f"filter(split(trim(regexp_replace(upper({col}), '[A-Z()]+', '')), "
        f"'\\\\s*,\\\\s*'), p -> p != '')"
    )
    xs = f"transform({pairs}, p -> cast(split(trim(p), '\\\\s+')[0] as double))"
    ys = f"transform({pairs}, p -> cast(split(trim(p), '\\\\s+')[1] as double))"
    return {
        "xmin": f"array_min({xs})", "xmax": f"array_max({xs})",
        "ymin": f"array_min({ys})", "ymax": f"array_max({ys})",
    }


def _wkt_envelope_literal(wkt: str) -> "tuple[float, float, float, float]":
    """Envelope of a literal WKT string, computed at rewrite time."""
    nums = [float(v) for v in re.findall(r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?", wkt)]
    xs, ys = nums[0::2], nums[1::2]
    return min(xs), min(ys), max(xs), max(ys)


_MBR_RE = re.compile(
    r"ST_MBRINTERSECTS\s*\(\s*(?P<col>\w+)\s*,\s*"
    r"(?:ST_MAKERECT\s*\(\s*(?P<rect>[^)]*)\)"
    r"|ST_GEOMFROMTEXT\s*\(\s*'(?P<wkt>[^']*)'\s*\))\s*\)",
    re.IGNORECASE,
)


def _rewrite_geometry(expr: str) -> str:
    """TQL geometry predicates → envelope-overlap column math.

    ``ST_MBRINTERSECTS(geom, ST_MAKERECT(x1,y1,x2,y2) |
    ST_GEOMFROMTEXT('wkt'))`` is exactly what GridDB's R-tree evaluates
    (``function_gis.h``; the fine geometry test is out of scope per
    SURVEY §1.2): the probe envelope folds to constants at rewrite time,
    the column envelope is the st_mbr pipeline inlined as SQL, and the
    interval-overlap predicate min/max-pushes into the scan when the
    bounds are materialized columns."""

    def repl(m: re.Match) -> str:
        env = _envelope_sql(m.group("col"))
        if m.group("rect") is not None:
            x1, y1, x2, y2 = [float(v) for v in m.group("rect").split(",")]
        else:
            x1, y1, x2, y2 = _wkt_envelope_literal(m.group("wkt"))
        return (
            f"({env['xmin']} <= {x2} AND {env['xmax']} >= {x1} "
            f"AND {env['ymin']} <= {y2} AND {env['ymax']} >= {y1})"
        )

    return _MBR_RE.sub(repl, expr)


def _rewrite_expr(expr: str) -> str:
    """TQL expression → Spark SQL expression (token-level)."""
    out = _rewrite_geometry(expr)
    # TIMESTAMP('2024-01-01T00:00:00Z') literal → to_timestamp('...')
    out = re.sub(
        r"\bTIMESTAMP\s*\(\s*'([^']+)'\s*\)",
        lambda m: "to_timestamp('%s')" % m.group(1).replace("T", " ").replace("Z", ""),
        out,
        flags=re.IGNORECASE,
    )
    # XOR — not in Spark SQL for booleans; A XOR B ≡ (A) != (B)
    out = re.sub(r"\bXOR\b", "!=", out, flags=re.IGNORECASE)
    # ELEMENT(i, arr): GridDB is 0-based, element_at is 1-based
    out = re.sub(
        r"\bELEMENT\s*\(\s*([^,]+),\s*([^)]+)\)",
        r"element_at(\2, CAST(\1 AS INT) + 1)",
        out,
        flags=re.IGNORECASE,
    )
    for gname, sname in _FN_MAP.items():
        out = re.sub(rf"\b{gname}\s*\(", sname + "(", out, flags=re.IGNORECASE)
    return out


_TQL_RE = re.compile(
    r"^\s*SELECT\s+(?P<sel>.*?)"
    r"(?:\s+WHERE\s+(?P<where>.*?))?"
    r"(?:\s+ORDER\s+BY\s+(?P<order>.*?))?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+)(?:\s+OFFSET\s+(?P<offset>\d+))?)?"
    r"\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _parse_args(arglist: str) -> list[str]:
    """Split a function argument list on top-level commas."""
    args, depth, cur = [], 0, []
    for ch in arglist:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        args.append("".join(cur).strip())
    return args


def _ts_literal(arg: str) -> str:
    m = re.match(r"(?i)TIMESTAMP\s*\(\s*'([^']+)'\s*\)", arg.strip())
    if m:
        return m.group(1).replace("T", " ").replace("Z", "")
    return arg.strip().strip("'")


def run_tql(container: "Collection", tql: str) -> DataFrame:
    """Execute a TQL statement against a container, GridDB semantics."""
    m = _TQL_RE.match(tql)
    if not m:
        raise ValueError(f"cannot parse TQL: {tql!r}")
    sel = m.group("sel").strip()
    df = container.df
    if m.group("where"):
        df = df.filter(F.expr(_rewrite_expr(m.group("where"))))

    ts_col = getattr(container, "ts_col", None)

    # ---- selection dispatch -------------------------------------------
    fn_match = re.match(r"(?i)^\s*([A-Z_]+)\s*\((.*)\)\s*$", sel, re.DOTALL)
    agg_or_selection = fn_match.group(1).upper() if fn_match else None

    if agg_or_selection in _SELECTIONS:
        if ts_col is None:
            raise ValueError(f"{agg_or_selection} requires a TimeSeries container")
        args = _parse_args(fn_match.group(2))
        name = agg_or_selection
        if name in ("TIME_NEXT", "TIME_NEXT_ONLY"):
            out = ts_ops.time_next(df, _ts_literal(args[1]), ts_col,
                                   only=name.endswith("ONLY"))
        elif name in ("TIME_PREV", "TIME_PREV_ONLY"):
            out = ts_ops.time_prev(df, _ts_literal(args[1]), ts_col,
                                   only=name.endswith("ONLY"))
        elif name == "TIME_INTERPOLATED":
            out = ts_ops.time_interpolated(df, _ts_literal(args[1]), args[0], ts_col)
        elif name == "TIME_SAMPLING":
            col, start, end, n, unit = args
            out = ts_ops.time_sampling(df, _ts_literal(start), _ts_literal(end),
                                       int(n), unit, col if col != "*" else None,
                                       ts_col)
        elif name == "MAX_ROWS":
            out = ts_ops.max_rows(df, args[0])
        else:
            out = ts_ops.min_rows(df, args[0])
    elif agg_or_selection in _AGGS or agg_or_selection == "TIME_AVG":
        arg = fn_match.group(2).strip()
        if agg_or_selection == "TIME_AVG":
            if ts_col is None:
                raise ValueError("TIME_AVG requires a TimeSeries container")
            return (
                ts_ops.time_avg(df, arg, ts_col)
                .withColumnRenamed("time_avg", "aggregation_result")
            )
        col = F.lit(1) if arg == "*" else F.expr(_rewrite_expr(arg))
        return df.agg(_AGGS[agg_or_selection](col).alias("aggregation_result"))
    elif sel == "*":
        out = df
    else:
        out = df.selectExpr(*[_rewrite_expr(a) for a in _parse_args(sel)])

    # ---- order / limit / offset ---------------------------------------
    if m.group("order"):
        order_cols = []
        for part in m.group("order").split(","):
            toks = part.split()
            col = F.col(toks[0])
            if len(toks) > 1 and toks[1].upper() == "DESC":
                col = col.desc()
            order_cols.append(col)
        out = out.orderBy(*order_cols)
    if m.group("offset"):
        out = out.offset(int(m.group("offset")))
    if m.group("limit"):
        out = out.limit(int(m.group("limit")))
    return out

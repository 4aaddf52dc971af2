"""GridDB NewSQL → Spark SQL translation front-end (SURVEY §7 phase 3).

GridDB's SQL is SQL-92-flavored (parser generated from modified SQLite,
``sql_internal_parser.cpp:26``); Catalyst accepts most of it verbatim. The
rewrites here cover the GridDB-isms:

- ``TIMESTAMP('...')`` literals → ``to_timestamp('...')``
- ``x GLOB 'pat'`` → anchored ``rlike``
- GridDB hints (``/*+ LEADING(...) ... */`` — ``sql_compiler.h:36-64``) →
  stripped (Catalyst/AQE own these decisions; Spark's BROADCAST/MERGE
  hints pass through untouched)
- ``GROUP BY RANGE(key) EVERY(n, unit[, off]) [FILL(mode)]``
  (``docs/GridDB-5.3-CE-RELEASE_NOTES.md:30-70``) → the
  ``group_by_range`` operator, bounds taken from the WHERE range
  condition exactly like the reference requires
- ``MATCH_RECOGNIZE (...)`` (5.9) → the ``match_recognize`` operator

Everything else goes to ``spark.sql`` against catalog-registered views.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from griddb_spark.catalog import ContainerCatalog
from griddb_spark.functions.scalar import glob_to_regex
from griddb_spark.operators import group_by_range, match_recognize

_HINT_RE = re.compile(r"/\*\+[^*]*\*/", re.DOTALL)
_TS_LIT_RE = re.compile(r"\bTIMESTAMP\s*\(\s*'([^']+)'\s*\)", re.IGNORECASE)
_GLOB_RE = re.compile(r"(\w+(?:\.\w+)?)\s+GLOB\s+'([^']*)'", re.IGNORECASE)

_SPARK_HINTS = ("BROADCAST", "BROADCASTJOIN", "MAPJOIN", "MERGE",
                "SHUFFLE_HASH", "SHUFFLE_REPLICATE_NL", "REPARTITION",
                "COALESCE", "REBALANCE")

#: GridDB's join-order hint (sql_compiler.h:36-64 SQLHint::LEADING;
#: applied at sql_compiler.cpp:10201 as CMD_OPT_JOIN_LEADING_*). Spark has
#: no LEADING hint, but Catalyst preserves the SYNTACTIC join order unless
#: cost-based join reordering is explicitly enabled — so the faithful
#: mapping is to reorder a simple comma-list FROM clause to the hinted
#: order (inner-join commutativity makes this semantics-preserving).
_LEADING_RE = re.compile(r"/\*\+\s*Leading\s*\(([^()]*)\)\s*\*/",
                         re.IGNORECASE)
_FROM_LIST_RE = re.compile(
    r"(\bFROM\s+)([A-Za-z_][\w.]*(?:\s+(?!WHERE\b|GROUP\b|ORDER\b|LIMIT\b|"
    r"HAVING\b|JOIN\b|ON\b)[A-Za-z_]\w*)?"
    r"(?:\s*,\s*[A-Za-z_][\w.]*(?:\s+(?!WHERE\b|GROUP\b|ORDER\b|LIMIT\b|"
    r"HAVING\b|JOIN\b|ON\b)[A-Za-z_]\w*)?)+)",
    re.IGNORECASE,
)


def _apply_leading(sql: str) -> str:
    """Reorder a comma-joined FROM list to a ``/*+ Leading(a b c) */``
    hint's order. Conservative: only fires on a plain comma list of named
    tables (optionally aliased) where every hinted name resolves; explicit
    JOIN chains and subquery sources are left to Catalyst/AQE.

    The rewrite is ANCHORED to the hint's own SELECT scope: the FROM list
    is searched forward from the hint's position, and if another SELECT
    (a subquery) opens between the hint and that FROM, the hint is
    dropped rather than applied to the wrong scope — without the anchor,
    a hint in an outer query could silently reorder a CTE's or
    subquery's FROM list (correct by inner-join commutativity, but the
    hint would miss its target)."""
    m = _LEADING_RE.search(sql)
    if not m:
        return sql
    order = m.group(1).replace(",", " ").split()
    out = _LEADING_RE.sub("", sql)
    # positions before the (first) hint are unchanged by the removal
    fm = _FROM_LIST_RE.search(out, m.start())
    if not order or not fm:
        return out
    between = out[m.start(): fm.start()]
    if re.search(r"\bSELECT\b", between, re.IGNORECASE):
        return out  # FROM belongs to a nested scope: drop the hint
    items = [i.strip() for i in fm.group(2).split(",")]
    by_name = {}
    for item in items:
        parts = item.split()
        by_name[parts[-1].lower()] = item        # alias (or bare name)
        by_name[parts[0].split(".")[-1].lower()] = item  # table name
    picked, seen = [], set()
    for name in order:
        item = by_name.get(name.lower())
        if item is None or id(item) in seen:
            return out  # unresolvable hint: keep the query, drop the hint
        picked.append(item)
        seen.add(id(item))
    rest = [i for i in items if id(i) not in seen]
    return out[: fm.start(2)] + ", ".join(picked + rest) + out[fm.end(2):]

#: GridDB's statistical hint ``TableRowCount(t, n)`` (sql_compiler.h:63
#: TABLE_ROW_COUNT; consumed at sql_compiler.cpp:12495-12520
#: resolveJoinNodeApproxSize to pick the small/driving join side). Spark's
#: equivalent lever is the broadcast-join decision, so a hinted count small
#: enough to sit comfortably under the default 10 MB
#: autoBroadcastJoinThreshold maps to ``/*+ BROADCAST(t) */``; larger
#: counts are dropped (Catalyst's own stats govern, same as GridDB falling
#: back to ``approxSize_``).
TABLE_ROW_COUNT_BROADCAST_ROWS = 100_000

_ROW_COUNT_RE = re.compile(
    r"TableRowCount\s*\(\s*([A-Za-z_][\w.]*)\s*,\s*(\d+)\s*\)",
    re.IGNORECASE,
)


def _apply_table_row_count(sql: str) -> str:
    """Anchored like ``_apply_leading``: the BROADCAST hint is inserted
    after the SELECT that CONTAINS the TableRowCount comment (nearest
    SELECT before the hint), not the statement's first SELECT — so a hint
    inside a CTE or subquery lands where its table name resolves."""
    first = _ROW_COUNT_RE.search(sql)
    small = [m.group(1) for m in _ROW_COUNT_RE.finditer(sql)
             if int(m.group(2)) <= TABLE_ROW_COUNT_BROADCAST_ROWS]
    out = _ROW_COUNT_RE.sub("", sql)
    if not small:
        return out
    owner = None
    for sel in re.finditer(r"\bSELECT\b", out, re.IGNORECASE):
        if sel.start() > first.start():
            break
        owner = sel
    if owner is None:  # hint precedes every SELECT: use the first one
        owner = re.search(r"\bSELECT\b", out, re.IGNORECASE)
    if not owner:
        return out
    return (out[: owner.end()]
            + " /*+ BROADCAST(%s) */" % ", ".join(small)
            + out[owner.end():])


#: GridDB's execution-resource hint ``MaxDegreeOfParallelism(n)``
#: (sql_compiler.h:36-64 MAX_DEGREE_OF_PARALLELISM — caps a statement's
#: task parallelism). Spark's statement-level analog is the
#: ``REPARTITION(n)`` hint: it pins the shuffle partition count for the
#: hinted SELECT, bounding the number of concurrent tasks the stage can
#: occupy. Anchored to the hint's own SELECT like TableRowCount. The
#: two remaining resource hints (MAX_DEGREE_OF_TASK_INPUT,
#: DISTRIBUTED_POLICY) are accepted-and-stripped as FULL PARITY, not a
#: gap — see _COST_HINT_RE for the per-hint evidence.
_DOP_RE = re.compile(
    r"MaxDegreeOfParallelism\s*\(\s*(\d+)\s*\)", re.IGNORECASE
)


def _apply_max_dop(sql: str) -> str:
    first = _DOP_RE.search(sql)
    out = _DOP_RE.sub("", sql)
    if not first:
        return out
    n = int(first.group(1))
    if n <= 0:
        return out
    owner = None
    for sel in re.finditer(r"\bSELECT\b", out, re.IGNORECASE):
        if sel.start() > first.start():
            break
        owner = sel
    if owner is None:
        owner = re.search(r"\bSELECT\b", out, re.IGNORECASE)
    if not owner:
        return out
    return (out[: owner.end()]
            + f" /*+ REPARTITION({n}) */"
            + out[owner.end():])


#: GridDB's join-method hints (``sql_compiler.h:47-48``
#: SQLHint::INDEX_JOIN / NO_INDEX_JOIN; consumed per table PAIR at
#: ``sql_compiler.cpp:10217-10221`` findJoinMethodHint — force/forbid the
#: index-nested-loop join for that pair). The index join probes the inner
#: table through a transient lookup structure; Spark's physical analog of
#: "hash-lookup join" vs "no lookup structure" is ShuffledHashJoin vs
#: SortMergeJoin, so ``IndexJoin(a b)`` maps to ``SHUFFLE_HASH(b)`` and
#: ``NoIndexJoin(a b)`` to ``MERGE(b)`` (b = the probed/inner side),
#: anchored to the hint's own SELECT scope like TableRowCount. Results
#: are identical either way; only the physical strategy flips (plan-
#: pinned in tests/test_plans.py).
_NO_INDEX_JOIN_RE = re.compile(
    r"No_?Index_?Join\s*\(\s*([A-Za-z_]\w*)\s+([A-Za-z_]\w*)\s*\)",
    re.IGNORECASE,
)
_INDEX_JOIN_RE = re.compile(
    r"(?<![A-Za-z_0-9])Index_?Join\s*\(\s*([A-Za-z_]\w*)\s+([A-Za-z_]\w*)\s*\)",
    re.IGNORECASE,
)


def _apply_index_join(sql: str) -> str:
    # One GridDB statement may carry several (No)IndexJoin hints (GridDB
    # consumes one per table PAIR, sql_compiler.cpp:10217 findJoinMethodHint)
    # — process occurrences one at a time so EVERY pair gets its Spark hint,
    # each anchored to its own SELECT scope. Inserted Spark hints
    # (SHUFFLE_HASH/MERGE) never re-match the GridDB patterns, so the loop
    # strictly consumes.
    out = sql
    for pat, spark_hint in ((_NO_INDEX_JOIN_RE, "MERGE"),
                            (_INDEX_JOIN_RE, "SHUFFLE_HASH")):
        while True:
            m = pat.search(out)
            if not m:
                break
            inner = m.group(2)
            stripped = out[: m.start()] + out[m.end():]
            # SELECTs before the hint sit at unchanged offsets in `stripped`
            owner = None
            for sel in re.finditer(r"\bSELECT\b", stripped, re.IGNORECASE):
                if sel.start() > m.start():
                    break
                owner = sel
            if owner is None:
                owner = re.search(r"\bSELECT\b", stripped, re.IGNORECASE)
            if not owner:
                out = stripped
                continue
            out = (stripped[: owner.end()]
                   + f" /*+ {spark_hint}({inner}) */"
                   + stripped[owner.end():])
    return out


#: GridDB's fill-generation budget hint ``MaxGeneratedRows(n)``
#: (``sql_compiler.h:40`` MAX_GENERATED_ROWS; read at
#: ``sql_compiler.cpp:13354-13363`` getMaxGeneratedRows and enforced by
#: the GROUP BY RANGE merge operator — ``sql_operator_group.cpp:1378``
#: throws "Too many groups filled" once the budget of generated
#: (empty-filled) rows is spent; default 100k,
#: ``sql_operator_group.h:314``). Threaded into ``group_by_range``'s
#: ``generation_limit``.
_MAX_GEN_ROWS_RE = re.compile(
    r"Max_?Generated_?Rows\s*\(\s*(\d+)\s*\)", re.IGNORECASE
)

#: GridDB's index-scan hints (``sql_compiler.h:44-45`` SQLHint::INDEX_SCAN /
#: NO_INDEX_SCAN; consumed at ``sql_compiler.cpp:10128-10138``
#: applyScanOption — one table argument, sets/clears the scan node's
#: CMD_OPT_SCAN_INDEX flag, i.e. forces index use vs. a full scan).
#: Spark's scan-acceleration analog is parquet filter pushdown + file/
#: row-group skipping: ``NoIndexScan(t)`` forces the full-scan posture by
#: pinning a non-deterministic pushdown barrier over ``t`` for this
#: statement — predicates stay ABOVE the scan (``PushedFilters: []``),
#: every file of ``t`` is read, results unchanged. ``IndexScan(t)`` is
#: Spark's default posture and is honored by stripping. Column pruning is
#: NOT disabled (the barrier references no columns), matching GridDB where
#: the hint governs row access, not projection. Table-granular and
#: statement-wide (GridDB applies it to every scan node of the named
#: table).
_NO_INDEX_SCAN_RE = re.compile(
    r"No_?Index_?Scan\s*\(\s*([A-Za-z_]\w*)\s*\)", re.IGNORECASE
)
_INDEX_SCAN_RE = re.compile(
    r"(?<![A-Za-z_0-9])Index_?Scan\s*\(\s*([A-Za-z_]\w*)\s*\)", re.IGNORECASE
)


def _extract_index_scan_hints(sql: str) -> "tuple[str, list[str]]":
    """Strip (No)IndexScan hints; return the full-scan-forced table names."""
    full_scan = [m.group(1).lower() for m in _NO_INDEX_SCAN_RE.finditer(sql)]
    out = _NO_INDEX_SCAN_RE.sub("", sql)
    out = _INDEX_SCAN_RE.sub("", out)
    out = re.sub(r"/\*\+\s*\*/", "", out)  # drop a now-empty hint comment
    return out, list(dict.fromkeys(full_scan))


#: GridDB's cost-based-optimizer hint family (``sql_compiler.h:55-60``;
#: consumed at ``sql_compiler.cpp:13382-13420`` isLegacyJoinReordering /
#: isLegacyJoinDriving and the 5.9 cost-based index scan,
#: ``GridDB-5.9-CE-RELEASE_NOTES.md``): each pair flips one optimizer
#: strategy between cost-based and rule-based/legacy for THIS statement.
#: Spark's statement-scoped seats:
#:
#: - (No)CostBasedIndexScan — 5.9: "determine the optimal index scan
#:   method based on cost ... during joins". Spark's cost-based
#:   join-time scan decision is DYNAMIC PARTITION PRUNING (a runtime
#:   cost estimate decides whether the join's build side filters the
#:   probe scan); rule-based = static pruning only.
#: - (No)CostBasedJoin — join REORDERING by cost. Spark preserves the
#:   syntactic join order unless CBO join reordering is on; the hint
#:   toggles ``spark.sql.cbo.(joinReorder.)enabled`` (reordering then
#:   engages exactly where table stats exist, as GridDB falls back
#:   without statistics).
#: - (No)CostBasedJoinDriving — driving/inner side selection by cost.
#:   Spark picks build/broadcast sides from runtime stats via AQE;
#:   rule-based = the static initial plan (AQE off).
#:
#: The remaining two execution hints are accepted-and-stripped — and
#: that is FULL PARITY, not a documented gap:
#:
#: - DISTRIBUTED_POLICY is vestigial IN THE REFERENCE ITSELF: its only
#:   occurrences are the hint-name registration
#:   (``sql_compiler.cpp:24796``), the one-string-constant arg check
#:   (``:25003``), and the duplicate-hint warning (``:25153``) — no
#:   code path ever READS the accepted value (zero consumption sites
#:   across server/). A GridDB user's DistributedPolicy('...') hint is
#:   parsed, validated, and ignored there exactly as it is here, so
#:   accept-and-strip is behaviorally identical, the same
#:   documented-full-parity status as the geometry predicates.
#: - MAX_DEGREE_OF_TASK_INPUT IS consumed upstream
#:   (``sql_compiler.cpp:13338`` getMaxInputCount bounds union-all task
#:   fan-in) but the bounded quantity does not exist in Spark: a Spark
#:   union concatenates partitions without a merge task, so there is no
#:   fan-in to bound — the hint can only ever be a no-op, never a
#:   behavior loss.
#:
#: Both are pinned as no-ops by tests/test_sql_frontends.py (same query
#: with and without the hint → identical rows, hint text absent from
#: the executed SQL).
_COST_HINT_RE = re.compile(
    r"\b(?P<no>No_?)?Cost_?Based_?"
    r"(?P<what>Index_?Scan|Join_?Driving|Join)\s*\(\s*\)",
    re.IGNORECASE,
)

_COST_HINT_CONFS = {
    ("index_scan", False):
        {"spark.sql.optimizer.dynamicPartitionPruning.enabled": "true"},
    ("index_scan", True):
        {"spark.sql.optimizer.dynamicPartitionPruning.enabled": "false"},
    ("join", False): {"spark.sql.cbo.enabled": "true",
                      "spark.sql.cbo.joinReorder.enabled": "true"},
    ("join", True): {"spark.sql.cbo.enabled": "false",
                     "spark.sql.cbo.joinReorder.enabled": "false"},
    ("join_driving", False): {"spark.sql.adaptive.enabled": "true"},
    ("join_driving", True): {"spark.sql.adaptive.enabled": "false"},
}


import threading as _threading

#: serializes cost-hinted statements: session confs are shared, so the
#: override + plan-pinning must not interleave with another statement's
_COST_CONF_LOCK = _threading.Lock()


#: GridDB's planning-version pin ``LegacyPlan(major, minor[, patch])``
#: (``sql_compiler.cpp:13429`` isLegacyPlanning): planner strategies
#: introduced AFTER the pinned version fall back to their legacy form —
#: cost-based join reordering arrived after 5.4
#: (LEGACY_JOIN_REORDERING_VERSION, ``sql_compiler.cpp:1335``) and
#: cost-based driving-side selection after 5.7
#: (LEGACY_JOIN_DRIVING_VERSION, ``:1336``). Explicit (No)CostBased*
#: hints take precedence over the version pin, exactly as the
#: reference's hasHint checks run first.
_LEGACY_PLAN_RE = re.compile(
    r"Legacy_?Plan\s*\(\s*(\d+)\s*,\s*(\d+)\s*(?:,\s*\d+\s*)?\)",
    re.IGNORECASE,
)


def _extract_cost_hints(sql: str) -> "tuple[str, dict]":
    """Strip (No)CostBased*/LegacyPlan hints; return statement-scoped
    conf overrides (explicit CostBased* hints override LegacyPlan)."""
    confs: dict = {}
    for m in _LEGACY_PLAN_RE.finditer(sql):
        v = (int(m.group(1)), int(m.group(2)))
        if v <= (5, 4):
            confs.update(_COST_HINT_CONFS[("join", True)])
        if v <= (5, 7):
            confs.update(_COST_HINT_CONFS[("join_driving", True)])
    sql = _LEGACY_PLAN_RE.sub("", sql)
    for m in _COST_HINT_RE.finditer(sql):
        what = m.group("what").lower().replace("_", "")
        key = {"indexscan": "index_scan", "join": "join",
               "joindriving": "join_driving"}[what]
        confs.update(_COST_HINT_CONFS[(key, m.group("no") is not None)])
    out = _COST_HINT_RE.sub("", sql)
    out = re.sub(r"/\*\+\s*\*/", "", out)
    return out, confs


def _with_cost_confs(spark: SparkSession, cost_confs: dict, thunk):
    """Run ``thunk`` (→ DataFrame) under statement-scoped optimizer confs.

    Physical planning is pinned INSIDE the override scope (executedPlan
    is computed and cached on the QueryExecution), so restoring the
    session confs afterwards cannot change the returned plan. Hinted
    statements serialize on a lock, so two HINTED statements never plan
    under each other's overrides; an UNHINTED statement issued
    concurrently from another thread plans lazily at its first action
    and can still observe the override window — GridDB's hint scope is
    per-statement, so keep cost-hinted statements off hot concurrent
    paths (the window is planning-only; executed results are unaffected
    in either case, only the chosen strategy)."""
    if not cost_confs:
        return thunk()
    with _COST_CONF_LOCK:
        old = {k: spark.conf.get(k, None) for k in cost_confs}
        try:
            for k, v in cost_confs.items():
                spark.conf.set(k, v)
            out = thunk()
            out._jdf.queryExecution().executedPlan()
            return out
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


def _scan_barrier(df: DataFrame) -> DataFrame:
    """Pushdown barrier: an always-true but non-foldable predicate keeps
    every later filter ABOVE the scan (``PushedFilters: []``) — the
    NoIndexScan full-scan posture. ``!=`` dodges the optimizer's
    range-based simplification of ordered comparisons on rand()."""
    return df.where(F.rand(7) != F.lit(-1.0))


#: keywords that can follow a table reference — their presence means the
#: reference carries NO alias, so the rewrite must add one
_AFTER_TABLE_KEYWORDS = frozenset({
    "where", "group", "order", "limit", "having", "on", "join", "inner",
    "left", "right", "full", "cross", "natural", "union", "intersect",
    "except", "using", "match_recognize",
})


def _replace_table_ref(sql: str, table: str, new: str) -> str:
    """Point this statement's TABLE REFERENCES of ``table`` at view
    ``new``, keeping ``table`` as the alias (``FROM t`` → ``FROM new AS
    t``; ``FROM t x`` → ``FROM new x``). Only FROM/JOIN positions and
    comma-separated FROM lists rewrite — qualified column refs
    (``t.col``) resolve through the alias, and a COLUMN that happens to
    share the table's name is never touched (a blanket word-replace
    would corrupt it). String literals never rewrite."""
    lit_spans = [m.span() for m in re.finditer(r"'(?:[^']|'')*'", sql)]

    def in_lit(i: int) -> bool:
        return any(a <= i < b for a, b in lit_spans)

    out, pos = [], 0
    for m in re.finditer(r"\b%s\b" % re.escape(table), sql, re.IGNORECASE):
        if in_lit(m.start()):
            continue
        before = sql[: m.start()]
        mprev = re.search(r"(\bFROM\b|\bJOIN\b|,)\s*$", before, re.IGNORECASE)
        if not mprev:
            continue
        if mprev.group(1) == ",":
            # a comma only introduces a table ref inside a FROM list:
            # the nearest clause keyword before it must be FROM
            kws = re.findall(
                r"\b(FROM|SELECT|WHERE|GROUP|ORDER|HAVING|ON)\b",
                before, re.IGNORECASE,
            )
            if not kws or kws[-1].upper() != "FROM":
                continue
        ma = re.match(r"\s*([A-Za-z_]\w*|,|\))?", sql[m.end():])
        nxt = (ma.group(1) or "").lower()
        has_alias = (
            nxt == "as"
            or (nxt not in ("", ",", ")")
                and nxt not in _AFTER_TABLE_KEYWORDS)
        )
        repl = new if has_alias else f"{new} AS {table}"
        out.append(sql[pos: m.start()])
        out.append(repl)
        pos = m.end()
    out.append(sql[pos:])
    return "".join(out)


#: GridDB 5.8 time-unit frame boundary — ``RANGE BETWEEN (10, MINUTE)
#: PRECEDING`` (GridDB-5.8-CE-RELEASE_NOTES.md FRAME-clause) → Spark's
#: interval-literal range boundary over a timestamp ordering.
_FRAME_UNIT_RE = re.compile(
    r"\(\s*(\d+)\s*,\s*"
    r"(YEAR|MONTH|DAY|HOUR|MINUTE|SECOND|MILLISECOND)\s*\)"
    r"\s+(PRECEDING|FOLLOWING)",
    re.IGNORECASE,
)


def rewrite_sql(sql: str) -> str:
    """Token-level GridDB SQL → Spark SQL rewrite (no structure change)."""
    out = sql

    # TableRowCount/MaxDegreeOfParallelism first: stripping their tokens
    # from a multi-hint comment (GridDB packs several hints per
    # /*+ ... */) leaves a pure Leading(...) comment for _apply_leading.
    out = _apply_table_row_count(out)
    out = _apply_max_dop(out)
    out = _apply_index_join(out)
    out = _apply_leading(out)

    def _hint(m: re.Match) -> str:
        body = m.group(0)
        return body if any(h in body.upper() for h in _SPARK_HINTS) else ""

    out = _HINT_RE.sub(_hint, out)
    out = _TS_LIT_RE.sub(
        lambda m: "to_timestamp('%s')"
        % m.group(1).replace("T", " ").replace("Z", ""),
        out,
    )
    out = _GLOB_RE.sub(
        lambda m: "%s RLIKE '%s'"
        % (m.group(1), glob_to_regex(m.group(2)).replace("\\", "\\\\")),
        out,
    )

    out = _FRAME_UNIT_RE.sub(
        lambda m: f"INTERVAL {m.group(1)} {m.group(2).upper()} "
        f"{m.group(3).upper()}",
        out,
    )
    return out


_RANGE_RE = re.compile(
    r"GROUP\s+BY\s+RANGE\s*\(\s*(?P<key>\w+)\s*\)\s*"
    r"EVERY\s*\(\s*(?P<n>\d+)\s*,\s*(?P<unit>\w+)\s*(?:,\s*(?P<off>-?\d+)\s*)?\)"
    r"(?:\s*FILL\s*\(\s*(?P<fill>\w+)\s*\))?",
    re.IGNORECASE,
)

_RANGE_QUERY_RE = re.compile(
    r"^\s*SELECT\s+(?P<sel>.*?)\s+FROM\s+(?P<table>\w+)\s+"
    r"WHERE\s+(?P<where>.*?)\s*(?P<range>GROUP\s+BY\s+RANGE.*)$",
    re.IGNORECASE | re.DOTALL,
)

_BETWEEN_RE = re.compile(
    r"(?P<col>\w+)\s+BETWEEN\s+(?P<lo>.+?)\s+AND\s+(?P<hi>[^)\s].*?)\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _exec_group_by_range(
    spark: SparkSession, catalog: ContainerCatalog, sql: str,
    full_scan: "list[str] | None" = None,
) -> DataFrame:
    from griddb_spark.operators.group_range import ROW_GENERATION_LIMIT

    gen_limit = ROW_GENERATION_LIMIT
    mg = _MAX_GEN_ROWS_RE.search(sql)
    if mg:
        gen_limit = int(mg.group(1))
        sql = _MAX_GEN_ROWS_RE.sub("", sql)
        sql = re.sub(r"/\*\+\s*\*/", "", sql)  # drop now-empty hint comment
    mq = _RANGE_QUERY_RE.match(sql)
    if not mq:
        raise ValueError(
            "GROUP BY RANGE requires SELECT ... FROM t WHERE <range cond> "
            "GROUP BY RANGE(...) (the reference requires the WHERE range "
            "to bound the bucket grid)"
        )
    mr = _RANGE_RE.search(mq.group("range"))
    assert mr is not None
    key, n, unit = mr.group("key"), int(mr.group("n")), mr.group("unit")
    offset = int(mr.group("off") or 0)
    fill = (mr.group("fill") or "NONE").upper()

    mb = _BETWEEN_RE.search(mq.group("where"))
    if not mb or mb.group("col") != key:
        raise ValueError("GROUP BY RANGE needs `key BETWEEN lo AND hi` in WHERE")
    lo = _literal_ts(mb.group("lo"))
    hi = _literal_ts(mb.group("hi"))

    df = catalog.load(mq.group("table"))
    if full_scan and mq.group("table").lower() in full_scan:
        df = _scan_barrier(df)
    extra_where = _BETWEEN_RE.sub("true", mq.group("where"))
    if extra_where.strip() not in ("true", ""):
        df = df.filter(F.expr(rewrite_sql(extra_where)))

    aggs: dict[str, F.Column] = {}
    for item in _split_select(mq.group("sel")):
        item = item.strip()
        if item == key or item == "*":
            continue
        alias_m = re.match(r"(?is)^(.*?)\s+AS\s+(\w+)\s*$", item)
        expr_sql, alias = (
            (alias_m.group(1), alias_m.group(2))
            if alias_m
            else (item, re.sub(r"\W+", "_", item).strip("_").lower())
        )
        aggs[alias] = F.expr(rewrite_sql(expr_sql))
    if not aggs:
        raise ValueError("GROUP BY RANGE needs at least one aggregate in SELECT")
    return group_by_range(
        df, key, n, unit, aggs, start=lo, end=hi, offset=offset, fill=fill,
        generation_limit=gen_limit,
    )


def _split_select(sel: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in sel:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def _literal_ts(expr: str):
    expr = expr.strip()
    m = _TS_LIT_RE.match(expr)
    if m:
        return m.group(1).replace("T", " ").replace("Z", "")
    m = re.match(r"(?i)^TIMESTAMP\s+'([^']+)'$", expr)
    if m:
        return m.group(1)
    return expr.strip("'")


# ---------------------------------------------------------------------------
# MATCH_RECOGNIZE
# ---------------------------------------------------------------------------

_MR_RE = re.compile(
    r"^\s*SELECT\s+(?P<sel>.*?)\s+FROM\s+(?P<table>\w+)\s+MATCH_RECOGNIZE\s*"
    r"\((?P<body>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_MR_CLAUSES = re.compile(
    r"(?:PARTITION\s+BY\s+(?P<part>.*?))?\s*"
    r"(?:ORDER\s+BY\s+(?P<order>.*?))?\s*"
    r"(?:MEASURES\s+(?P<measures>.*?))?\s*"
    r"(?P<rows>ONE\s+ROW\s+PER\s+MATCH|ALL\s+ROWS\s+PER\s+MATCH)?\s*"
    r"(?:AFTER\s+MATCH\s+SKIP\s+PAST\s+LAST\s+ROW)?\s*"
    r"PATTERN\s*\(\s*(?P<pattern>[^)]*)\)\s*"
    r"DEFINE\s+(?P<define>.*)$",
    re.IGNORECASE | re.DOTALL,
)


def _sql_cond_to_python(cond: str) -> str:
    """SQL predicate syntax → the MATCH_RECOGNIZE evaluator's Python-AST
    syntax (match_recognize.py _Expr)."""
    out = cond
    out = re.sub(r"<>", "!=", out)
    out = re.sub(r"(?<![<>!=])=(?!=)", "==", out)
    out = re.sub(r"\bAND\b", "and", out, flags=re.IGNORECASE)
    out = re.sub(r"\bOR\b", "or", out, flags=re.IGNORECASE)
    out = re.sub(r"\bNOT\b", "not", out, flags=re.IGNORECASE)
    return out.strip()


def _exec_match_recognize(
    spark: SparkSession, catalog: ContainerCatalog, sql: str,
    full_scan: "list[str] | None" = None,
) -> DataFrame:
    mq = _MR_RE.match(sql)
    assert mq is not None
    body = mq.group("body").strip()
    mc = _MR_CLAUSES.search(body)
    if not mc:
        raise ValueError("cannot parse MATCH_RECOGNIZE clauses")
    partition_by = [
        c.strip() for c in (mc.group("part") or "").split(",") if c.strip()
    ]
    order_by = (mc.group("order") or "ts").split(",")[0].strip()
    all_rows = bool(mc.group("rows")) and mc.group("rows").upper().startswith("ALL")

    measures: dict[str, str] = {}
    if mc.group("measures"):
        for item in _split_select(mc.group("measures")):
            am = re.match(r"(?is)^\s*(.*?)\s+AS\s+(\w+)\s*$", item)
            if am:
                measures[am.group(2)] = _sql_cond_to_python(am.group(1))

    define: dict[str, str] = {}
    for item in _split_select(mc.group("define")):
        dm = re.match(r"(?is)^\s*(\w+)\s+AS\s+(.*)$", item.strip())
        if dm:
            define[dm.group(1)] = _sql_cond_to_python(dm.group(2))

    df = catalog.load(mq.group("table"))
    if full_scan and mq.group("table").lower() in full_scan:
        df = _scan_barrier(df)
    return match_recognize(
        df,
        pattern=mc.group("pattern"),
        define=define,
        measures=measures,
        partition_by=partition_by,
        order_by=order_by,
        all_rows=all_rows,
    )


_EXPLAIN_RE = re.compile(r"^\s*EXPLAIN(?P<analyze>\s+ANALYZE)?\s+", re.IGNORECASE)


class PreparedStatement:
    """Prepared statement: parse/rewrite once, bind ``?`` placeholders per
    execution (JDBC ``PreparedStatement`` surface; server-side the plan is
    cached keyed on the statement with ``EXPR_PLACEHOLDER`` leaves,
    ``sql_type.h:42-92``, ``sql_execution.cpp`` statement cache).

    The GridDB-dialect rewrite (hints, GLOB, GROUP BY RANGE detection) runs
    at prepare time; each ``execute(*params)`` is a parameterized
    ``spark.sql`` — Catalyst substitutes typed literals into the cached
    parse, never string splicing, so rebinding re-optimizes with the new
    literals (predicate pushdown / partition pruning see the bound value).
    """

    #: batched-INSERT form. The VALUES list is split on bare commas, so
    #: inline literals may not contain ',' or ')' — bind such values via
    #: ``?`` placeholders instead (the JDBC-typical usage anyway).
    _INSERT_RE = re.compile(
        r"^\s*INSERT\s+INTO\s+(?P<table>\w+)\s*"
        r"(?:\((?P<cols>[^)]*)\))?\s*VALUES\s*\((?P<vals>[^)]*)\)\s*;?\s*$",
        re.IGNORECASE,
    )

    def __init__(
        self,
        spark: SparkSession,
        catalog: ContainerCatalog,
        sql: str,
        tables: "dict[str, object] | None" = None,
    ):
        self._spark = spark
        self._catalog = catalog
        self._sql = sql
        # placeholders are '?' OUTSIDE string literals ('' is the escaped
        # quote inside one, so stripping quoted spans first is exact)
        self.param_count = re.sub(r"'(?:[^']|'')*'", "", sql).count("?")
        self._batch: list[tuple] = []
        self._insert = self._INSERT_RE.match(sql)
        self._tables = tables or {}
        if self._insert is None:
            # dispatch + dialect rewrite resolved once
            self._rewritten = rewrite_sql(sql)
            catalog.register_all()

    def execute(self, *params) -> DataFrame:
        if self._insert is not None:
            raise ValueError(
                "update statement returns no ResultSet; use executeBatch()"
            )
        if len(params) != self.param_count:
            raise ValueError(
                f"statement has {self.param_count} placeholders, "
                f"got {len(params)} parameters"
            )
        if not params:
            return self._spark.sql(self._rewritten)
        return self._spark.sql(self._rewritten, args=list(params))

    # -- batch updates (5.5: PreparedStatement addBatch/clearBatch/
    # executeBatch — JDBCAddBatch.java sample). Only non-ResultSet
    # statements batch; the error surfaces at executeBatch time, matching
    # the reference's documented timing. --------------------------------

    def add_batch(self, *params) -> None:
        if len(params) != self.param_count:
            raise ValueError(
                f"statement has {self.param_count} placeholders, "
                f"got {len(params)} parameters"
            )
        self._batch.append(tuple(params))

    def clear_batch(self) -> None:
        self._batch = []

    def execute_batch(self) -> list[int]:
        """Run every batched bind as ONE write job (the point of batch
        updates at scale: N statements, one append — not N commits).
        Returns per-statement update counts, JDBC-style."""
        if self._insert is None:
            raise ValueError(
                "batch execution requires a non-ResultSet statement "
                "(INSERT), got a query"
            )
        name = self._insert.group("table")
        target = self._tables.get(name)
        if target is None:
            raise KeyError(f"no writable container bound for table {name!r}")
        if not self._batch:
            return []
        vals = [v.strip() for v in self._insert.group("vals").split(",")]
        schema = target.read().schema
        cols_spec = self._insert.group("cols")
        cols = (
            [c.strip() for c in cols_spec.split(",")]
            if cols_spec
            else [f.name for f in schema.fields]
        )
        if len(vals) != len(cols):
            raise ValueError("VALUES arity does not match column list")
        rows = []
        for params in self._batch:
            it = iter(params)
            rows.append(tuple(
                next(it) if v == "?" else _parse_literal(v) for v in vals
            ))
        sub = T.StructType([schema[c] for c in cols])
        df = self._spark.createDataFrame(rows, sub)
        # a partial column list still inserts the FULL target schema: the
        # unnamed columns ride as typed NULLs, so a partitioned target's
        # partitioning expression finds its source column and unpartitioned
        # appends never write schema-divergent files
        missing = [f for f in schema.fields if f.name not in cols]
        if missing:
            df = df.select(
                *cols,
                *[F.lit(None).cast(f.dataType).alias(f.name) for f in missing],
            ).select(*[f.name for f in schema.fields])
        target.insert(df)
        n = len(self._batch)
        self._batch = []
        return [1] * n


def _parse_literal(text: str):
    """Inline SQL literal inside a batched INSERT's VALUES list."""
    t = text.strip()
    if t.upper() == "NULL":
        return None
    if t.startswith("'") and t.endswith("'"):
        return t[1:-1].replace("''", "'")
    try:
        return int(t)
    except ValueError:
        pass
    try:
        return float(t)
    except ValueError:
        raise ValueError(f"unsupported literal {text!r}") from None


def prepare(
    spark: SparkSession,
    catalog: ContainerCatalog,
    sql: str,
    tables: "dict[str, object] | None" = None,
) -> PreparedStatement:
    """Prepare a GridDB SQL statement for repeated parameterized runs.
    ``tables`` binds writable containers (DmlTable) by name for batched
    INSERT statements."""
    return PreparedStatement(spark, catalog, sql, tables)


def _executed_plan_with_metrics(inner: DataFrame) -> list[tuple[int, str, str]]:
    """EXECUTE the query and serialize the physical plan with per-node
    runtime actuals (numOutputRows, shuffle bytes, peak memory, …) — the
    EXPLAIN ANALYZE contract: GridDB runs the statement and serializes
    the executed task plan with actual row counts
    (``sql_execution.h:835-838``, ``sql_execution.cpp:3234-3241``).

    The plan runs once via ``executedPlan().execute().count()`` (a job
    over the InternalRow RDD — nothing is materialized to the driver),
    which populates every node's SQLMetrics; the tree walk then descends
    through AQE wrappers (AdaptiveSparkPlanExec → final plan, QueryStage
    shells → their materialized subplans) so the emitted rows are the
    plan that actually executed, not the initial static one.
    """
    qe = inner._jdf.queryExecution()
    qe.executedPlan().execute().count()
    rows: list[tuple[int, str, str]] = []

    def walk(node, depth: int) -> None:
        cls = node.getClass().getSimpleName()
        pairs = []
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            pairs.append((kv._1(), kv._2().value()))
        mets = ", ".join(f"{k}={v}" for k, v in sorted(pairs))
        rows.append((len(rows), "  " * depth + node.nodeName(), mets))
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan(), depth + 1)
            return
        if "QueryStage" in cls:  # Shuffle/Broadcast/Result stage shells
            walk(node.plan(), depth + 1)
            return
        cit = node.children().iterator()
        while cit.hasNext():
            walk(cit.next(), depth + 1)

    walk(qe.executedPlan(), 0)
    return rows


def griddb_sql(
    spark: SparkSession, catalog: ContainerCatalog, sql: str,
    params: list | None = None,
) -> DataFrame:
    """Run a GridDB SQL statement on Spark.

    ``EXPLAIN <sql>`` returns the optimized logical plan as rows;
    ``EXPLAIN ANALYZE <sql>`` EXECUTES the statement and returns the
    physical plan with per-node runtime actuals (GridDB serializes its
    executed task plan with actual row counts the same way —
    ``SyntaxTree::EXPLAIN_PLAN/EXPLAIN_ANALYZE``,
    ``sql_execution.cpp:3234-3241``).

    ``params`` binds ``?`` placeholders positionally (GridDB prepared
    statements — ``EXPR_PLACEHOLDER``, ``sql_type.h:42-92``); binding is
    Catalyst-side (parameterized ``spark.sql``), not string splicing.
    """
    me = _EXPLAIN_RE.match(sql)
    if me:
        inner = griddb_sql(spark, catalog, sql[me.end():], params=params)
        if me.group("analyze"):
            return spark.createDataFrame(
                _executed_plan_with_metrics(inner),
                "id int, plan string, metrics string",
            )
        qe = inner._jdf.queryExecution()
        rows = list(enumerate(qe.optimizedPlan().toString().splitlines()))
        return spark.createDataFrame(rows, "id int, plan string")
    # (No)IndexScan and (No)CostBased* hints extract BEFORE dispatch so a
    # hinted GROUP BY RANGE / MATCH_RECOGNIZE statement parses (the
    # comment would otherwise reach _RANGE_QUERY_RE/aggregate parsing);
    # the exec paths honor the full-scan barrier on their own loads and
    # run under the same statement-scoped optimizer confs.
    sql, full_scan_tables = _extract_index_scan_hints(sql)
    sql, cost_confs = _extract_cost_hints(sql)
    if _RANGE_RE.search(sql):
        return _with_cost_confs(
            spark, cost_confs,
            lambda: _exec_group_by_range(spark, catalog, sql,
                                         full_scan=full_scan_tables))
    if re.search(r"\bMATCH_RECOGNIZE\b", sql, re.IGNORECASE):
        return _with_cost_confs(
            spark, cost_confs,
            lambda: _exec_match_recognize(spark, catalog, sql,
                                          full_scan=full_scan_tables))
    catalog.register_all()
    # NoIndexScan(t): register a STATEMENT-LOCAL barrier view under a
    # unique name and point this statement's references at it — the
    # session-global view is never touched, so a concurrent statement in
    # the same session can never plan against the barrier.
    import uuid as _uuid

    barrier_views = []
    for t in full_scan_tables:
        df = catalog.table(t)
        bname = f"{t}__noidxscan_{_uuid.uuid4().hex[:8]}"
        _scan_barrier(df).createOrReplaceTempView(bname)
        sql = _replace_table_ref(sql, t, bname)
        barrier_views.append(bname)
    def _go() -> DataFrame:
        if params is not None:
            return spark.sql(rewrite_sql(sql), args=params)
        return spark.sql(rewrite_sql(sql))

    try:
        return _with_cost_confs(spark, cost_confs, _go)
    finally:
        # spark.sql analyzes eagerly (view subtrees inline at call time),
        # so dropping the barrier views cannot affect the returned DataFrame
        for b in barrier_views:
            spark.catalog.dropTempView(b)

"""MATCH_RECOGNIZE — SQL row-pattern matching over sorted partitions.

GridDB added MATCH_RECOGNIZE in 5.9 (reference
``docs/GridDB-5.9-CE-RELEASE_NOTES.md:88-139``, executed by
``OP_WINDOW_MATCH`` / ``SQLSortOps::WindowMatch``, ``sql_operator_sort.h:94``,
pattern nodes ``EXPR_PATTERN_*`` ``sql_type.h:79-91``). Supported per the
reference: PARTITION BY, ORDER BY, MEASURES, ONE|ALL ROWS PER MATCH,
AFTER MATCH SKIP PAST LAST ROW (the only skip mode), PATTERN with
regex-like quantifiers, DEFINE with MATCH_NUMBER()/CLASSIFIER()/PREV()/
NEXT()/FIRST()/LAST().

Spark has no built-in row-pattern operator, so this is the designed slow
path: a Thompson NFA compiled from the PATTERN, executed per partition by
an Arrow-batched ``applyInPandas`` function. Parallelism comes from
PARTITION BY (each series matched independently on its executor); rows
within a partition are sorted once by the grouped-map machinery.

DEFINE/MEASURES expressions are Python-syntax strings evaluated against
row context via a small AST interpreter (no ``eval`` of raw strings):
column names resolve to the current row; ``PREV(expr, n=1)`` / ``NEXT``
shift the *physical* row; ``FIRST(expr)`` / ``LAST(expr)`` evaluate at the
first/last row of the current match; ``CLASSIFIER()`` / ``MATCH_NUMBER()``
as in the standard. SQL NULL semantics: comparisons with NULL are not
satisfied.
"""

from __future__ import annotations

import ast
import operator
from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# pattern compiler: "A B+ (C | D)* E?" → NFA with greedy epsilon ordering
# --------------------------------------------------------------------------


@dataclass
class _NFA:
    # transitions: state → list of (label, next_state); label None = epsilon.
    # list order is the DFS preference order (greedy: consume before exit).
    transitions: dict[int, list[tuple[str | None, int]]] = field(default_factory=dict)
    start: int = 0
    accept: int = 1
    _next: int = 2

    def new_state(self) -> int:
        s = self._next
        self._next += 1
        self.transitions.setdefault(s, [])
        return s

    def add(self, frm: int, label: str | None, to: int, prefer: bool = False) -> None:
        lst = self.transitions.setdefault(frm, [])
        if prefer:
            lst.insert(0, (label, to))
        else:
            lst.append((label, to))


class _PatternParser:
    """pattern := seq ('|' seq)* ; seq := factor+ ;
    factor := (VAR | '(' pattern ')') ('+'|'*'|'?')?"""

    def __init__(self, text: str):
        self.tokens = self._tokenize(text)
        self.pos = 0

    @staticmethod
    def _tokenize(text: str) -> list[str]:
        out, cur = [], ""
        for ch in text:
            if ch.isalnum() or ch in "_$":
                cur += ch
            else:
                if cur:
                    out.append(cur)
                    cur = ""
                if ch in "()|+*?":
                    out.append(ch)
                elif ch.isspace():
                    continue
                else:
                    raise ValueError(f"unsupported PATTERN character {ch!r}")
        if cur:
            out.append(cur)
        return out

    def peek(self) -> str | None:
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def take(self) -> str:
        tok = self.tokens[self.pos]
        self.pos += 1
        return tok

    def parse(self, nfa: _NFA, frm: int, to: int) -> None:
        self._alt(nfa, frm, to)
        if self.pos != len(self.tokens):
            raise ValueError("trailing tokens in PATTERN")

    def _alt(self, nfa: _NFA, frm: int, to: int) -> None:
        self._seq(nfa, frm, to)
        while self.peek() == "|":
            self.take()
            self._seq(nfa, frm, to)

    def _seq(self, nfa: _NFA, frm: int, to: int) -> None:
        cur = frm
        factors = []
        while self.peek() not in (None, "|", ")"):
            factors.append(True)
            nxt = nfa.new_state() if self.peek() is not None else to
            self._factor(nfa, cur, nxt)
            cur = nxt
        if not factors:
            raise ValueError("empty PATTERN sequence")
        nfa.add(cur, None, to)

    def _factor(self, nfa: _NFA, frm: int, to: int) -> None:
        tok = self.take()
        if tok == "(":
            inner_from, inner_to = nfa.new_state(), nfa.new_state()
            self._alt(nfa, inner_from, inner_to)
            if self.take() != ")":
                raise ValueError("unbalanced parens in PATTERN")
        elif tok.isidentifier():
            inner_from, inner_to = nfa.new_state(), nfa.new_state()
            nfa.add(inner_from, tok, inner_to)
        else:
            raise ValueError(f"unexpected token {tok!r} in PATTERN")
        quant = self.peek()
        if quant in ("+", "*", "?"):
            self.take()
        else:
            quant = None
        if quant is None:
            nfa.add(frm, None, inner_from)
            nfa.add(inner_to, None, to)
        elif quant == "?":
            nfa.add(frm, None, inner_from, prefer=True)  # greedy: try first
            nfa.add(frm, None, to)
            nfa.add(inner_to, None, to)
        elif quant == "+":
            nfa.add(frm, None, inner_from)
            nfa.add(inner_to, None, inner_from, prefer=True)  # greedy loop
            nfa.add(inner_to, None, to)
        elif quant == "*":
            loop = nfa.new_state()
            nfa.add(frm, None, loop)
            nfa.add(loop, None, inner_from, prefer=True)  # greedy loop
            nfa.add(loop, None, to)
            nfa.add(inner_to, None, loop)


def _compile_pattern(text: str) -> tuple[_NFA, list[str]]:
    nfa = _NFA()
    nfa.transitions.setdefault(0, [])
    nfa.transitions.setdefault(1, [])
    parser = _PatternParser(text)
    parser.parse(nfa, nfa.start, nfa.accept)
    variables = [t for t in parser.tokens if t.isidentifier()]
    seen, ordered = set(), []
    for v in variables:
        if v not in seen:
            seen.add(v)
            ordered.append(v)
    return nfa, ordered


# --------------------------------------------------------------------------
# expression interpreter (DEFINE / MEASURES)
# --------------------------------------------------------------------------

_BIN_OPS = {
    ast.Add: operator.add, ast.Sub: operator.sub, ast.Mult: operator.mul,
    ast.Div: operator.truediv, ast.Mod: operator.mod, ast.Pow: operator.pow,
    ast.FloorDiv: operator.floordiv,
}
_CMP_OPS = {
    ast.Eq: operator.eq, ast.NotEq: operator.ne, ast.Lt: operator.lt,
    ast.LtE: operator.le, ast.Gt: operator.gt, ast.GtE: operator.ge,
}


class _Expr:
    """Compiled DEFINE/MEASURES expression over a pandas partition."""

    def __init__(self, text: str):
        self.tree = ast.parse(text, mode="eval").body

    def eval(self, ctx: "_MatchContext", i: int):
        return self._ev(self.tree, ctx, i)

    def _ev(self, node, ctx: "_MatchContext", i: int):
        if isinstance(node, ast.Constant):
            return node.value
        if isinstance(node, ast.Name):
            return ctx.col(node.id, i)
        if isinstance(node, ast.UnaryOp):
            v = self._ev(node.operand, ctx, i)
            if isinstance(node.op, ast.USub):
                return None if v is None else -v
            if isinstance(node.op, ast.Not):
                return not v
            raise ValueError("unsupported unary op")
        if isinstance(node, ast.BinOp):
            a, b = self._ev(node.left, ctx, i), self._ev(node.right, ctx, i)
            if a is None or b is None:
                return None
            return _BIN_OPS[type(node.op)](a, b)
        if isinstance(node, ast.Compare):
            left = self._ev(node.left, ctx, i)
            for op, comp in zip(node.ops, node.comparators):
                right = self._ev(comp, ctx, i)
                if left is None or right is None:
                    return False  # SQL: NULL comparison → not satisfied
                if not _CMP_OPS[type(op)](left, right):
                    return False
                left = right
            return True
        if isinstance(node, ast.BoolOp):
            if isinstance(node.op, ast.And):
                return all(bool(self._ev(v, ctx, i)) for v in node.values)
            return any(bool(self._ev(v, ctx, i)) for v in node.values)
        if isinstance(node, ast.Call):
            fname = node.func.id if isinstance(node.func, ast.Name) else None
            if fname in ("PREV", "NEXT"):
                n = self._ev(node.args[1], ctx, i) if len(node.args) > 1 else 1
                j = i - n if fname == "PREV" else i + n
                if j < 0 or j >= ctx.n_rows:
                    return None
                return self._ev(node.args[0], ctx, j)
            if fname in ("FIRST", "LAST"):
                if not ctx.match_rows:
                    return None
                j = ctx.match_rows[0] if fname == "FIRST" else ctx.match_rows[-1]
                return self._ev(node.args[0], ctx, j)
            if fname == "CLASSIFIER":
                return ctx.classifier(i)
            if fname == "MATCH_NUMBER":
                return ctx.match_number
            if fname == "ABS":
                v = self._ev(node.args[0], ctx, i)
                return None if v is None else abs(v)
            raise ValueError(f"unsupported function {fname!r}")
        raise ValueError(f"unsupported expression node {type(node).__name__}")

    def base_column(self) -> str | None:
        """The single column this expression navigates to, if trivially
        inferable — used for output type inference."""
        node = self.tree
        while isinstance(node, ast.Call) and isinstance(node.func, ast.Name) \
                and node.func.id in ("PREV", "NEXT", "FIRST", "LAST"):
            node = node.args[0]
        if isinstance(node, ast.Name):
            return node.id
        return None


def _vectorize(node, pdf):
    """Compile a DEFINE AST into a pandas Series over the whole partition.

    Covers expressions of current-row columns, constants, arithmetic,
    comparisons (SQL semantics: NULL → not satisfied), boolean ops, ABS,
    and physical-offset PREV/NEXT (→ ``shift``). Raises ValueError for
    match-dependent constructs (FIRST/LAST/CLASSIFIER/MATCH_NUMBER), which
    fall back to the row-at-a-time interpreter.
    """
    import pandas as pd

    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, ast.Name):
        if node.id not in pdf.columns:
            raise KeyError(f"unknown column {node.id!r}")
        return pdf[node.id]
    if isinstance(node, ast.UnaryOp):
        v = _vectorize(node.operand, pdf)
        if isinstance(node.op, ast.USub):
            return -v
        if isinstance(node.op, ast.Not):
            if isinstance(v, pd.Series):
                return ~v.fillna(False).astype(bool)
            return not v
        raise ValueError("unsupported unary op")
    if isinstance(node, ast.BinOp):
        a, b = _vectorize(node.left, pdf), _vectorize(node.right, pdf)
        return _BIN_OPS[type(node.op)](a, b)
    if isinstance(node, ast.Compare):
        left = _vectorize(node.left, pdf)
        acc = None
        for op, comp in zip(node.ops, node.comparators):
            right = _vectorize(comp, pdf)
            res = _CMP_OPS[type(op)](left, right)
            # NULL comparison → not satisfied (pandas: NaN compares False
            # already; object-dtype None needs the explicit mask)
            for side in (left, right):
                if isinstance(side, pd.Series):
                    res = res & side.notna()
            acc = res if acc is None else (acc & res)
            left = right
        return acc
    if isinstance(node, ast.BoolOp):
        vals = [_vectorize(v, pdf) for v in node.values]
        out = vals[0]
        for v in vals[1:]:
            out = (out & v) if isinstance(node.op, ast.And) else (out | v)
        return out
    if isinstance(node, ast.Call):
        fname = node.func.id if isinstance(node.func, ast.Name) else None
        if fname in ("PREV", "NEXT"):
            if len(node.args) > 1:
                if not isinstance(node.args[1], ast.Constant):
                    raise ValueError("PREV/NEXT offset must be constant")
                n = node.args[1].value
            else:
                n = 1
            inner = _vectorize(node.args[0], pdf)
            if not isinstance(inner, pd.Series):
                raise ValueError("PREV/NEXT of a constant")
            return inner.shift(n if fname == "PREV" else -n)
        if fname == "ABS":
            v = _vectorize(node.args[0], pdf)
            return v.abs() if isinstance(v, pd.Series) else abs(v)
        raise ValueError(f"not vectorizable: {fname}")
    raise ValueError(f"unsupported expression node {type(node).__name__}")


class _MatchContext:
    def __init__(self, pdf, match_rows, labels, match_number):
        self.pdf = pdf
        self.n_rows = len(pdf)
        self.match_rows = match_rows          # row indices in current match
        self.labels = labels                  # row index → variable name
        self.match_number = match_number
        self._cols = {c: pdf[c].to_numpy() for c in pdf.columns}

    def col(self, name: str, i: int):
        import pandas as pd

        if name not in self._cols:
            raise KeyError(f"unknown column {name!r}")
        v = self._cols[name][i]
        if v is None or (isinstance(v, float) and v != v):
            return None
        if pd and v is pd.NaT:
            return None
        return v

    def classifier(self, i: int):
        return self.labels.get(i)


# --------------------------------------------------------------------------
# the operator
# --------------------------------------------------------------------------


#: Kill switch for the vectorized two-variable frame matcher inside
#: compile_matcher — parity tests flip it off to reach the pure NFA.
_TWO_VAR_VECTOR_ENABLED = True


def compile_matcher(
    in_schema,
    pattern: str,
    define: Mapping[str, str],
    measures: Mapping[str, str] | None = None,
    partition_by: Sequence[str] = (),
    order_by: str = "ts",
    all_rows: bool = False,
    measure_types: Mapping[str, str] | None = None,
    max_match_rows: int = 100_000,
):
    """Compile a MATCH_RECOGNIZE spec into a reusable per-partition
    matcher — the engine behind both the batch operator and the streaming
    face (which must resume matching across micro-batches).

    Returns ``(process, out_schema, out_names)``. ``process(pdf,
    match_no_offset=0, start_at=0)`` sorts ``pdf`` by ``order_by``, runs
    the NFA with AFTER MATCH SKIP PAST LAST ROW starting at sorted
    position ``start_at`` (earlier rows are physical context only — they
    feed PREV but can never join a match), and returns ``(out_rows,
    consumed_upto, sorted_pdf)`` where ``consumed_upto`` is the sorted
    position just past the last completed match (rows from there on may
    still match once more rows arrive — the streaming pending tail).
    """
    import pandas as pd

    nfa, variables = _compile_pattern(pattern)
    for v in define:
        if v not in variables:
            raise ValueError(f"DEFINE variable {v!r} not in PATTERN")
    compiled_define = {v: _Expr(c) for v, c in define.items()}
    compiled_measures = {m: _Expr(c) for m, c in (measures or {}).items()}

    # ---- output schema ----------------------------------------------------
    type_of = {f.name: f.dataType for f in in_schema.fields}
    fields: list[T.StructField] = []
    if all_rows:
        fields += [T.StructField(f.name, f.dataType, True) for f in in_schema.fields]
        fields.append(T.StructField("classifier", T.StringType(), True))
    else:
        fields += [T.StructField(c, type_of[c], True) for c in partition_by]
    for m, expr in compiled_measures.items():
        if measure_types and m in measure_types:
            dt = T._parse_datatype_string(measure_types[m])
        else:
            base = expr.base_column()
            if base is not None and base in type_of:
                dt = type_of[base]
            elif "MATCH_NUMBER" in (measures or {}).get(m, ""):
                dt = T.LongType()
            elif "CLASSIFIER" in (measures or {}).get(m, ""):
                dt = T.StringType()
            else:
                dt = T.DoubleType()
        fields.append(T.StructField(m, dt, True))
    fields.append(T.StructField("match_no", T.LongType(), True))
    out_schema = T.StructType(fields)
    out_names = [f.name for f in fields]

    transitions = nfa.transitions
    accept = nfa.accept

    # ---- vectorized single-variable shortcut ------------------------------
    # A one-variable quantifier-free pattern under SKIP PAST LAST ROW is a
    # plain row filter (single-row matches can't overlap): matches = the
    # DEFINE mask, match numbers = a cumulative count, measures = whole-
    # partition vectorized expressions indexed at the matched rows. The
    # batch operator usually routes such patterns to the pure-JVM window
    # plan (_try_fast_path); this shortcut serves the STREAMING face,
    # which must run inside applyInPandasWithState — it removes the
    # per-match Python dict/eval work (~10x on dense-match partitions).
    try:
        _sv_tokens = _PatternParser._tokenize(pattern)
    except ValueError:
        _sv_tokens = []
    single_var = (
        _sv_tokens[0]
        if len(_sv_tokens) == 1 and _sv_tokens[0] not in "()|+*?"
        else None
    )

    class _StripMatchFns(ast.NodeTransformer):
        """FIRST/LAST(x) → x (the matched row); marks MATCH_NUMBER and
        CLASSIFIER sites with placeholder Names resolved after the mask."""

        def visit_Call(self, node):
            self.generic_visit(node)
            if isinstance(node.func, ast.Name):
                if node.func.id in ("FIRST", "LAST"):
                    return node.args[0]
                if node.func.id == "MATCH_NUMBER":
                    return ast.Name(id="__match_no__", ctx=ast.Load())
                if node.func.id == "CLASSIFIER":
                    return ast.Name(id="__classifier__", ctx=ast.Load())
            return node

    sv_measures = None
    sv_needs_aug = False
    if single_var is not None:
        sv_measures = {}
        for m, expr in compiled_measures.items():
            tree = _StripMatchFns().visit(
                ast.parse(ast.unparse(expr.tree), mode="eval").body
            )
            sv_measures[m] = ast.fix_missing_locations(tree)
            sv_needs_aug = sv_needs_aug or any(
                isinstance(nd, ast.Name)
                and nd.id in ("__match_no__", "__classifier__")
                for nd in ast.walk(tree)
            )

    # ---- vectorized two-variable shortcut (compile-time setup) ------------
    # The streaming face of the JVM two-var window path (r6,
    # _try_fast_path_two_var): A B / A+ B / A B+ / A+ B+ with the same
    # row-disjointness guard, but evaluated per micro-batch frame inside
    # applyInPandasWithState — NumPy run/anchor arithmetic instead of the
    # per-match backtracking loop. Measures: top-level FIRST(x)/LAST(x)/
    # MATCH_NUMBER()/CLASSIFIER(), or any vectorizable expression (NFA
    # parity: evaluated at the match's LAST row); nested match-dependent
    # calls fall back to the NFA.
    two_var = None
    if single_var is None and _sv_tokens and _TWO_VAR_VECTOR_ENABLED:
        _vq: list[tuple[str, bool]] = []
        _i, _ok = 0, True
        while _i < len(_sv_tokens):
            _t = _sv_tokens[_i]
            if not (_t[0].isalpha() or _t[0] in "_$"):
                _ok = False
                break
            _plus = _i + 1 < len(_sv_tokens) and _sv_tokens[_i + 1] == "+"
            _vq.append((_t, _plus))
            _i += 2 if _plus else 1
        if _ok and len(_vq) == 2 and _vq[0][0] != _vq[1][0]:
            _spec: list | None = []
            for m, expr in compiled_measures.items():
                tree = expr.tree
                if any(
                    sub is not tree
                    and isinstance(sub, ast.Call)
                    and isinstance(sub.func, ast.Name)
                    and sub.func.id in ("FIRST", "LAST", "CLASSIFIER",
                                        "MATCH_NUMBER")
                    for sub in ast.walk(tree)
                ):
                    _spec = None
                    break
                if isinstance(tree, ast.Call) and isinstance(
                    tree.func, ast.Name
                ) and tree.func.id in ("FIRST", "LAST", "MATCH_NUMBER",
                                       "CLASSIFIER"):
                    fn = tree.func.id
                    if fn == "MATCH_NUMBER":
                        _spec.append((m, "match_no", None))
                    elif fn == "CLASSIFIER":
                        _spec.append((m, "classifier", None))
                    else:
                        _spec.append(
                            (m, "first" if fn == "FIRST" else "last",
                             tree.args[0])
                        )
                else:
                    _spec.append((m, "last", tree))  # NFA evals at rows[-1]
            if _spec is not None:
                two_var = (_vq[0], _vq[1], _spec)

    def _two_var_process(pdf, vec_conds, start_at: int, match_no_offset: int):
        """Vectorized two-var matching over one sorted frame. Returns the
        (out, consumed, pdf) triple, or None → run the NFA loop (a DEFINE
        didn't vectorize, a measure didn't, or the disjointness guard —
        some row satisfies BOTH DEFINEs — failed for THIS frame).

        Soundness is the JVM path's argument verbatim: under SKIP PAST
        LAST ROW with row-disjoint DEFINEs, greedy matches are exactly
        "A-run (maximal for A+, the run-last row for A; clipped at
        start_at) followed by a non-empty B-run (maximal for B+, one row
        for B)" — anchors are the A-rows whose successor is a B-row, no
        backtracking inside a run can succeed, and matches cannot
        overlap."""
        import numpy as np
        import pandas as pd

        (var_a, a_plus), (var_b, b_plus), spec = two_var
        n = len(pdf)
        if n == 0:
            return [], start_at, pdf

        def _mask(v):
            if v in compiled_define:
                return vec_conds.get(v)
            return np.ones(n, dtype=bool)

        a, b = _mask(var_a), _mask(var_b)
        if a is None or b is None:
            return None
        if bool((a & b).any()):
            return None  # sequential match selection → NFA
        idx = np.arange(n)
        b_next = np.zeros(n, dtype=bool)
        b_next[:-1] = b[1:]
        anchors = a & b_next
        if start_at:
            anchors[: min(start_at, n)] = False
        anchor_idx = np.nonzero(anchors)[0]
        if len(anchor_idx) == 0:
            return [], start_at, pdf
        if a_plus:
            astart = a & ~np.concatenate(([False], a[:-1]))
            run_start = np.maximum.accumulate(np.where(astart, idx, -1))
            first_row = run_start[anchor_idx]
            if start_at:
                first_row = np.maximum(first_row, start_at)
        else:
            first_row = anchor_idx
        if b_plus:
            bend = b & ~np.concatenate((b[1:], [False]))
            run_end = np.minimum.accumulate(
                np.where(bend, idx, n)[::-1]
            )[::-1]
            last_row = run_end[anchor_idx + 1]
        else:
            last_row = anchor_idx + 1
        k = len(anchor_idx)
        nums = match_no_offset + np.arange(1, k + 1, dtype="int64")
        try:
            mdata = {}
            for m, kind, tree in spec:
                if kind == "match_no":
                    mdata[m] = nums
                elif kind == "classifier":
                    mdata[m] = np.full(k, var_b, dtype=object)
                else:
                    s = _vectorize(tree, pdf)
                    rowsel = first_row if kind == "first" else last_row
                    mdata[m] = (
                        s.to_numpy()[rowsel]
                        if isinstance(s, pd.Series)
                        else np.full(k, s)
                    )
        except (ValueError, KeyError):
            return None
        consumed = int(last_row[-1]) + 1
        if not all_rows:
            out = {c: pdf[c].to_numpy()[last_row] for c in partition_by}
            out.update(mdata)
            out["match_no"] = nums
            frame = pd.DataFrame(out).reindex(columns=out_names)
            return frame, consumed, pdf
        lens = (last_row - first_row + 1).astype("int64")
        total = int(lens.sum())
        offs = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        row_pos = np.repeat(first_row, lens) + offs
        mrep = np.repeat(np.arange(k), lens)
        out = {c: pdf[c].to_numpy()[row_pos] for c in pdf.columns}
        out["classifier"] = np.where(
            row_pos <= np.repeat(anchor_idx, lens), var_a, var_b
        ).astype(object)
        for m, v in mdata.items():
            out[m] = np.asarray(v)[mrep]
        out["match_no"] = nums[mrep]
        frame = pd.DataFrame(out).reindex(columns=out_names)
        return frame, consumed, pdf

    class _AugView:
        """Read-only DataFrame facade exposing extra virtual columns to
        ``_vectorize`` without copying the partition frame."""

        def __init__(self, pdf, extra):
            self._pdf, self._extra = pdf, extra

        @property
        def columns(self):
            return list(self._pdf.columns) + list(self._extra)

        def __getitem__(self, k):
            return self._extra[k] if k in self._extra else self._pdf[k]

    def _match_from(
        ctx: _MatchContext, start: int, vec_conds: dict
    ) -> list[tuple[int, str]] | None:
        """Greedy backtracking DFS from ``start``; returns the matched
        [(row, var), ...] or None. Transition order encodes greediness
        (loop-continue before loop-exit), so the first accept found is the
        greedy match. Epsilon cycles are cut per (state, row) along the
        current path only — consuming transitions reset the guard."""
        n = ctx.n_rows

        def dfs(state: int, idx: int, path: list, eps_seen: frozenset):
            if state == accept:
                return path if path else None  # zero-length matches are skipped
            for label, nxt in transitions.get(state, ()):
                if label is None:
                    key = (nxt, idx)
                    if key in eps_seen:
                        continue
                    r = dfs(nxt, idx, path, eps_seen | {key})
                    if r is not None:
                        return r
                else:
                    if idx >= n or len(path) >= max_match_rows:
                        continue
                    vec = vec_conds.get(label)
                    if vec is not None:
                        if not vec[idx]:
                            continue
                    elif (cond := compiled_define.get(label)) is not None:
                        # running semantics: current row is part of the match
                        ctx.match_rows = [r for r, _ in path] + [idx]
                        ctx.labels = dict(path)
                        ctx.labels[idx] = label
                        if not bool(cond.eval(ctx, idx)):
                            continue
                    r = dfs(nxt, idx + 1, path + [(idx, label)],
                            frozenset(((nxt, idx + 1),)))
                    if r is not None:
                        return r
            return None

        return dfs(nfa.start, start, [], frozenset(((nfa.start, start),)))

    def process(pdf: pd.DataFrame, match_no_offset: int = 0, start_at: int = 0):
        import sys

        sys.setrecursionlimit(max(sys.getrecursionlimit(), 4 * max_match_rows + 1000))
        pdf = pdf.sort_values(order_by, kind="mergesort").reset_index(drop=True)
        # Vectorize every match-independent DEFINE over the whole partition
        # once (bool numpy arrays); the NFA then runs on array lookups.
        vec_conds = {}
        for v, expr in compiled_define.items():
            try:
                series = _vectorize(expr.tree, pdf)
            except (ValueError, KeyError):
                continue
            if isinstance(series, pd.Series):
                vec_conds[v] = series.fillna(False).astype(bool).to_numpy()
            else:
                import numpy as np

                vec_conds[v] = np.full(len(pdf), bool(series))
        # Start-row pruning: labels on the first consuming transitions
        # (epsilon closure of start). If every one is vectorized, a row can
        # only begin a match where one of their arrays is True.
        first_labels: set[str] = set()
        stack, seen_states = [nfa.start], {nfa.start}
        while stack:
            st = stack.pop()
            for label, nxt in transitions.get(st, ()):
                if label is None:
                    if nxt not in seen_states:
                        seen_states.add(nxt)
                        stack.append(nxt)
                else:
                    first_labels.add(label)
        start_mask = None
        if first_labels and all(
            v in vec_conds or v not in compiled_define for v in first_labels
        ):
            import numpy as np

            start_mask = np.zeros(len(pdf), dtype=bool)
            for v in first_labels:
                if v in vec_conds:
                    start_mask |= vec_conds[v]
                else:  # undefined variable matches any row
                    start_mask[:] = True
                    break

        # vectorized single-variable shortcut (see compile-time setup)
        if single_var is not None and (
            single_var in vec_conds or single_var not in compiled_define
        ):
            import numpy as np

            nn = len(pdf)
            mask = vec_conds.get(single_var)
            mask = (
                np.ones(nn, dtype=bool) if mask is None else mask.copy()
            )
            if start_at:
                mask[:start_at] = False
            idx = np.nonzero(mask)[0]
            if len(idx) == 0:
                return [], start_at, pdf
            try:
                nums = match_no_offset + np.arange(
                    1, len(idx) + 1, dtype="int64"
                )
                if sv_needs_aug:
                    full_nums = np.zeros(nn, dtype="int64")
                    full_nums[idx] = nums
                    src = _AugView(pdf, {
                        "__match_no__": pd.Series(full_nums),
                        "__classifier__": pd.Series([single_var] * nn),
                    })
                else:
                    src = pdf
                mdata = {}
                for m, tree in sv_measures.items():
                    s = _vectorize(tree, src)
                    mdata[m] = (
                        s.to_numpy()[idx]
                        if isinstance(s, pd.Series)
                        else np.full(len(idx), s)
                    )
            except (ValueError, KeyError):
                pass  # fall through to the general NFA loop
            else:
                if all_rows:
                    out = {c: pdf[c].to_numpy()[idx] for c in pdf.columns}
                    out["classifier"] = np.full(len(idx), single_var)
                else:
                    out = {c: pdf[c].to_numpy()[idx] for c in partition_by}
                out.update(mdata)
                out["match_no"] = nums
                frame = pd.DataFrame(out).reindex(columns=out_names)
                return frame, int(idx[-1]) + 1, pdf

        # vectorized two-variable shortcut (see compile-time setup): per
        # frame — a frame where the disjointness guard fails (or an
        # expression won't vectorize) falls through to the NFA below
        if two_var is not None:
            tv = _two_var_process(pdf, vec_conds, start_at, match_no_offset)
            if tv is not None:
                return tv

        ctx = _MatchContext(pdf, [], {}, 0)
        out_rows = []
        match_no = 0
        i, n = start_at, len(pdf)
        consumed_upto = start_at
        while i < n:
            if start_mask is not None and not start_mask[i]:
                i += 1
                continue
            ctx.match_rows, ctx.labels = [], {}
            ctx.match_number = match_no_offset + match_no + 1
            path = _match_from(ctx, i, vec_conds)
            if not path:
                i += 1
                continue
            match_no += 1
            rows = [r for r, _ in path]
            labels = dict(path)
            ctx.match_rows, ctx.labels = rows, labels
            ctx.match_number = match_no_offset + match_no
            mvals = {m: e.eval(ctx, rows[-1]) for m, e in compiled_measures.items()}
            cols = ctx._cols
            if all_rows:
                for r in rows:
                    rec = {c: cols[c][r] for c in pdf.columns}
                    rec["classifier"] = labels[r]
                    rec.update(mvals)
                    rec["match_no"] = match_no_offset + match_no
                    out_rows.append(rec)
            else:
                last = rows[-1]
                rec = {c: cols[c][last] for c in partition_by}
                rec.update(mvals)
                rec["match_no"] = match_no_offset + match_no
                out_rows.append(rec)
            i = rows[-1] + 1  # AFTER MATCH SKIP PAST LAST ROW
            consumed_upto = i
        return out_rows, consumed_upto, pdf

    return process, out_schema, out_names


# --------------------------------------------------------------------------
# JVM fast path: single-variable patterns compile to window expressions
# --------------------------------------------------------------------------


class _NotFast(Exception):
    """Raised when an expression can't be compiled to JVM Columns."""


_JVM_BIN = {
    ast.Add: operator.add, ast.Sub: operator.sub, ast.Mult: operator.mul,
    ast.Div: operator.truediv,
}
_JVM_CMP = {
    ast.Eq: operator.eq, ast.NotEq: operator.ne, ast.Lt: operator.lt,
    ast.LtE: operator.le, ast.Gt: operator.gt, ast.GtE: operator.ge,
}


def _jvm_translate(node, w, var: str, in_measures: bool):
    """DEFINE/MEASURES AST → (Column, uses_window_shift), mirroring the
    interpreter's semantics exactly: Compare nodes are null-safe (SQL —
    NULL comparison is not satisfied, so each comparison is coalesced to
    FALSE at its own node, which keeps NOT/AND/OR identical to the
    row-at-a-time evaluator), PREV/NEXT are PHYSICAL lag/lead over the
    sort window, and FIRST/LAST collapse to the current row (a
    single-variable match is single-row). Anything else raises _NotFast
    and the caller falls back to the NFA."""
    if isinstance(node, ast.Constant):
        return F.lit(node.value), False
    if isinstance(node, ast.Name):
        return F.col(node.id), False
    if isinstance(node, ast.UnaryOp):
        if isinstance(node.op, ast.USub):
            v, uw = _jvm_translate(node.operand, w, var, in_measures)
            return -v, uw
        if isinstance(node.op, ast.Not):
            # sound only over null-safe boolean subtrees (Compare/BoolOp);
            # interpreter applies Python truthiness to anything else
            if not isinstance(node.operand, (ast.Compare, ast.BoolOp)):
                raise _NotFast("NOT of a non-boolean expression")
            v, uw = _jvm_translate(node.operand, w, var, in_measures)
            return ~v, uw
        raise _NotFast("unsupported unary op")
    if isinstance(node, ast.BinOp):
        if type(node.op) not in _JVM_BIN:
            raise _NotFast(f"unsupported operator {type(node.op).__name__}")
        a, ua = _jvm_translate(node.left, w, var, in_measures)
        b, ub = _jvm_translate(node.right, w, var, in_measures)
        return _JVM_BIN[type(node.op)](a, b), ua or ub
    if isinstance(node, ast.Compare):
        left, uses = _jvm_translate(node.left, w, var, in_measures)
        out = None
        for op, comp in zip(node.ops, node.comparators):
            if type(op) not in _JVM_CMP:
                raise _NotFast("unsupported comparison")
            right, ur = _jvm_translate(comp, w, var, in_measures)
            uses = uses or ur
            c = F.coalesce(_JVM_CMP[type(op)](left, right), F.lit(False))
            out = c if out is None else out & c
            left = right
        return out, uses
    if isinstance(node, ast.BoolOp):
        cols, uses = [], False
        for v in node.values:
            if not isinstance(v, (ast.Compare, ast.BoolOp, ast.UnaryOp)):
                raise _NotFast("boolean op over non-boolean operand")
            c, uv = _jvm_translate(v, w, var, in_measures)
            cols.append(c)
            uses = uses or uv
        out = cols[0]
        for c in cols[1:]:
            out = (out & c) if isinstance(node.op, ast.And) else (out | c)
        return out, uses
    if isinstance(node, ast.Call):
        fname = node.func.id if isinstance(node.func, ast.Name) else None
        if fname in ("PREV", "NEXT"):
            if len(node.args) > 1:
                if not isinstance(node.args[1], ast.Constant):
                    raise _NotFast("PREV/NEXT offset must be constant")
                n = node.args[1].value
            else:
                n = 1
            inner, ui = _jvm_translate(node.args[0], w, var, in_measures)
            if ui:
                raise _NotFast("nested window shift")
            fn = F.lag if fname == "PREV" else F.lead
            return fn(inner, n).over(w), True
        if fname == "ABS":
            inner, ui = _jvm_translate(node.args[0], w, var, in_measures)
            return F.abs(inner), ui
        if fname in ("FIRST", "LAST") and in_measures:
            # single-row match: FIRST/LAST are the matched row itself
            return _jvm_translate(node.args[0], w, var, in_measures)
        if fname == "CLASSIFIER" and in_measures:
            return F.lit(var), False
        raise _NotFast(f"function {fname!r} not JVM-compilable")
    raise _NotFast(f"unsupported node {type(node).__name__}")


def _try_fast_path(
    df: DataFrame,
    pattern: str,
    define: Mapping[str, str],
    measures: Mapping[str, str] | None,
    partition_by: Sequence[str],
    order_by: str,
    all_rows: bool,
    out_schema: T.StructType,
) -> DataFrame | None:
    """Compile a single-variable MATCH_RECOGNIZE to pure window/when
    Columns — whole-stage-codegen JVM execution, no Python worker.

    Eligibility: PATTERN is one variable with no quantifier/alternation,
    and every DEFINE/MEASURES expression translates (_jvm_translate).
    Under AFTER MATCH SKIP PAST LAST ROW a single-row match can never
    overlap another, so the match set is exactly the rows satisfying the
    DEFINE, match_no is a row_number over them, and PREV/NEXT stay
    physical lag/lead computed BEFORE the filter. Returns None (fall back
    to the NFA) for anything more general — alternation, quantifiers and
    multi-variable sequences need the backtracking matcher because match
    selection becomes sequential.
    """
    from pyspark.sql import Window

    try:
        tokens = _PatternParser._tokenize(pattern)
    except ValueError:
        return None
    if len(tokens) != 1 or tokens[0] in "()|+*?":
        return None
    var = tokens[0]
    w = (
        Window.partitionBy(*partition_by).orderBy(order_by)
        if partition_by
        else Window.partitionBy(F.lit(1)).orderBy(order_by)
    )
    try:
        if var in define:
            cond, _ = _jvm_translate(
                ast.parse(define[var], mode="eval").body, w, var, False
            )
            cond = F.coalesce(cond, F.lit(False))
        else:
            cond = F.lit(True)
        measure_cols: list[tuple[str, object, bool]] = []  # name, col, post
        for name, text in (measures or {}).items():
            tree = ast.parse(text, mode="eval").body
            if (
                isinstance(tree, ast.Call)
                and isinstance(tree.func, ast.Name)
                and tree.func.id == "MATCH_NUMBER"
            ):
                measure_cols.append((name, None, True))
                continue
            mc, _ = _jvm_translate(tree, w, var, True)
            measure_cols.append((name, mc, False))
    except _NotFast:
        return None

    # pre-filter: evaluate the condition and every physical-shift measure
    # against the full frame (lag/lead must see non-matching neighbors)
    staged = df.select(
        "*",
        cond.alias("__cond"),
        *[mc.alias(f"__m_{name}") for name, mc, post in measure_cols if not post],
    )
    w_no = (
        Window.partitionBy(*partition_by).orderBy(order_by)
        if partition_by
        else Window.partitionBy(F.lit(1)).orderBy(order_by)
    )
    matched = staged.filter(F.col("__cond")).withColumn(
        "__match_no", F.row_number().over(w_no).cast("long")
    )
    type_of = {f.name: f.dataType for f in out_schema.fields}
    out_cols: list = []
    if all_rows:
        out_cols += [F.col(f.name) for f in df.schema.fields]
        out_cols.append(F.lit(var).alias("classifier"))
    else:
        out_cols += [F.col(c) for c in partition_by]
    for name, _mc, post in measure_cols:
        src = F.col("__match_no") if post else F.col(f"__m_{name}")
        out_cols.append(src.cast(type_of[name]).alias(name))
    out_cols.append(F.col("__match_no").alias("match_no"))
    return matched.select(*out_cols)


def _try_fast_path_two_var(
    df: DataFrame,
    pattern: str,
    define: Mapping[str, str],
    measures: Mapping[str, str] | None,
    partition_by: Sequence[str],
    order_by: str,
    all_rows: bool,
    out_schema: T.StructType,
) -> DataFrame | None:
    """Compile a TWO-variable MATCH_RECOGNIZE (``A B``, ``A+ B``,
    ``A B+``, ``A+ B+``) to pure window Columns — the common
    spike-then-recover shape, JVM-side instead of the Python NFA.

    Soundness rests on a runtime guard: when no row satisfies BOTH
    DEFINEs (one cheap pre-scan of the two boolean columns), the greedy
    NFA's matches under AFTER MATCH SKIP PAST LAST ROW are exactly
    "run of A-rows (maximal for ``A+``, the single run-last row for
    ``A``) followed immediately by a non-empty B-run" — backtracking
    inside the A-run can never succeed (every interior next-row is an
    A-row, hence not B), matches can't overlap, and a match can never
    start mid-A-run (the scan pointer reaches a run's first row before
    its interior). Rows where A∧B would make match selection genuinely
    sequential — those frames fall back to the NFA, as do streaming
    frames (the guard needs an action).

    ALL ROWS PER MATCH is supported: membership and the match-level
    measures/match_no propagate from the anchor row (the run-last A-row)
    to its A-run via the run window and to the attached B-run via a
    lag-then-first-value staging — a few extra passes over the same
    partition sort, still zero Python.

    MEASURES supported: plain column refs (value at the match's LAST
    row, the NFA's evaluation point), FIRST(x)/LAST(x), MATCH_NUMBER(),
    CLASSIFIER() (→ the B variable: the last row's label). Anything
    else — PREV/NEXT in measures, match-dependent DEFINEs — falls back.
    """
    from pyspark.sql import Window

    if df.isStreaming:
        return None
    try:
        tokens = _PatternParser._tokenize(pattern)
    except ValueError:
        return None
    # accepted shapes: A B | A+ B | A B+ | A+ B+
    vars_q: list[tuple[str, bool]] = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if not (t[0].isalpha() or t[0] in "_$"):
            return None
        plus = i + 1 < len(tokens) and tokens[i + 1] == "+"
        vars_q.append((t, plus))
        i += 2 if plus else 1
    if len(vars_q) != 2 or vars_q[0][0] == vars_q[1][0]:
        return None
    (var_a, a_plus), (var_b, b_plus) = vars_q

    w = (
        Window.partitionBy(*partition_by).orderBy(order_by)
        if partition_by
        else Window.partitionBy(F.lit(1)).orderBy(order_by)
    )

    def _cond(var: str):
        if var not in define:
            return F.lit(True)
        c, _ = _jvm_translate(
            ast.parse(define[var], mode="eval").body, w, var, False
        )
        return F.coalesce(c, F.lit(False))

    # measures → (name, kind, payload): kind ∈ first|last|match_no|classifier
    try:
        cond_a, cond_b = _cond(var_a), _cond(var_b)
        mspec: list[tuple[str, str, object]] = []
        for name, text in (measures or {}).items():
            tree = ast.parse(text, mode="eval").body
            # match-dependent calls are only handled at the TOP level of a
            # measure; nested (e.g. FIRST(x) + 1) the generic translator
            # would collapse them to the current row — fall back instead
            for sub in ast.walk(tree):
                if (
                    sub is not tree
                    and isinstance(sub, ast.Call)
                    and isinstance(sub.func, ast.Name)
                    and sub.func.id in ("FIRST", "LAST", "CLASSIFIER",
                                        "MATCH_NUMBER")
                ):
                    raise _NotFast("nested match-dependent call")
            if isinstance(tree, ast.Call) and isinstance(tree.func, ast.Name):
                fn = tree.func.id
                if fn == "MATCH_NUMBER":
                    mspec.append((name, "match_no", None))
                    continue
                if fn == "CLASSIFIER":
                    mspec.append((name, "classifier", None))
                    continue
                if fn in ("FIRST", "LAST"):
                    inner, ui = _jvm_translate(
                        tree.args[0], w, var_b, True
                    )
                    if ui:
                        raise _NotFast("window shift inside FIRST/LAST")
                    mspec.append(
                        (name, "first" if fn == "FIRST" else "last", inner)
                    )
                    continue
            mc, um = _jvm_translate(tree, w, var_b, True)
            if um:
                raise _NotFast("PREV/NEXT in two-var measures")
            mspec.append((name, "last", mc))  # NFA evals at rows[-1]
    except _NotFast:
        return None

    first_exprs = {n: e for n, k, e in mspec if k == "first"}
    last_exprs = {n: e for n, k, e in mspec if k == "last"}

    staged = df.select(
        "*",
        cond_a.alias("__a"),
        cond_b.alias("__b"),
        *[e.alias(f"__fx_{n}") for n, e in first_exprs.items()],
        *[e.alias(f"__lx_{n}") for n, e in last_exprs.items()],
    )
    # the soundness guard: any A∧B row → sequential match selection → NFA
    if staged.filter(F.col("__a") & F.col("__b")).limit(1).count() > 0:
        return None

    a, b = F.col("__a"), F.col("__b")
    run = staged.select(
        "*",
        F.row_number().over(w).alias("__rn"),
        F.sum((a & ~F.coalesce(F.lag(a).over(w), F.lit(False))).cast("int"))
        .over(w).alias("__arun"),
        F.sum((b & ~F.coalesce(F.lag(b).over(w), F.lit(False))).cast("int"))
        .over(w).alias("__brun"),
    )
    wa = (
        Window.partitionBy(*partition_by, "__arun", "__a")
        if partition_by
        else Window.partitionBy(F.lit(1), "__arun", "__a")
    ).orderBy("__rn").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wb = (
        Window.partitionBy(*partition_by, "__brun", "__b")
        if partition_by
        else Window.partitionBy(F.lit(1), "__brun", "__b")
    ).orderBy("__rn").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # per-row run aggregates (meaningful on the rows of that run)
    run = run.select(
        "*",
        *[F.first(F.col(f"__fx_{n}")).over(wa).alias(f"__fv_{n}")
          for n in first_exprs],
        *[F.last(F.col(f"__lx_{n}")).over(wb).alias(f"__bend_{n}")
          for n in last_exprs],
    )
    w2 = (
        Window.partitionBy(*partition_by).orderBy("__rn")
        if partition_by
        else Window.partitionBy(F.lit(1)).orderBy("__rn")
    )
    anchor = a & F.coalesce(F.lead(b).over(w2), F.lit(False))
    lastcols = {
        n: (F.lead(F.col(f"__bend_{n}")).over(w2) if b_plus
            else F.lead(F.col(f"__lx_{n}")).over(w2))
        for n in last_exprs
    }
    firstcols = {
        n: (F.col(f"__fv_{n}") if a_plus else F.col(f"__fx_{n}"))
        for n in first_exprs
    }
    # every match-level measure value, materialized AT the anchor row
    mv_at_anchor = dict(lastcols)
    mv_at_anchor.update(firstcols)
    cand = run.select(
        "*",
        anchor.alias("__anchor"),
        *[c.alias(f"__mv_{n}") for n, c in mv_at_anchor.items()],
    )
    type_of = {f.name: f.dataType for f in out_schema.fields}

    if not all_rows:
        matched = cand.filter(F.col("__anchor")).withColumn(
            "__match_no", F.row_number().over(w2).cast("long")
        )
        out_cols: list = [F.col(c) for c in partition_by]
        for name, kind, _payload in mspec:
            if kind == "match_no":
                src = F.col("__match_no")
            elif kind == "classifier":
                src = F.lit(var_b)  # measures evaluate at the last row (B)
            else:
                src = F.col(f"__mv_{name}")
            out_cols.append(src.cast(type_of[name]).alias(name))
        out_cols.append(F.col("__match_no").alias("match_no"))
        return matched.select(*out_cols)

    # ---- ALL ROWS PER MATCH: propagate anchor-level values to the run --
    mnames = list(mv_at_anchor)
    w_run = w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s1 = cand.select(
        "*",
        F.sum(F.col("__anchor").cast("long")).over(w_run).alias("__running"),
        # A-side: the anchor sits inside the same (arun, a) group
        F.max(F.col("__anchor").cast("int")).over(wa).alias("__arun_hit"),
        *[F.first(F.when(F.col("__anchor"), F.col(f"__mv_{n}")), True)
          .over(wa).alias(f"__amv_{n}") for n in mnames],
        # B-side staging: the anchor is the row right before the b-run
        F.coalesce(F.lag(F.col("__anchor")).over(w2), F.lit(False))
        .alias("__laganchor"),
        *[F.lag(F.col(f"__mv_{n}")).over(w2).alias(f"__lagmv_{n}")
          for n in mnames],
    )
    if b_plus:
        s2 = s1.select(
            "*",
            F.first(F.col("__laganchor")).over(wb).alias("__batt"),
            *[F.first(F.col(f"__lagmv_{n}")).over(wb).alias(f"__bmv_{n}")
              for n in mnames],
        )
    else:
        s2 = s1.select(
            "*",
            F.col("__laganchor").alias("__batt"),
            *[F.col(f"__lagmv_{n}").alias(f"__bmv_{n}") for n in mnames],
        )
    amem = a & (
        (F.col("__arun_hit") == 1) if a_plus else F.col("__anchor")
    )
    bmem = b & F.col("__batt")
    if not b_plus:
        # single B: only the run's first row (the one right after the
        # anchor) joins the match
        bmem = bmem & F.col("__laganchor")
    mno = F.when(F.col("__anchor"), F.col("__running")).otherwise(
        F.when(amem, F.col("__running") + 1).otherwise(F.col("__running"))
    ).cast("long")
    rows = s2.filter(amem | bmem).select(
        "*", amem.alias("__amem"), mno.alias("__match_no")
    )
    out_cols = [F.col(f.name) for f in df.schema.fields]
    out_cols.append(
        F.when(F.col("__amem"), F.lit(var_a)).otherwise(F.lit(var_b))
        .alias("classifier")
    )
    for name, kind, _payload in mspec:
        if kind == "match_no":
            src = F.col("__match_no")
        elif kind == "classifier":
            src = F.lit(var_b)  # NFA evals measures once, at the last row
        else:
            src = F.when(
                F.col("__amem"), F.col(f"__amv_{name}")
            ).otherwise(F.col(f"__bmv_{name}"))
        out_cols.append(src.cast(type_of[name]).alias(name))
    out_cols.append(F.col("__match_no").alias("match_no"))
    return rows.select(*out_cols)


def match_recognize(
    df: DataFrame,
    pattern: str,
    define: Mapping[str, str],
    measures: Mapping[str, str] | None = None,
    partition_by: Sequence[str] = (),
    order_by: str = "ts",
    all_rows: bool = False,
    measure_types: Mapping[str, str] | None = None,
    max_match_rows: int = 100_000,
) -> DataFrame:
    """Run MATCH_RECOGNIZE over ``df``.

    ``define`` maps pattern variables to condition strings (Python operator
    syntax: ``"value > PREV(value)"``); an undefined variable matches any
    row (standard semantics). ``measures`` maps output names to expressions.
    ``all_rows=False`` (ONE ROW PER MATCH) emits partition keys + measures +
    match_no; ``all_rows=True`` additionally emits every matched input row
    with classifier. AFTER MATCH SKIP PAST LAST ROW (the reference's only
    mode). ``max_match_rows`` bounds a single match (the Spark-side analog
    of the reference's CONF_PATTERN_MATCH_MEMORY_LIMIT).
    """
    import pandas as pd

    process, out_schema, out_names = compile_matcher(
        df.schema, pattern, define, measures, partition_by, order_by,
        all_rows, measure_types, max_match_rows,
    )

    # single-variable patterns (no alternation/quantifier, PREV/NEXT-only
    # DEFINEs) compile to pure window expressions — whole-stage codegen,
    # no Python worker in the plan. ~10-100x the NFA's throughput; the
    # schema comes from the same compile so both paths are row-identical.
    fast = _try_fast_path(
        df, pattern, define, measures, partition_by, order_by, all_rows,
        out_schema,
    )
    if fast is None:
        # two-variable sequences (A+ B+ spike-then-recover et al.) have
        # their own window compilation, guarded by a runtime A∧B
        # disjointness check (see _try_fast_path_two_var)
        fast = _try_fast_path_two_var(
            df, pattern, define, measures, partition_by, order_by,
            all_rows, out_schema,
        )
    if fast is not None:
        return fast

    def _process(pdf: pd.DataFrame) -> pd.DataFrame:
        out_rows, _, _ = process(pdf)
        if isinstance(out_rows, pd.DataFrame):
            return out_rows
        if not out_rows:
            return pd.DataFrame({c: pd.Series(dtype="object") for c in out_names})
        return pd.DataFrame(out_rows, columns=out_names)

    if partition_by:
        # Explicit hash repartition on the grouping keys: the NFA is the
        # Python slow path, so it must fan out across every core — AQE
        # would coalesce the small shuffle under its advisory size and
        # starve the executors (explicit numPartitions is never coalesced,
        # and hash partitioning on the keys satisfies the grouped-map
        # distribution, so no second exchange is added).
        para = df.sparkSession.sparkContext.defaultParallelism
        df = df.repartition(para, *[F.col(c) for c in partition_by])
        grouped = df.groupBy(*partition_by)
    else:
        grouped = df.groupBy(F.lit(1).alias("__g"))
    result = grouped.applyInPandas(_process, schema=out_schema)
    return result

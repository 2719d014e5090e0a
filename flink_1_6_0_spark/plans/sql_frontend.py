"""Flink SQL front-end shim — SURVEY.md §4.3 custom-work item 1.

Flink 1.6 SQL exposes group windows as the table functions
TUMBLE/HOP/SESSION plus the accessors TUMBLE_START/TUMBLE_END/HOP_START/
HOP_END/SESSION_START/SESSION_END (FunctionCatalog.scala:447-461, planned by
DataStreamGroupWindowAggregate.scala:256-354). Spark spells the same
semantics `window(ts, size[, slide])` / `session_window(ts, gap)` with a
struct column exposing `.start`/`.end`.

This module rewrites the Flink spellings into the Spark ones before the
query reaches ``spark.sql`` — a string-level front end, not a Catalyst rule
(Catalyst then plans the windows natively, including whole-stage codegen).

Flink argument order matters: HOP(time, slide, size) → window(time, size,
slide) — slide and size swap positions.
"""

from __future__ import annotations

import re

# INTERVAL '30' MINUTE / INTERVAL '1' HOUR / INTERVAL '0.005' SECOND →
# '30 minutes' / '1 hour' / '0.005 seconds' (Flink SQL allows fractional
# second intervals in group windows — SqlITCase.scala:83's 5ms session gap)
_INTERVAL_RE = re.compile(r"INTERVAL\s+'(\d+(?:\.\d+)?)'\s+(\w+)", re.IGNORECASE)


def _interval_to_duration(expr: str) -> str:
    """Render a Flink interval literal as a Spark duration string."""
    m = _INTERVAL_RE.fullmatch(expr.strip())
    if not m:
        raise ValueError(f"unsupported interval expression in group window: {expr!r}")
    n, unit = m.group(1), m.group(2).lower()
    return f"{n} {unit}" + ("" if unit.endswith("s") else "s" if float(n) != 1 else "")


# A SQL string literal, including the '' escape for an embedded quote —
# simple quote PARITY miscounts 'it''s' as two literals (review finding).
_LITERAL_RE = re.compile(r"'(?:[^']|'')*'")


def _mask_literals(sql: str) -> str:
    """Replace every single-quoted literal with spaces of the same length.

    Offsets are preserved, so positions found in the masked text index the
    original; quotes, parens and keywords inside literals become data."""
    return _LITERAL_RE.sub(lambda m: " " * len(m.group()), sql)


def _split_args(argstr: str) -> list[str]:
    """Split a call's argument list on top-level commas."""
    out, depth, cur = [], 0, []
    for ch in argstr:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


_CALL_RE = re.compile(
    r"\b(TUMBLE_START|TUMBLE_END|TUMBLE_ROWTIME|TUMBLE_PROCTIME|"
    r"HOP_START|HOP_END|HOP_ROWTIME|HOP_PROCTIME|"
    r"SESSION_START|SESSION_END|SESSION_ROWTIME|SESSION_PROCTIME|"
    r"TUMBLE|HOP|SESSION)\s*\(",
    re.IGNORECASE,
)


def _find_call(sql: str, start: int, masked: str | None = None):
    """Find the next Flink group-window call; return (name, args, span).

    Same guards as the LATERAL rewriter: matches inside single-quoted
    string literals are data, not syntax (the search and the paren scan run
    over the literal-masked text; argument text is sliced from the
    original), and an unbalanced paren scan raises instead of silently
    rewriting a truncated span."""
    if masked is None:
        masked = _mask_literals(sql)
    m = _CALL_RE.search(masked, start)
    if not m:
        return None
    depth, i = 1, m.end()
    while i < len(masked) and depth:
        if masked[i] == "(":
            depth += 1
        elif masked[i] == ")":
            depth -= 1
        i += 1
    if depth:
        raise ValueError(
            f"unbalanced parentheses in group-window call at offset {m.start()}: "
            f"{sql[m.start():m.start() + 60]!r}"
        )
    return m.group(1).upper(), sql[m.end() : i - 1], (m.start(), i)


def _render(name: str, args: list[str], bare: bool = False) -> str:
    """Render one group-window call. ``bare=True`` (post-aggregate contexts:
    HAVING / ORDER BY) references the GROUPING ATTRIBUTE (`window` /
    `session_window`) instead of re-computing the window over the time
    column — after the aggregate the time column no longer exists, only the
    grouped window struct does (SqlITCase.scala:666 testHopStartEndWithHaving
    puts HOP_START inside HAVING)."""
    base, _, accessor = name.partition("_")
    if base == "TUMBLE":
        ts, size = args
        core = f"window({ts}, '{_interval_to_duration(size)}')"
    elif base == "HOP":
        ts, slide, size = args  # Flink order: (time, slide, size)
        core = f"window({ts}, '{_interval_to_duration(size)}', '{_interval_to_duration(slide)}')"
    elif base == "SESSION":
        ts, gap = args
        core = f"session_window({ts}, '{_interval_to_duration(gap)}')"
    else:
        raise ValueError(f"unknown group window function {name}")
    if bare:
        core = "session_window" if base == "SESSION" else "window"
    if not accessor:
        return core
    if accessor in ("START", "ROWTIME"):  # *_ROWTIME is the window end-1ms; we expose start/end
        return f"{core}.start" if accessor == "START" else f"{core}.end - INTERVAL 1 MILLISECOND"
    if accessor in ("END", "PROCTIME"):
        return f"{core}.end"
    raise ValueError(f"unknown accessor {name}")


# Flink correlate spelling: [LEFT JOIN] LATERAL TABLE(f(args)) — Spark's
# native form drops the TABLE() wrapper (the function call itself is the
# lateral table reference; Spark plans it as a Generate, the same dataflow
# as the reference's DataStreamCorrelate.scala:38).
_LATERAL_TABLE_RE = re.compile(r"\bLATERAL\s+TABLE\s*\(", re.IGNORECASE)


def _rewrite_lateral_table(sql: str) -> str:
    """``LATERAL TABLE(f(x))`` → ``LATERAL f(x)`` (balanced-paren unwrap;
    trailing ``AS T(cols)`` aliases and ``ON TRUE`` join conditions pass
    through — Spark accepts both spellings).

    Matches inside single-quoted string literals are left alone, and an
    unbalanced paren scan raises instead of silently truncating (round-3
    ADVICE)."""
    pos = 0
    while True:
        # a match inside a single-quoted literal is data, not syntax — search
        # and paren-scan the literal-masked text (recomputed per rewrite
        # since sql mutates); slice the rewritten text from the original
        masked = _mask_literals(sql)
        m = _LATERAL_TABLE_RE.search(masked, pos)
        if not m:
            return sql
        depth, i = 1, m.end()
        while i < len(masked) and depth:
            if masked[i] == "(":
                depth += 1
            elif masked[i] == ")":
                depth -= 1
            i += 1
        if depth:
            raise ValueError(
                f"unbalanced parentheses after LATERAL TABLE( at offset {m.start()}: {sql[m.start():m.start()+60]!r}"
            )
        inner = sql[m.end() : i - 1].strip()
        sql = sql[: m.start()] + "LATERAL " + inner + sql[i:]
        pos = m.start()


def rewrite_flink_sql(sql: str) -> str:
    """Rewrite TUMBLE/HOP/SESSION(+accessors) to window()/session_window()
    and LATERAL TABLE(f(x)) to Spark's native lateral table-function call.

    GROUP BY window(...) and SELECT window(...).start work directly in Spark
    SQL because identical window() calls unify into one grouping expression.
    Non-window SQL passes through untouched.
    """
    sql = _rewrite_lateral_table(sql)
    # Accessors after the OUTER query's HAVING run post-aggregate: reference
    # the grouped window attribute instead of re-computing window(ts, ...).
    # Scoping rules (review findings across r3/r11/r12): a call is rendered
    # bare only when a HAVING in the SAME SUBQUERY SCOPE precedes it with no
    # same-scope set operator (UNION/INTERSECT/EXCEPT — a new SELECT) in
    # between. Scope = the stack of enclosing `( SELECT …` parens in the
    # literal-masked text: a subquery nested in the HAVING opens a fresh
    # scope with its own time column, while a plain function call like
    # QUARTER(HOP_START(…)) does NOT (SqlITCase.scala:666 wraps the HAVING
    # accessor in QUARTER; the r12 depth-0 rule broke it — depth counts
    # function parens, scope must not).
    masked = _mask_literals(sql)

    # scope_at[i] = the stack of enclosing `( SELECT …` parens; depth_at[i] =
    # ALL enclosing parens. `\s*SELECT\b` (anchored match, no tail copy) so
    # identifiers like `selectivity` don't open phantom scopes.
    _select_after = re.compile(r"\s*SELECT\b", re.IGNORECASE)
    scope_at: dict[int, tuple[int, ...]] = {}
    depth_at: dict[int, int] = {}
    scope_base_depth: dict[tuple[int, ...], int] = {(): 0}
    paren_stack: list[bool] = []  # is-subquery flag per open paren
    cur_scope: tuple[int, ...] = ()
    for i, ch in enumerate(masked):
        scope_at[i] = cur_scope
        depth_at[i] = len(paren_stack)
        if ch == "(":
            is_sub = _select_after.match(masked, i + 1) is not None
            paren_stack.append(is_sub)
            if is_sub:
                cur_scope = cur_scope + (i,)
                scope_base_depth.setdefault(cur_scope, len(paren_stack))
        elif ch == ")" and paren_stack:
            if paren_stack.pop():
                cur_scope = cur_scope[:-1]

    def _scoped(pattern: str, top_level_only: bool) -> list[tuple[int, tuple[int, ...]]]:
        # top_level_only: the token must sit directly in its scope's SELECT
        # body, not nested in expression parens — a UNION inside
        # `HAVING x IN ((SELECT …) UNION (SELECT …))` is a compound-subquery
        # operator, not a branch boundary of THIS scope.
        hits = []
        for m in re.finditer(pattern, masked, re.IGNORECASE):
            sc = scope_at[m.start()]
            if not top_level_only or depth_at[m.start()] == scope_base_depth.get(sc, 0):
                hits.append((m.start(), sc))
        return hits

    havings = _scoped(r"\bHAVING\b", top_level_only=True)
    setops = _scoped(r"\b(?:UNION|INTERSECT|EXCEPT)\b", top_level_only=True)

    def _is_bare(s: int) -> bool:
        sc = scope_at[s]
        h = max((p for p, psc in havings if p < s and psc == sc), default=None)
        return h is not None and not any(
            h < p < s and psc == sc for p, psc in setops
        )

    out, pos = [], 0
    while True:
        hit = _find_call(sql, pos, masked)
        if hit is None:
            out.append(sql[pos:])
            break
        name, argstr, (s, e) = hit
        out.append(sql[pos:s])
        out.append(_render(name, _split_args(argstr), bare=_is_bare(s)))
        pos = e
    return "".join(out)

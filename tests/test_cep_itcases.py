"""Golden-output ports of the reference's CEP NFA ITCases.

Each test reproduces one reference scenario VERBATIM — same events (id,
name, price) at the same integer timestamps, same pattern, and the exact
expected match set from its ``compareMaps`` call — and cites the Java test
(file:line). This is the reference's own acceptance suite for quantifier /
contiguity / until / not-pattern semantics, replayed against our batch
executor (SURVEY.md §5 layer 4).

Conventions: matches are compared as sets of event-id tuples in stage
order (looping stages flattened in accept order — exactly the reference's
List<Event> per match). Filler events the reference gives duplicate id 23
get distinct ids here (they never appear in any match; ids are only labels).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_1_6_0_spark.streaming.cep import Pattern, cep_batch

# ConsecutiveData (TimesRangeITCase.java:606, UntilConditionITCase /
# GreedyITCase use the same shape): c a a a b with ascending prices.
S = (40, "c", 1.0)
M1 = (41, "a", 2.0)
M2 = (42, "a", 3.0)
M3 = (43, "a", 4.0)
E = (44, "b", 5.0)


def _f(eid: int):  # filler: never matches any condition
    return (eid, "f", 1.0)


def run_cep(spark, timed_events, pattern):
    """timed_events: list of ((id, name, price), ts_seconds) — the Java
    StreamRecord list. Returns the set of matches, each a tuple of event
    ids in stage order (loop stages flattened)."""
    rows = [(e[0], e[1], e[2], ts) for e, ts in timed_events]
    df = (
        spark.createDataFrame(rows, "event_id long, name string, price double, tsec long")
        .withColumn("k", F.lit(1))
        .withColumn("ts", F.col("tsec").cast("timestamp"))
    )
    out = cep_batch(df, pattern, ["k"], "ts", "event_id")
    got = set()
    for r in out.collect():
        match = []
        for st in pattern.stages:
            if getattr(st, "negated", False):  # GroupStage has no negated
                continue
            if st.emits_array:
                match.extend(r[f"{st.name}_ids"])
            else:
                v = r[f"{st.name}_id"]
                if v is not None:  # optional stage that matched nothing
                    match.append(v)
        got.add(tuple(match))
    return got


def ids(*events):
    return tuple(e[0] for e in events)


def name_is(n):
    return lambda e: e["name"] == n


# ---------------------------------------------------------------------------
# TimesRangeITCase.java — times(from, to) across contiguity modes
# ---------------------------------------------------------------------------

_TR_INPUT = [(S, 1), (_f(23), 2), (M1, 3), (_f(24), 4), (M2, 5), (M3, 6), (E, 7)]


def test_times_range(spark):
    """TimesRangeITCase.java:45 — next.times(1,3).allowCombinations."""
    p = (
        Pattern.begin("start", name_is("c"))
        .next("middle", name_is("a")).times(1, 3).allow_combinations()
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (M1, 2), (M2, 3), (M3, 4), (E, 6)]
    assert run_cep(spark, inp, p) == {
        ids(S, M1, M2, M3, E), ids(S, M1, M2, E), ids(S, M1, M3, E), ids(S, M1, E),
    }


def test_times_range_from_zero(spark):
    """TimesRangeITCase.java:96 — next.times(0,2).allowCombinations."""
    p = (
        Pattern.begin("start", name_is("c"))
        .next("middle", name_is("a")).times(0, 2).allow_combinations()
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (M1, 2), (M2, 3), (M3, 4), (E, 6)]
    assert run_cep(spark, inp, p) == {
        ids(S, M1, M2, E), ids(S, M1, M3, E), ids(S, M1, E), ids(S, E),
    }


def test_times_range_non_strict(spark):
    """TimesRangeITCase.java:147 — followedByAny.times(1,3).allowCombinations."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).times(1, 3).allow_combinations()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _TR_INPUT, p) == {
        ids(S, M1, M2, M3, E), ids(S, M1, M2, E), ids(S, M1, M3, E),
        ids(S, M2, M3, E), ids(S, M1, E), ids(S, M2, E), ids(S, M3, E),
    }


def test_times_range_strict(spark):
    """TimesRangeITCase.java:197 — followedByAny.times(0,3).consecutive."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).times(0, 3).consecutive()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _TR_INPUT, p) == {
        ids(S, M2, M3, E), ids(S, M1, E), ids(S, M2, E), ids(S, M3, E), ids(S, E),
    }


def test_times_range_strict_optional(spark):
    """TimesRangeITCase.java:245 — followedByAny.times(1,3).consecutive.optional."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).times(1, 3).consecutive().optional()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _TR_INPUT, p) == {
        ids(S, M2, M3, E), ids(S, M1, E), ids(S, M2, E), ids(S, M3, E), ids(S, E),
    }


def test_times_range_strict_optional1(spark):
    """TimesRangeITCase.java:293 — next.times(1,3).consecutive.optional;
    adjacency is POSITIONAL (a1@3 a2@5 a3@6 are consecutive received
    events despite the timestamp gaps)."""
    p = (
        Pattern.begin("start", name_is("c"))
        .next("middle", name_is("a")).times(1, 3).consecutive().optional()
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (M1, 3), (M2, 5), (M3, 6), (E, 7)]
    assert run_cep(spark, inp, p) == {
        ids(S, M1, M2, M3, E), ids(S, M1, M2, E), ids(S, M1, E), ids(S, E),
    }


def test_times_range_non_strict_optional1(spark):
    """TimesRangeITCase.java:338 — followedBy.times(1,3).optional over
    c f b: only the empty-loop match."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).times(1, 3).optional()
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (_f(23), 2), (E, 7)]
    assert run_cep(spark, inp, p) == {ids(S, E)}


def test_times_range_non_strict_optional2(spark):
    """TimesRangeITCase.java:378 — followedByAny.times(2,3)
    .allowCombinations.optional."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).times(2, 3).allow_combinations().optional()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _TR_INPUT, p) == {
        ids(S, M1, M2, M3, E), ids(S, M1, M2, E), ids(S, M1, M3, E),
        ids(S, M2, M3, E), ids(S, E),
    }


def test_times_range_non_strict_optional3(spark):
    """TimesRangeITCase.java:426 — followedByAny.times(2,3).optional
    (no combinations: only runs over the accepted sequence)."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).times(2, 3).optional()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _TR_INPUT, p) == {
        ids(S, M1, M2, M3, E), ids(S, M1, M2, E), ids(S, M2, M3, E), ids(S, E),
    }


def test_times_range_non_strict_with_next(spark):
    """TimesRangeITCase.java:473 — next.times(2,3).allowCombinations: the
    run must START at the event immediately after the previous stage."""
    p = (
        Pattern.begin("start", name_is("c"))
        .next("middle", name_is("a")).times(2, 3).allow_combinations()
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (M1, 2), (_f(23), 3), (M2, 4), (_f(24), 5), (M3, 6), (E, 7)]
    assert run_cep(spark, inp, p) == {
        ids(S, M1, M2, M3, E), ids(S, M1, M2, E), ids(S, M1, M3, E),
    }


def test_times_range_not_strict_with_followed_by(spark):
    """TimesRangeITCase.java:519 — followedBy.times(2,3): relaxed loop
    without ANY alternatives."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).times(2, 3)
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (M1, 2), (M2, 4), (M3, 6), (E, 7)]
    assert run_cep(spark, inp, p) == {
        ids(S, M1, M2, M3, E), ids(S, M1, M2, E),
    }


def test_times_range_not_strict_with_followed_by_any(spark):
    """TimesRangeITCase.java:562 — followedByAny.times(2,3).allowCombinations."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).times(2, 3).allow_combinations()
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (M1, 2), (M2, 4), (M3, 6), (E, 7)]
    assert run_cep(spark, inp, p) == {
        ids(S, M1, M2, M3, E), ids(S, M1, M2, E), ids(S, M2, M3, E), ids(S, M1, M3, E),
    }


# ---------------------------------------------------------------------------
# UntilConditionITCase.java — until() across quantifier/contiguity modes.
# UNTIL_CONDITION (line 48): price == 5.0. The breaking event also satisfies
# the loop condition (name "a") — until must win.
# ---------------------------------------------------------------------------

U_S = (40, "c", 1.0)
U_M1 = (41, "a", 2.0)
U_M2 = (42, "a", 3.0)
U_M3 = (43, "a", 4.0)
U_BRK = (44, "a", 5.0)
U_IGN = (45, "a", 6.0)


def price_is(p):
    return lambda e: e["price"] == p


def _until_pattern(entry, **mods):
    """begin(c) entry(middle: a).oneOrMore()[mods].until(price==5)
    .followedBy(end: price==5)."""
    p = Pattern.begin("start", name_is("c"))
    p = getattr(p, entry)("middle", name_is("a")).one_or_more()
    if mods.get("combinations"):
        p = p.allow_combinations()
    if mods.get("consecutive"):
        p = p.consecutive()
    if mods.get("optional"):
        p = p.optional()
    p = p.until(price_is(5.0))
    if mods.get("end", True):
        p = p.followed_by("end", price_is(5.0))
    return p


def test_until_followed_by_one_or_more(spark):
    """UntilConditionITCase.java:58."""
    inp = [(U_S, 1), (U_M1, 3), (U_M2, 4), (U_BRK, 6), (U_IGN, 7)]
    assert run_cep(spark, inp, _until_pattern("followed_by")) == {
        ids(U_S, U_M1, U_M2, U_BRK), ids(U_S, U_M1, U_BRK),
    }


def test_until_followed_by_one_or_more_combinations(spark):
    """UntilConditionITCase.java:108."""
    inp = [(U_S, 1), (U_M1, 3), (U_M2, 4), (U_M3, 5), (U_BRK, 6), (U_IGN, 7)]
    assert run_cep(spark, inp, _until_pattern("followed_by", combinations=True)) == {
        ids(U_S, U_M1, U_M2, U_M3, U_BRK), ids(U_S, U_M1, U_M2, U_BRK),
        ids(U_S, U_M1, U_M3, U_BRK), ids(U_S, U_M1, U_BRK),
    }


def test_until_followed_by_one_or_more_consecutive(spark):
    """UntilConditionITCase.java:159."""
    brk = (45, "a", 5.0)
    ign = (46, "a", 6.0)
    inp = [(U_S, 1), (U_M1, 3), (U_M2, 4), (brk, 7), (ign, 8)]
    assert run_cep(spark, inp, _until_pattern("followed_by", consecutive=True)) == {
        ids(U_S, U_M1, U_M2, brk), ids(U_S, U_M1, brk),
    }


def test_until_followed_by_one_or_more_consecutive2(spark):
    """UntilConditionITCase.java:208 — a non-'a' event breaks the strict run."""
    mid_b = (42, "b", 3.0)
    mid_a = (43, "a", 4.0)
    brk = (45, "a", 5.0)
    ign = (46, "a", 6.0)
    inp = [(U_S, 1), (U_M1, 3), (mid_b, 4), (mid_a, 5), (brk, 7), (ign, 8)]
    assert run_cep(spark, inp, _until_pattern("followed_by", consecutive=True)) == {
        ids(U_S, U_M1, brk),
    }


def test_until_followed_by_zero_or_more(spark):
    """UntilConditionITCase.java:258 — oneOrMore.optional: the empty loop
    still reaches the end stage."""
    inp = [(U_S, 1), (U_M1, 3), (U_M2, 4), (U_BRK, 6), (U_IGN, 7)]
    assert run_cep(spark, inp, _until_pattern("followed_by", optional=True)) == {
        ids(U_S, U_M1, U_M2, U_BRK), ids(U_S, U_M1, U_BRK), ids(U_S, U_BRK),
    }


def test_until_followed_by_zero_or_more_combinations(spark):
    """UntilConditionITCase.java:308."""
    inp = [(U_S, 1), (U_M1, 3), (U_M2, 4), (U_M3, 5), (U_BRK, 6), (U_IGN, 7)]
    assert run_cep(
        spark, inp, _until_pattern("followed_by", optional=True, combinations=True)
    ) == {
        ids(U_S, U_M1, U_M2, U_M3, U_BRK), ids(U_S, U_M1, U_M2, U_BRK),
        ids(U_S, U_M1, U_M3, U_BRK), ids(U_S, U_M1, U_BRK), ids(U_S, U_BRK),
    }


def test_until_followed_by_zero_or_more_consecutive(spark):
    """UntilConditionITCase.java:360."""
    brk = (45, "a", 5.0)
    ign = (46, "a", 6.0)
    inp = [(U_S, 1), (U_M1, 3), (U_M2, 4), (brk, 7), (ign, 8)]
    assert run_cep(
        spark, inp, _until_pattern("followed_by", optional=True, consecutive=True)
    ) == {
        ids(U_S, U_M1, U_M2, brk), ids(U_S, U_M1, brk), ids(U_S, brk),
    }


def test_until_followed_by_any_one_or_more(spark):
    """UntilConditionITCase.java:410 — the load-bearing golden: a fresh
    *ANY* loop entry AFTER the until event is legal ((start, middle3)), but
    no run starts ON or crosses the breaking event."""
    m3_after = (45, "a", 6.0)
    inp = [(U_S, 1), (U_M1, 3), (U_M2, 4), (U_BRK, 6), (m3_after, 7)]
    assert run_cep(spark, inp, _until_pattern("followed_by_any", end=False)) == {
        ids(U_S, U_M1, U_M2), ids(U_S, U_M1), ids(U_S, U_M2), ids(U_S, m3_after),
    }


def test_until_followed_by_any_zero_or_more(spark):
    """UntilConditionITCase.java:454 — plus the bare empty-loop match."""
    m3_after = (45, "a", 6.0)
    inp = [(U_S, 1), (U_M1, 3), (U_M2, 4), (U_BRK, 6), (m3_after, 7)]
    assert run_cep(
        spark, inp, _until_pattern("followed_by_any", optional=True, end=False)
    ) == {
        ids(U_S, U_M1, U_M2), ids(U_S, U_M1), ids(U_S, U_M2), ids(U_S, m3_after),
        ids(U_S),
    }


def test_until_with_empty_where(spark):
    """UntilConditionITCase.java:499 — an unconditioned loop consumes
    EVERYTHING until the stop condition fires."""
    mid_d = (43, "d", 1.0)
    inp = [(U_S, 1), (U_M1, 3), (U_M2, 4), (mid_d, 5), (U_BRK, 6), (U_IGN, 7)]
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle").one_or_more().until(price_is(5.0))
    )
    assert run_cep(spark, inp, p) == {
        ids(U_S, U_M1, U_M2, mid_d), ids(U_S, U_M1, U_M2), ids(U_S, U_M1),
    }


def test_iterative_until_one_or_more(spark):
    """UntilConditionITCase.java:542 — the stop condition is an
    IterativeCondition over the loop's own accepted events (stop once the
    accepted prices sum to 6.0)."""
    mid_d = (43, "d", 1.0)
    inp = [(U_S, 1), (U_M1, 3), (U_M2, 4), (mid_d, 5), (U_BRK, 6), (U_IGN, 7)]

    def until_sum(e, ctx):
        return sum(m["price"] for m in ctx.events_for("middle")) == 6.0

    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle").one_or_more().until(until_sum)
    )
    assert run_cep(spark, inp, p) == {
        ids(U_S, U_M1, U_M2, mid_d), ids(U_S, U_M1, U_M2), ids(U_S, U_M1),
    }


# ---------------------------------------------------------------------------
# NotPatternITCase.java — notNext / notFollowedBy across positions,
# quantifiers and contiguity modes.
# ---------------------------------------------------------------------------

N_A1 = (40, "a", 1.0)
N_C1 = (41, "c", 2.0)
N_B1 = (42, "b", 3.0)
N_C2 = (43, "c", 4.0)
N_D = (44, "d", 4.0)


def test_not_next(spark):
    """NotPatternITCase.java:46."""
    p = (
        Pattern.begin("start", name_is("a"))
        .not_next("notPattern", name_is("b"))
        .followed_by_any("middle", name_is("c"))
        .followed_by("end", name_is("d"))
    )
    inp = [(N_A1, 1), (N_C1, 2), (N_B1, 3), (N_C2, 4), (N_D, 5)]
    assert run_cep(spark, inp, p) == {ids(N_A1, N_C1, N_D), ids(N_A1, N_C2, N_D)}


def test_not_next_no_matches(spark):
    """NotPatternITCase.java:102 — b immediately after a kills everything."""
    p = (
        Pattern.begin("start", name_is("a"))
        .not_next("notPattern", name_is("b"))
        .followed_by("middle", name_is("c"))
        .followed_by("end", name_is("d"))
    )
    inp = [(N_A1, 1), (N_B1, 2), (N_C1, 3), (N_C2, 4), (N_D, 5)]
    assert run_cep(spark, inp, p) == set()


def test_not_next_no_matches_at_the_end(spark):
    """NotPatternITCase.java:155 — trailing notNext, violated by the b
    right after every d."""
    p = (
        Pattern.begin("start", name_is("a"))
        .followed_by_any("middle", name_is("c"))
        .followed_by_any("end", name_is("d"))
        .not_next("notPattern", name_is("b"))
    )
    inp = [(N_A1, 1), (N_C1, 2), (N_C2, 3), (N_D, 4), (N_B1, 5)]
    assert run_cep(spark, inp, p) == set()


def test_not_followed_by_itcase(spark):
    """NotPatternITCase.java:208 — only the c BEFORE the b survives."""
    p = (
        Pattern.begin("start", name_is("a"))
        .not_followed_by("notPattern", name_is("b"))
        .followed_by_any("middle", name_is("c"))
        .followed_by("end", name_is("d"))
    )
    inp = [(N_A1, 1), (N_C1, 2), (N_B1, 3), (N_C2, 4), (N_D, 5)]
    assert run_cep(spark, inp, p) == {ids(N_A1, N_C1, N_D)}


def test_not_followed_by_before_optional(spark):
    """NotPatternITCase.java:263 — skipping the optional c extends the
    ¬b region to d (which contains b1), so only (a1,c1,d) survives."""
    p = (
        Pattern.begin("start", name_is("a"))
        .not_followed_by("notPattern", name_is("b"))
        .followed_by_any("middle", name_is("c")).optional()
        .followed_by("end", name_is("d"))
    )
    inp = [(N_A1, 1), (N_C1, 2), (N_B1, 3), (N_C2, 4), (N_D, 5)]
    assert run_cep(spark, inp, p) == {ids(N_A1, N_C1, N_D)}


def test_times_with_not_followed_by(spark):
    """NotPatternITCase.java:318 — the times(2) loop may NOT ignore the c
    that the following notFollowedBy forbids (stop-on-ignore), so the
    (b1,b2) run never forms: zero matches."""
    b_mid1 = (41, "b", 2.0)
    c_mid = (42, "c", 3.0)
    b_mid2 = (43, "b", 4.0)
    d_end = (44, "d", 4.0)
    p = (
        Pattern.begin("start", name_is("a"))
        .followed_by_any("middle", name_is("b")).times(2)
        .not_followed_by("notPattern", name_is("c"))
        .followed_by("end", name_is("d"))
    )
    inp = [(N_A1, 1), (b_mid1, 2), (c_mid, 3), (b_mid2, 4), (d_end, 5)]
    assert run_cep(spark, inp, p) == set()


def test_ignore_state_of_times_with_not_followed_by(spark):
    """NotPatternITCase.java:371 — arrival order is the event order (the
    Java records carry scrambled timestamps; feedNFA processes by arrival)."""
    a1 = (40, "a", 1.0)
    d1 = (41, "d", 6.0)
    e1 = (42, "e", 2.0)
    b1 = (43, "b", 4.0)
    c1 = (44, "c", 3.0)
    c2 = (45, "c", 5.0)
    d2 = (46, "d", 7.0)
    p = (
        Pattern.begin("start", name_is("a"))
        .not_followed_by("notPattern", name_is("c"))
        .followed_by_any("middle", name_is("b")).times(2).optional()
        .followed_by("end", name_is("d"))
    )
    inp = [(a1, 1), (d1, 2), (e1, 3), (b1, 4), (c1, 5), (c2, 6), (d2, 7)]
    assert run_cep(spark, inp, p) == {ids(a1, d1)}


def test_times_with_not_followed_by_after(spark):
    """NotPatternITCase.java:430 — the adjacent (b1,b2) run forms, but the
    gap to the only following d contains a c: zero matches."""
    a1 = (40, "a", 1.0)
    d1 = (41, "d", 6.0)
    e1 = (42, "e", 2.0)
    b1 = (43, "b", 4.0)
    b2 = (44, "b", 5.0)
    c1 = (45, "c", 3.0)
    d2 = (46, "d", 7.0)
    p = (
        Pattern.begin("start", name_is("a"))
        .followed_by_any("middle", name_is("b")).times(2)
        .not_followed_by("notPattern", name_is("c"))
        .followed_by("end", name_is("d"))
    )
    inp = [(a1, 1), (d1, 2), (e1, 3), (b1, 4), (b2, 5), (c1, 6), (d2, 7)]
    assert run_cep(spark, inp, p) == set()


def test_not_followed_by_before_optional_at_the_end(spark):
    """NotPatternITCase.java:487 — the load-bearing golden for trailing-not
    discharge: skipping the optional end emits the bare (a1) even though a
    b arrives later; (a1,c2) stays poisoned by the gap check."""
    a1 = (40, "a", 1.0)
    c1 = (41, "c", 2.0)
    b1 = (42, "b", 3.0)
    c2 = (43, "c", 4.0)
    p = (
        Pattern.begin("start", name_is("a"))
        .not_followed_by("notPattern", name_is("b"))
        .followed_by_any("end", name_is("c")).optional()
    )
    inp = [(a1, 1), (c1, 2), (b1, 3), (c2, 4)]
    assert run_cep(spark, inp, p) == {ids(a1, c1), ids(a1)}


def test_not_followed_by_before_optional_times(spark):
    """NotPatternITCase.java:534 — a not-pattern BEFORE the loop does not
    stop the loop from skipping its events; skipping the whole optional
    loop extends ¬b to d and dies."""
    a1 = (40, "a", 1.0)
    c1 = (41, "c", 2.0)
    b1 = (42, "b", 3.0)
    c2 = (43, "c", 4.0)
    d1 = (44, "d", 4.0)
    p = (
        Pattern.begin("start", name_is("a"))
        .not_followed_by("notPattern", name_is("b"))
        .followed_by_any("middle", name_is("c")).times(2).optional()
        .followed_by("end", name_is("d"))
    )
    inp = [(a1, 1), (c1, 2), (b1, 3), (c2, 4), (d1, 5)]
    assert run_cep(spark, inp, p) == {ids(a1, c1, c2, d1)}


def test_not_followed_by_with_branching_at_start(spark):
    """NotPatternITCase.java:589 — only the a AFTER the poisoning b can
    anchor a match."""
    a1 = (40, "a", 1.0)
    b1 = (41, "b", 3.0)
    c1 = (42, "c", 2.0)
    a2 = (43, "a", 4.0)
    c2 = (44, "c", 5.0)
    d1 = (45, "d", 6.0)
    p = (
        Pattern.begin("start", name_is("a"))
        .not_followed_by("notPattern", name_is("b"))
        .followed_by("middle", name_is("c"))
        .followed_by("end", name_is("d"))
    )
    inp = [(a1, 1), (b1, 2), (c1, 3), (a2, 4), (c2, 5), (d1, 6)]
    assert run_cep(spark, inp, p) == {ids(a2, c2, d1)}


# -- the oneOrMore x not-pattern helper families ----------------------------

NF_A1 = (40, "a", 1.0)
NF_B1 = (41, "b", 2.0)
NF_B2 = (42, "b", 3.0)
NF_B3 = (43, "b", 4.0)
NF_C1 = (44, "c", 5.0)
NF_B4 = (45, "b", 6.0)
NF_B5 = (46, "b", 7.0)
NF_B6 = (47, "b", 8.0)
NF_D1 = (48, "d", 9.0)


@pytest.mark.parametrize("all_matches,expect_any", [(False, False), (True, True)])
def test_not_next_after_one_or_more(spark, all_matches, expect_any):
    """NotPatternITCase.java:661/:667 — the loop cannot ignore the c the
    following notNext forbids; only a fresh ANY entry after c matches."""
    entry = "followed_by_any" if all_matches else "followed_by"
    p = Pattern.begin("a", name_is("a"))
    p = getattr(p, entry)("bs", name_is("b")).one_or_more()
    p = p.not_next("not_c", name_is("c")).followed_by("d", name_is("d"))
    inp = [(NF_A1, 0), (NF_B1, 1), (NF_C1, 2), (NF_B2, 3), (NF_D1, 4)]
    got = run_cep(spark, inp, p)
    assert got == ({ids(NF_A1, NF_B2, NF_D1)} if expect_any else set())


_NF_AFTER_INPUT = [
    (NF_A1, 0), (NF_B1, 1), (NF_B2, 2), (NF_B3, 3), (NF_C1, 4),
    (NF_B4, 5), (NF_B5, 6), (NF_B6, 7), (NF_D1, 8),
]

_NF_AFTER_ANY_EAGER = {
    ids(NF_A1, NF_B4, NF_B5, NF_B6, NF_D1), ids(NF_A1, NF_B4, NF_B5, NF_D1),
    ids(NF_A1, NF_B4, NF_D1), ids(NF_A1, NF_B5, NF_B6, NF_D1),
    ids(NF_A1, NF_B5, NF_D1), ids(NF_A1, NF_B6, NF_D1),
}


@pytest.mark.parametrize(
    "all_matches,eager,expected",
    [
        (False, True, set()),
        (True, True, _NF_AFTER_ANY_EAGER),
        (False, False, set()),
        (True, False, _NF_AFTER_ANY_EAGER | {ids(NF_A1, NF_B4, NF_B6, NF_D1)}),
    ],
    ids=["next-eager", "any-eager", "next-comb", "any-comb"],
)
def test_not_followed_by_after_one_or_more(spark, all_matches, eager, expected):
    """NotPatternITCase.java:725-:750 — runs before the c die on the gap
    check, runs crossing it die on stop-on-ignore; only post-c runs live."""
    entry = "followed_by_any" if all_matches else "followed_by"
    p = Pattern.begin("a", name_is("a"))
    p = getattr(p, entry)("bs", name_is("b")).one_or_more()
    if not eager:
        p = p.allow_combinations()
    p = p.not_followed_by("not_c", name_is("c")).followed_by("d", name_is("d"))
    assert run_cep(spark, _NF_AFTER_INPUT, p) == expected


_NF_BEFORE_INPUT = [
    (NF_A1, 0), (NF_B1, 1), (NF_C1, 2), (NF_B4, 3), (NF_B5, 4), (NF_B6, 5), (NF_D1, 6),
]

_NF_BEFORE_EAGER = {
    ids(NF_A1, NF_B1, NF_B4, NF_B5, NF_B6, NF_D1),
    ids(NF_A1, NF_B1, NF_B4, NF_B5, NF_D1),
    ids(NF_A1, NF_B1, NF_B4, NF_D1),
    ids(NF_A1, NF_B1, NF_D1),
}

_NF_BEFORE_COMB = _NF_BEFORE_EAGER | {
    ids(NF_A1, NF_B1, NF_B4, NF_B6, NF_D1),
    ids(NF_A1, NF_B1, NF_B5, NF_B6, NF_D1),
    ids(NF_A1, NF_B1, NF_B5, NF_D1),
    ids(NF_A1, NF_B1, NF_B6, NF_D1),
}


@pytest.mark.parametrize(
    "all_matches,eager,zero,expected",
    [
        (True, True, False, _NF_BEFORE_EAGER),
        (True, False, False, _NF_BEFORE_COMB),
        (False, True, False, _NF_BEFORE_EAGER),
        (False, False, False, _NF_BEFORE_COMB),
        (False, True, True, _NF_BEFORE_EAGER),
        (False, False, True, _NF_BEFORE_COMB),
        (True, True, True, _NF_BEFORE_EAGER),
        (True, False, True, _NF_BEFORE_COMB),
    ],
    ids=[
        "any-eager-1+", "any-comb-1+", "next-eager-1+", "next-comb-1+",
        "next-eager-0+", "next-comb-0+", "any-eager-0+", "any-comb-0+",
    ],
)
def test_not_followed_by_before_one_or_more(spark, all_matches, eager, zero, expected):
    """NotPatternITCase.java:821-:861 (oneOrMore) and :932-:969 (zeroOrMore)
    — a not-pattern BEFORE the loop constrains entries (every match starts
    at the pre-c b1) but not the loop's internal skipping; the bare
    loop-skipped match never appears because its ¬c region spans the c."""
    p = Pattern.begin("a", name_is("a")).not_followed_by("not_c", name_is("c"))
    entry = "followed_by_any" if all_matches else "followed_by"
    p = getattr(p, entry)("bs", name_is("b")).one_or_more()
    if zero:
        p = p.optional()
    if not eager:
        p = p.allow_combinations()
    p = p.followed_by("d", name_is("d"))
    assert run_cep(spark, _NF_BEFORE_INPUT, p) == expected


# ---------------------------------------------------------------------------
# GreedyITCase.java — greedy() quantifier semantics
# ---------------------------------------------------------------------------

GC = (40, "c", 1.0)
GA1 = (41, "a", 2.0)
GA2 = (42, "a", 2.0)
GA3 = (43, "a", 2.0)
GD = (44, "d", 3.0)
# the until() variants raise a2/a3's price to 3.0 and add a breaker at 4.0
GU1 = (41, "a", 2.0)
GU2 = (42, "a", 3.0)
GU3 = (43, "a", 3.0)
GUX = (46, "a", 4.0)  # until-breaker (price > 3.0)
GUD = (45, "d", 3.0)


def _greedy_star(entry_optional: bool):
    """c a*(greedy) d — GreedyITCase's shared pattern; optional() toggles
    zeroOrMore vs oneOrMore."""
    p = Pattern.begin("start", name_is("c")).followed_by("middle", name_is("a")).one_or_more()
    if entry_optional:
        p = p.optional()
    return p.greedy().followed_by("end", name_is("d"))


def test_greedy_zero_or_more(spark):
    """GreedyITCase.java:44 — c a* d greedy keeps only the maximal run."""
    inp = [(GC, 1), (GA1, 2), (GA2, 3), (GA3, 4), (GD, 5)]
    assert run_cep(spark, inp, _greedy_star(True)) == {ids(GC, GA1, GA2, GA3, GD)}


def test_greedy_zero_or_more_in_between(spark):
    """GreedyITCase.java:93 — dummies between the a's don't break greedy."""
    inp = [(GC, 1), (_f(90), 2), (GA1, 3), (_f(91), 4), (GA2, 5), (_f(92), 6), (GA3, 7), (GD, 8)]
    assert run_cep(spark, inp, _greedy_star(True)) == {ids(GC, GA1, GA2, GA3, GD)}


def test_greedy_zero_or_more_dummy_after_quantifier(spark):
    """GreedyITCase.java:145 — a dummy after the last a ends the greedy run
    there; the maximal run is still the only match."""
    inp = [(GC, 1), (GA1, 2), (GA2, 3), (_f(93), 4), (GD, 5)]
    assert run_cep(spark, inp, _greedy_star(True)) == {ids(GC, GA1, GA2, GD)}


def test_greedy_zero_or_more_dummy_before_quantifier(spark):
    """GreedyITCase.java:193 — no a at all: the zero-repeat match survives."""
    inp = [(GC, 1), (_f(93), 2), (GD, 5)]
    assert run_cep(spark, inp, _greedy_star(True)) == {ids(GC, GD)}


def test_greedy_until_zero_or_more_dummy_after_quantifier(spark):
    """GreedyITCase.java:237 — until(price>3) stops the greedy loop before
    the 4.0 event; the run up to it still matches."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).one_or_more().optional().greedy()
        .until(lambda e: e["price"] > 3.0)
        .followed_by("end", name_is("d"))
    )
    inp = [(GC, 1), (GU1, 2), (GU2, 3), (GU3, 4), (GUX, 5), (GUD, 6)]
    assert run_cep(spark, inp, p) == {ids(GC, GU1, GU2, GU3, GUD)}


def test_greedy_until_zero_or_more_breaker_first(spark):
    """GreedyITCase.java:294 — the until-breaker arrives before any a: the
    loop never accepts, only the zero-repeat match emits."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).one_or_more().optional().greedy()
        .until(lambda e: e["price"] > 3.0)
        .followed_by("end", name_is("d"))
    )
    inp = [(GC, 1), (GUX, 2), (GU1, 3), (GU2, 4), (GU3, 5), (GUD, 6)]
    assert run_cep(spark, inp, p) == {ids(GC, GUD)}


def test_greedy_one_or_more(spark):
    """GreedyITCase.java:351 — c a+ d greedy."""
    inp = [(GC, 1), (GA1, 2), (GA2, 3), (GA3, 4), (GD, 5)]
    assert run_cep(spark, inp, _greedy_star(False)) == {ids(GC, GA1, GA2, GA3, GD)}


def test_greedy_one_or_more_in_between(spark):
    """GreedyITCase.java:400."""
    inp = [(GC, 1), (_f(90), 2), (GA1, 3), (_f(91), 4), (GA2, 5), (_f(92), 6), (GA3, 7), (GD, 8)]
    assert run_cep(spark, inp, _greedy_star(False)) == {ids(GC, GA1, GA2, GA3, GD)}


def test_greedy_one_or_more_dummy_after_quantifier(spark):
    """GreedyITCase.java:452."""
    inp = [(GC, 1), (GA1, 2), (GA2, 3), (_f(93), 4), (GD, 5)]
    assert run_cep(spark, inp, _greedy_star(False)) == {ids(GC, GA1, GA2, GD)}


def test_greedy_one_or_more_dummy_before_quantifier(spark):
    """GreedyITCase.java:500 — no a: oneOrMore cannot match at all."""
    inp = [(GC, 1), (_f(93), 2), (GD, 5)]
    assert run_cep(spark, inp, _greedy_star(False)) == set()


def test_greedy_until_one_or_more_dummy_after_quantifier(spark):
    """GreedyITCase.java:542."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).one_or_more().greedy()
        .until(lambda e: e["price"] > 3.0)
        .followed_by("end", name_is("d"))
    )
    inp = [(GC, 1), (GU1, 2), (GU2, 3), (GU3, 4), (GUX, 5), (GUD, 6)]
    assert run_cep(spark, inp, p) == {ids(GC, GU1, GU2, GU3, GUD)}


def test_greedy_until_one_or_more_breaker_first(spark):
    """GreedyITCase.java:599 — breaker first + mandatory loop = no match."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).one_or_more().greedy()
        .until(lambda e: e["price"] > 3.0)
        .followed_by("end", name_is("d"))
    )
    inp = [(GC, 1), (GUX, 2), (GU1, 3), (GU2, 4), (GU3, 5), (GUD, 6)]
    assert run_cep(spark, inp, p) == set()


def test_greedy_zero_or_more_before_group_pattern(spark):
    """GreedyITCase.java:654 — c a*(greedy) (d e){2} f."""
    c, a1, a2, a3 = (50, "c", 1.0), (51, "a", 1.0), (52, "a", 1.0), (53, "a", 1.0)
    d1, e1, d2, e2, f = (54, "d", 1.0), (55, "e", 1.0), (56, "d", 1.0), (57, "e", 1.0), (58, "f", 3.0)
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).one_or_more().optional().greedy()
        .followed_by_group(
            "grp",
            Pattern.begin("middle1", name_is("d")).followed_by("middle2", name_is("e")),
        ).times(2)
        .followed_by("end", name_is("f"))
    )
    inp = [(c, 1), (a1, 2), (a2, 3), (_f(93), 4), (a3, 5), (d1, 6), (e1, 7), (d2, 8), (e2, 9), (f, 10)]
    assert run_cep(spark, inp, p) == {ids(c, a1, a2, a3, d1, e1, d2, e2, f)}


def test_end_with_zero_or_more_greedy(spark):
    """GreedyITCase.java:726 — a greedy loop at the END of the pattern still
    emits EVERY prefix (there is no following stage to be greedy against)."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("end", name_is("a")).one_or_more().optional().greedy()
    )
    inp = [(GC, 1), (GA1, 2), (GA2, 3), (_f(94), 4), (GA3, 5)]
    assert run_cep(spark, inp, p) == {
        ids(GC), ids(GC, GA1), ids(GC, GA1, GA2), ids(GC, GA1, GA2, GA3),
    }


def test_end_with_zero_or_more_consecutive_greedy(spark):
    """GreedyITCase.java:770 — consecutive() ends the run at the dummy but
    prefixes still emit."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("end", name_is("a")).one_or_more().optional().consecutive().greedy()
    )
    inp = [(GC, 1), (GA1, 2), (GA2, 3), (_f(94), 4), (GA3, 5)]
    assert run_cep(spark, inp, p) == {ids(GC), ids(GC, GA1), ids(GC, GA1, GA2)}


def test_end_with_greedy_times_range(spark):
    """GreedyITCase.java:813 — c a{2,5}(greedy) at the end: every >=2 prefix."""
    a4 = (45, "a", 2.0)
    p = Pattern.begin("start", name_is("c")).followed_by("end", name_is("a")).times(2, 5).greedy()
    inp = [(GC, 1), (GA1, 2), (GA2, 3), (GA3, 4), (a4, 5), (_f(94), 6)]
    assert run_cep(spark, inp, p) == {
        ids(GC, GA1, GA2), ids(GC, GA1, GA2, GA3), ids(GC, GA1, GA2, GA3, a4),
    }


def test_greedy_times_range(spark):
    """GreedyITCase.java:858 — c a{2,5}(greedy) d keeps only the maximal."""
    a4 = (45, "a", 2.0)
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).times(2, 5).greedy()
        .followed_by("end", name_is("d"))
    )
    inp = [(GC, 1), (GA1, 2), (GA2, 3), (GA3, 4), (a4, 5), (GD, 6)]
    assert run_cep(spark, inp, p) == {ids(GC, GA1, GA2, GA3, a4, GD)}


# ---------------------------------------------------------------------------
# TimesOrMoreITCase.java — timesOrMore(n) across contiguity modes
# ---------------------------------------------------------------------------


def test_times_or_more(spark):
    """TimesOrMoreITCase.java:43 — followedBy.timesOrMore(2).allowCombinations."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).times_or_more(2).allow_combinations()
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (M1, 2), (M2, 3), (M3, 4), (E, 6)]
    assert run_cep(spark, inp, p) == {
        ids(S, M1, M2, M3, E), ids(S, M1, M2, E), ids(S, M1, M3, E),
    }


def test_times_or_more_non_strict(spark):
    """TimesOrMoreITCase.java:94 — followedByAny.timesOrMore(2).allowCombinations."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).times_or_more(2).allow_combinations()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _TR_INPUT, p) == {
        ids(S, M1, M2, M3, E), ids(S, M1, M2, E), ids(S, M1, M3, E), ids(S, M2, M3, E),
    }


def test_times_or_more_strict(spark):
    """TimesOrMoreITCase.java:142 — followedByAny.times(2).consecutive."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).times(2).consecutive()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _TR_INPUT, p) == {ids(S, M2, M3, E)}


def test_times_or_more_strict_optional(spark):
    """TimesOrMoreITCase.java:187 — followedByAny.timesOrMore(2).consecutive.optional."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).times_or_more(2).consecutive().optional()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _TR_INPUT, p) == {ids(S, M2, M3, E), ids(S, E)}


def test_times_or_more_strict_optional2(spark):
    """TimesOrMoreITCase.java:233 — next.timesOrMore(2).consecutive.optional;
    adjacency is positional, so M1 M2 M3 are consecutive received events."""
    p = (
        Pattern.begin("start", name_is("c"))
        .next("middle", name_is("a")).times_or_more(2).consecutive().optional()
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (M1, 3), (M2, 5), (M3, 6), (E, 7)]
    assert run_cep(spark, inp, p) == {
        ids(S, M1, M2, M3, E), ids(S, M1, M2, E), ids(S, E),
    }


def test_times_or_more_non_strict_optional(spark):
    """TimesOrMoreITCase.java:278 — followedBy.timesOrMore(2).optional over
    c f b: only the empty-loop match."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).times_or_more(2).optional()
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (_f(23), 2), (E, 7)]
    assert run_cep(spark, inp, p) == {ids(S, E)}


def test_times_or_more_non_strict_optional2(spark):
    """TimesOrMoreITCase.java:319 — followedByAny.timesOrMore(2)
    .allowCombinations.optional."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).times_or_more(2).allow_combinations().optional()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _TR_INPUT, p) == {
        ids(S, M1, M2, M3, E), ids(S, M1, M2, E), ids(S, M1, M3, E),
        ids(S, M2, M3, E), ids(S, E),
    }


def test_times_or_more_non_strict_optional3(spark):
    """TimesOrMoreITCase.java:368 — followedByAny.timesOrMore(2).optional
    (no combinations: runs over the accepted sequence only)."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).times_or_more(2).optional()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _TR_INPUT, p) == {
        ids(S, M1, M2, M3, E), ids(S, M1, M2, E), ids(S, M2, M3, E), ids(S, E),
    }


def test_times_or_more_non_strict_with_next(spark):
    """TimesOrMoreITCase.java:416 — next.timesOrMore(2).allowCombinations."""
    p = (
        Pattern.begin("start", name_is("c"))
        .next("middle", name_is("a")).times_or_more(2).allow_combinations()
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (M1, 2), (_f(23), 3), (M2, 4), (_f(24), 5), (M3, 6), (E, 7)]
    assert run_cep(spark, inp, p) == {
        ids(S, M1, M2, M3, E), ids(S, M1, M2, E), ids(S, M1, M3, E),
    }


def test_times_or_more_not_strict_with_followed_by(spark):
    """TimesOrMoreITCase.java:463 — followedBy.timesOrMore(2) (eager: only
    prefix runs of the accepted sequence)."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).times_or_more(2)
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (M1, 2), (M2, 4), (M3, 6), (E, 7)]
    assert run_cep(spark, inp, p) == {
        ids(S, M1, M2, M3, E), ids(S, M1, M2, E),
    }


def test_times_or_more_not_strict_with_followed_by_any(spark):
    """TimesOrMoreITCase.java:507 — followedByAny.timesOrMore(2).allowCombinations."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).times_or_more(2).allow_combinations()
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (M1, 2), (M2, 4), (M3, 6), (E, 7)]
    assert run_cep(spark, inp, p) == {
        ids(S, M1, M2, M3, E), ids(S, M1, M2, E), ids(S, M2, M3, E), ids(S, M1, M3, E),
    }


# ---------------------------------------------------------------------------
# SameElementITCase.java — identical events fed multiple times. The Java
# suite feeds the SAME Event object repeatedly (equal value + timestamp);
# compareMaps then compares by VALUE, so copies are indistinguishable in the
# goldens. Rows in a DataFrame have no object identity, so our copies get
# distinct ids (41/141/241...); each expected set below is the golden
# re-derived under that labeling — value-collapsing our ids back to the
# Java ids reproduces the golden multiset exactly.
# ---------------------------------------------------------------------------


def test_eager_zero_or_more_same_element(spark):
    """SameElementITCase.java:48 — eager zeroOrMore over duplicate events:
    prefixes of the one eagerly-grown run [m1 m1' m1'' m2 m3 m3']."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).one_or_more().optional()
        .followed_by("end1", name_is("b"))
    )
    c, a1, a1b, a1c = (40, "c", 1.0), (41, "a", 2.0), (141, "a", 2.0), (241, "a", 2.0)
    a2, d, a3, a3b, b = (42, "a", 3.0), (50, "d", 6.0), (43, "a", 4.0), (143, "a", 4.0), (44, "b", 5.0)
    inp = [(c, 1), (a1, 3), (a1b, 3), (a1c, 3), (a2, 4), (d, 5), (a3, 6), (a3b, 6), (b, 7)]
    assert run_cep(spark, inp, p) == {
        ids(c, a1, a1b, a1c, a2, a3, a3b, b),
        ids(c, a1, a1b, a1c, a2, a3, b),
        ids(c, a1, a1b, a1c, a2, b),
        ids(c, a1, a1b, a1c, b),
        ids(c, a1, a1b, b),
        ids(c, a1, b),
        ids(c, b),
    }


def test_clearing_buffer(spark):
    """SameElementITCase.java:106 — plain a.fb(b).fb(c).fb(d) chain (the Java
    test asserts buffer cleanup; output-wise one match)."""
    a1, b1, c1, d1 = (40, "a", 1.0), (41, "b", 2.0), (42, "c", 2.0), (43, "d", 2.0)
    p = (
        Pattern.begin("a", name_is("a"))
        .followed_by("b", name_is("b"))
        .followed_by("c", name_is("c"))
        .followed_by("d", name_is("d"))
    )
    inp = [(a1, 1), (b1, 2), (c1, 2), (d1, 2)]
    assert run_cep(spark, inp, p) == {ids(a1, b1, c1, d1)}


def test_clearing_buffer_with_until_at_the_end(spark):
    """SameElementITCase.java:154 — a.fb(d).oneOrMore().until(iterative: the
    loop already holds 3 d's) — the until ctx sees the run's own accepted
    events; prefixes of the 3-long run emit (loop at pattern end)."""
    a1, d1, d2, d3, d4 = (40, "a", 1.0), (41, "d", 2.0), (141, "d", 2.0), (241, "d", 2.0), (341, "d", 2.0)
    p = (
        Pattern.begin("a", name_is("a"))
        .followed_by("d", name_is("d")).one_or_more()
        .until(lambda e, ctx: len(ctx.events_for("d")) == 3)
    )
    inp = [(a1, 1), (d1, 2), (d2, 2), (d3, 2), (d4, 4)]
    assert run_cep(spark, inp, p) == {
        ids(a1, d1, d2, d3), ids(a1, d1, d2), ids(a1, d1),
    }


def test_zero_or_more_same_element(spark):
    """SameElementITCase.java:201 — followedByAny zeroOrMore allowCombinations
    over duplicates: every subsequence of the 5 a-copies (32 matches; the
    golden's 32 entries correspond 1:1)."""
    from itertools import combinations

    c, b = (40, "c", 1.0), (44, "b", 5.0)
    a1, a1a, a2, a3, a3a = (41, "a", 2.0), (141, "a", 2.0), (42, "a", 3.0), (43, "a", 4.0), (143, "a", 4.0)
    d = (50, "d", 6.0)
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).one_or_more().optional().allow_combinations()
        .followed_by_any("end1", name_is("b"))
    )
    inp = [(c, 1), (a1, 3), (a1a, 3), (a2, 4), (d, 5), (a3, 6), (a3a, 6), (b, 7)]
    mids = [a1[0], a1a[0], a2[0], a3[0], a3a[0]]
    expected = {
        (c[0],) + sub + (b[0],)
        for k in range(6)
        for sub in combinations(mids, k)
    }
    assert run_cep(spark, inp, p) == expected


def test_simple_pattern_w_same_element(spark):
    """SameElementITCase.java:289 — followedByAny single stage matches each
    copy once."""
    c, a1, a1a, b = (40, "c", 1.0), (41, "a", 2.0), (141, "a", 2.0), (44, "b", 5.0)
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a"))
        .followed_by("end1", name_is("b"))
    )
    inp = [(c, 1), (a1, 3), (a1a, 3), (b, 7)]
    assert run_cep(spark, inp, p) == {ids(c, a1, b), ids(c, a1a, b)}


def test_iterative_condition_w_same_element(spark):
    """SameElementITCase.java:335 — end stage's iterative where() sums the
    loop's prices (== 4.0 selects exactly two 2.0-a's). Golden value-multiset
    {[c a a b] x2, [c a a a] x1}: two pair-runs complete on the b, one
    completes on the third a-copy itself (the loop's proceed branch hands the
    copy to the end stage). Which pair pairs with which end is unobservable
    in the Java golden (all copies compare equal); our id labeling fixes the
    executor's deterministic choice."""
    c, a1, a1a, a1b, b = (40, "c", 1.0), (41, "a", 2.0), (141, "a", 2.0), (241, "a", 2.0), (44, "b", 5.0)

    def end_cond(e, ctx):
        return sum(x["price"] for x in ctx.events_for("middle")) == 4.0

    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).one_or_more().optional().allow_combinations()
        .followed_by("end", end_cond)
    )
    inp = [(c, 1), (a1, 3), (a1a, 3), (a1b, 3), (b, 7)]
    assert run_cep(spark, inp, p) == {
        ids(c, a1, a1a, a1b),   # pair (a1,a1a) completed by the third copy
        ids(c, a1, a1b, b),
        ids(c, a1a, a1b, b),
    }


def test_end_w_looping_w_same_element(spark):
    """SameElementITCase.java:411 — followedByAny oneOrMore optional at the
    END: per-entry eager prefixes (entry m1: 3 prefixes; m1a: 2; m1b: 1)
    plus the empty match — the golden's 7, no (m1, m1b) skip-run."""
    c, a1, a1a, a1b = (40, "c", 1.0), (41, "a", 2.0), (141, "a", 2.0), (241, "a", 2.0)
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).one_or_more().optional()
    )
    inp = [(c, 1), (a1, 3), (a1a, 3), (a1b, 3), ((44, "b", 5.0), 7)]
    assert run_cep(spark, inp, p) == {
        ids(c),
        ids(c, a1), ids(c, a1a), ids(c, a1b),
        ids(c, a1, a1a), ids(c, a1a, a1b),
        ids(c, a1, a1a, a1b),
    }


def test_repeating_pattern_w_same_element(spark):
    """SameElementITCase.java:448 — c · a*(eager) · b? · a with a duplicate
    first a: all 8 golden combinations of loop-prefix x optional-b."""
    # copy ids chosen to keep the Java insertion order under the executor's
    # same-timestamp (ts, id) tiebreak: m11 < m11b < m12 all at ts 3
    c = (40, "c", 1.0)
    m11, m11b, m12 = (41, "a", 2.0), (42, "a", 2.0), (43, "a", 3.0)
    d, m2, m13 = (50, "d", 6.0), (44, "b", 5.0), (45, "a", 4.0)
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle1", name_is("a")).one_or_more().optional()
        .followed_by("middle2", name_is("b")).optional()
        .followed_by("end", name_is("a"))
    )
    inp = [(c, 1), (m11, 3), (m11b, 3), (m12, 3), (d, 5), (m2, 6), (m13, 7)]
    assert run_cep(spark, inp, p) == {
        ids(c, m11),
        ids(c, m11, m11b),
        ids(c, m2, m13),
        ids(c, m11, m11b, m12),
        ids(c, m11, m2, m13),
        ids(c, m11, m11b, m12, m13),
        ids(c, m11, m11b, m2, m13),
        ids(c, m11, m11b, m12, m2, m13),
    }


# ---------------------------------------------------------------------------
# IterativeConditionsITCase.java — ctx-dependent predicates. compareMaps
# sorts events within each match, so these goldens compare as per-match
# MULTISETS of events (sorted id tuples below). SubEvent subtyping is
# encoded in the name column (every SubEvent here is foo*, every base event
# isn't), matching the Java conditions' startsWith("foo") guards.
# ---------------------------------------------------------------------------


def sids(got):
    return {tuple(sorted(m)) for m in got}


def _branching_pattern(eager: bool):
    def middle_cond(e, ctx):
        if not e["name"].startswith("foo"):
            return False
        return sum(x["price"] for x in ctx.events_for("middle")) + e["price"] < 5.0

    p = Pattern.begin("start", name_is("start")).followed_by("middle", middle_cond).one_or_more()
    if not eager:
        p = p.allow_combinations()
    return p.followed_by("end", name_is("end"))


_ITER_BRANCH_INPUT = [
    ((40, "start", 1.0), 1), ((41, "foo1", 1.0), 2), ((42, "foo2", 2.0), 3),
    ((140, "start", 2.0), 4), ((43, "foo3", 3.0), 5), ((143, "foo4", 1.0), 5),
    ((44, "next-one", 1.0), 6), ((46, "end", 1.0), 8),
]


def test_iterative_with_branching_pattern_eager(spark):
    """IterativeConditionsITCase.java:59 — running-sum loop condition, eager."""
    got = run_cep(spark, _ITER_BRANCH_INPUT, _branching_pattern(True))
    assert sids(got) == {
        tuple(sorted(t)) for t in [
            (40, 41, 42, 143, 46), (40, 41, 42, 46), (40, 41, 46),
            (140, 43, 143, 46), (140, 43, 46),
        ]
    }


def test_iterative_with_branching_pattern_combinations(spark):
    """IterativeConditionsITCase.java:74 — same with allowCombinations."""
    got = run_cep(spark, _ITER_BRANCH_INPUT, _branching_pattern(False))
    assert sids(got) == {
        tuple(sorted(t)) for t in [
            (40, 41, 42, 143, 46), (40, 41, 42, 46), (40, 41, 43, 46),
            (140, 43, 143, 46), (40, 41, 143, 46), (40, 41, 46), (140, 43, 46),
        ]
    }


def _looping_start_pattern(eager: bool):
    def start_cond(e, ctx):
        if e["name"] != "start":
            return False
        return sum(x["price"] for x in ctx.events_for("start")) + e["price"] < 5.0

    p = Pattern.begin("start", start_cond).one_or_more()
    if not eager:
        p = p.allow_combinations()
    return p.optional().followed_by("end", name_is("end"))


_ITER_LOOPSTART_INPUT = [
    ((40, "start", 1.0), 1), ((140, "start", 2.0), 2), ((240, "start", 3.0), 3),
    ((46, "end", 1.0), 4),
]


def test_iterative_with_looping_starting_eager(spark):
    """IterativeConditionsITCase.java:164 — iterative loop AT the begin stage."""
    got = run_cep(spark, _ITER_LOOPSTART_INPUT, _looping_start_pattern(True))
    assert sids(got) == {
        tuple(sorted(t)) for t in [
            (40, 140, 46), (40, 46), (140, 46), (240, 46), (46,),
        ]
    }


def test_iterative_with_looping_starting_combination(spark):
    """IterativeConditionsITCase.java:179."""
    got = run_cep(spark, _ITER_LOOPSTART_INPUT, _looping_start_pattern(False))
    assert sids(got) == {
        tuple(sorted(t)) for t in [
            (40, 140, 46), (40, 240, 46), (40, 46), (140, 46), (240, 46), (46,),
        ]
    }


def test_iterative_with_prev_pattern_dependency(spark):
    """IterativeConditionsITCase.java:251 — the END stage's condition sums the
    BEGIN loop's accepted events (run (s1) alone fails the >=2 gate)."""

    def end_cond(e, ctx):
        if e["name"] != "end":
            return False
        return sum(x["price"] for x in ctx.events_for("start")) >= 2.0

    p = Pattern.begin("start", name_is("start")).one_or_more().followed_by("end", end_cond)
    inp = [((40, "start", 1.0), 1), ((140, "start", 2.0), 2), ((46, "end", 1.0), 4)]
    got = run_cep(spark, inp, p)
    assert sids(got) == {tuple(sorted(t)) for t in [(40, 140, 46), (140, 46)]}


def test_iterative_with_abac_pattern(spark):
    """IterativeConditionsITCase.java:295 — A·B(any)·A+(iterative, <=5)·C;
    ids at the shared timestamp chosen to preserve the Java insertion order
    under the executor's (ts, id) tiebreak."""

    def middle2_cond(e, ctx):
        if e["name"] != "start":
            return False
        return sum(x["price"] for x in ctx.events_for("middle2")) + e["price"] <= 5.0

    p = (
        Pattern.begin("start", name_is("start"))
        .followed_by_any("middle1", lambda e: e["name"].startswith("foo"))
        .followed_by("middle2", middle2_cond).one_or_more()
        .followed_by("end", name_is("end"))
    )
    s1, m1, s2, s3 = (40, "start", 1.0), (41, "foo1", 1.0), (42, "start", 2.0), (43, "start", 3.0)
    m2, s4, m3, m4 = (44, "foo2", 2.0), (45, "start", 4.0), (46, "foo3", 3.0), (47, "foo4", 1.0)
    end = (99, "end", 1.0)
    inp = [(s1, 1), (m1, 2), (s2, 2), (s3, 2), (m2, 2), (s4, 2), (m3, 2), (m4, 2), (end, 4)]
    got = run_cep(spark, inp, p)
    assert sids(got) == {
        tuple(sorted(t)) for t in [
            (40, 42, 43, 41, 99), (40, 41, 42, 99), (40, 44, 45, 99),
            (42, 44, 45, 99), (43, 44, 45, 99),
        ]
    }


def test_iterative_with_prev_pattern_dependency_after_branching(spark):
    """IterativeConditionsITCase.java:365 — begin loop + followedByAny
    branching; the final ANY stage's condition re-reads the begin loop."""

    def end_cond(e, ctx):
        if e["name"] != "end":
            return False
        return sum(x["price"] for x in ctx.events_for("start")) >= 2.0

    p = (
        Pattern.begin("start", name_is("start")).one_or_more()
        .followed_by_any("middle1", lambda e: e["name"].startswith("foo"))
        .followed_by_any("end", end_cond)
    )
    s1, s2, m1 = (40, "start", 1.0), (41, "start", 2.0), (51, "foo1", 1.0)
    s3, m2, end = (42, "start", 3.0), (52, "foo2", 2.0), (99, "end", 1.0)
    inp = [(s1, 1), (s2, 2), (m1, 4), (s3, 5), (m2, 6), (end, 7)]
    got = run_cep(spark, inp, p)
    assert sids(got) == {
        tuple(sorted(t)) for t in [
            (40, 41, 51, 99), (41, 51, 99), (40, 41, 52, 99),
            (40, 41, 42, 52, 99), (41, 42, 52, 99), (41, 52, 99), (42, 52, 99),
        ]
    }


# ---------------------------------------------------------------------------
# AfterMatchSkipITCase.java — AfterMatchSkipStrategy pruning. The reference
# emits completed matches in START order (a completed match is held until
# every earlier-started partial resolves — NFA.java processMatchesAccording-
# ToSkipStrategy), then prunes later matches whose start precedes the
# strategy's pruning point; _apply_skip replays exactly that.
# ---------------------------------------------------------------------------


def _seq(*evts):
    """Events at ts 1,2,3,... (the Java tests feed StreamRecords without
    timestamps; only relative order matters — no within())."""
    return [(e, i + 1) for i, e in enumerate(evts)]


def test_skip_to_next(spark):
    """AfterMatchSkipITCase.java:47 — noSkip times(3) over six a's: every
    anchored contiguous triple."""
    a = [(i, "a", 0.0) for i in range(1, 7)]
    p = Pattern.begin("start", name_is("a")).times(3)
    assert run_cep(spark, _seq(*a), p) == {
        ids(a[0], a[1], a[2]), ids(a[1], a[2], a[3]),
        ids(a[2], a[3], a[4]), ids(a[3], a[4], a[5]),
    }


def test_skip_past_last(spark):
    """AfterMatchSkipITCase.java:86 — skipPastLastEvent times(3)."""
    a = [(i, "a", 0.0) for i in range(1, 7)]
    p = Pattern.begin("start", name_is("a")).times(3).skip_past_last_event()
    assert run_cep(spark, _seq(*a), p) == {
        ids(a[0], a[1], a[2]), ids(a[3], a[4], a[5]),
    }


def name_has(sub):
    return lambda e: sub in e["name"]


def test_skip_to_first(spark):
    """AfterMatchSkipITCase.java:123 — skipToFirst('end') over ab{2} next
    b{2}: the second window may reuse the first match's end events."""
    ab = [(i, "ab", 0.0) for i in range(1, 7)]
    p = (
        Pattern.begin("start", name_has("a")).times(2)
        .next("end", name_has("b")).times(2)
        .skip_to_first("end")
    )
    assert run_cep(spark, _seq(*ab), p) == {
        ids(ab[0], ab[1], ab[2], ab[3]), ids(ab[2], ab[3], ab[4], ab[5]),
    }


def test_skip_to_last(spark):
    """AfterMatchSkipITCase.java:167 — skipToLast('end')."""
    ab = [(i, "ab", 0.0) for i in range(1, 8)]
    p = (
        Pattern.begin("start", name_has("a")).times(2)
        .next("end", name_has("b")).times(2)
        .skip_to_last("end")
    )
    assert run_cep(spark, _seq(*ab), p) == {
        ids(ab[0], ab[1], ab[2], ab[3]), ids(ab[3], ab[4], ab[5], ab[6]),
    }


def test_skip_past_last2(spark):
    """AfterMatchSkipITCase.java:210 — branching a·b(any)·c(any)·d collapses
    to the single earliest-start match under skipPastLastEvent."""
    a1, a2 = (1, "a1", 0.0), (2, "a2", 0.0)
    b1, b2 = (3, "b1", 0.0), (4, "b2", 0.0)
    c1, c2 = (5, "c1", 0.0), (6, "c2", 0.0)
    d1, d2 = (7, "d1", 0.0), (8, "d2", 0.0)
    p = (
        Pattern.begin("a", name_has("a"))
        .followed_by_any("b", name_has("b"))
        .followed_by_any("c", name_has("c"))
        .followed_by("d", name_has("d"))
        .skip_past_last_event()
    )
    assert run_cep(spark, _seq(a1, a2, b1, b2, c1, c2, d1, d2), p) == {ids(a1, b1, c1, d1)}


def test_skip_past_last3(spark):
    """AfterMatchSkipITCase.java:267 — a next b; only (a2, b2) matches."""
    a1, c, a2, b2 = (1, "a1", 0.0), (2, "c", 0.0), (3, "a2", 0.0), (4, "b2", 0.0)
    p = Pattern.begin("a", name_has("a")).next("b", name_has("b")).skip_past_last_event()
    assert run_cep(spark, _seq(a1, c, a2, b2), p) == {ids(a2, b2)}


def test_skip_to_first_with_optional_match(spark):
    """AfterMatchSkipITCase.java:306 — skip target on an optional loop that
    never matches: pruning id is absent, nothing is skipped."""
    ab1, c1, ab2, c2 = (1, "ab1", 0.0), (2, "c1", 0.0), (3, "ab2", 0.0), (4, "c2", 0.0)
    p = (
        Pattern.begin("x", name_has("x")).one_or_more().optional()
        .next("b", name_has("b"))
        .next("c", name_has("c"))
        .skip_to_first("b")
    )
    assert run_cep(spark, _seq(ab1, c1, ab2, c2), p) == {ids(ab1, c1), ids(ab2, c2)}


def test_skip_to_first_at_start_position(spark):
    """AfterMatchSkipITCase.java:351 — skipToFirst of the BEGIN stage is the
    match's own start: prunes nothing."""
    ab1, c1, ab2, c2 = (1, "ab1", 0.0), (2, "c1", 0.0), (3, "ab2", 0.0), (4, "c2", 0.0)
    p = (
        Pattern.begin("b", name_has("b")).next("c", name_has("c")).skip_to_first("b")
    )
    assert run_cep(spark, _seq(ab1, c1, ab2, c2), p) == {ids(ab1, c1), ids(ab2, c2)}


_SKIP_OOM_EVENTS = [
    (1, "a1", 0.0), (2, "b1", 0.0), (3, "a2", 0.0), (4, "b2", 0.0),
    (5, "b3", 0.0), (6, "a3", 0.0), (7, "b4", 0.0),
]


def test_skip_to_first_with_one_or_more(spark):
    """AfterMatchSkipITCase.java:390 — the growing (a2 b2 b3) continuation is
    pruned the moment (a2 b2) emits (its start precedes the pruning point)."""
    p = (
        Pattern.begin("a", name_has("a"))
        .next("b", name_has("b")).one_or_more().consecutive()
        .skip_to_first("b")
    )
    e = _SKIP_OOM_EVENTS
    assert run_cep(spark, _seq(*e), p) == {ids(e[0], e[1]), ids(e[2], e[3]), ids(e[5], e[6])}


def test_skip_to_last_with_one_or_more(spark):
    """AfterMatchSkipITCase.java:436 — same with skipToLast('b')."""
    p = (
        Pattern.begin("a", name_has("a"))
        .next("b", name_has("b")).one_or_more().consecutive()
        .skip_to_last("b")
    )
    e = _SKIP_OOM_EVENTS
    assert run_cep(spark, _seq(*e), p) == {ids(e[0], e[1]), ids(e[2], e[3]), ids(e[5], e[6])}


_SKIP_DOC_EVENTS = [(1, "a1", 0.0), (2, "a2", 0.0), (3, "a3", 0.0), (4, "b1", 0.0)]


def _doc_pattern():
    return (
        Pattern.begin("a", name_has("a")).one_or_more().consecutive().greedy()
        .next("b", name_has("b"))
    )


def test_skip_past_last_with_one_or_more_at_beginning(spark):
    """AfterMatchSkipITCase.java:483 (docs example) — a+ greedy next b."""
    e = _SKIP_DOC_EVENTS
    p = _doc_pattern().skip_past_last_event()
    assert run_cep(spark, _seq(*e), p) == {ids(e[0], e[1], e[2], e[3])}


def test_skip_to_last_with_one_or_more_at_beginning(spark):
    """AfterMatchSkipITCase.java:523 (docs example)."""
    e = _SKIP_DOC_EVENTS
    p = _doc_pattern().skip_to_last("a")
    assert run_cep(spark, _seq(*e), p) == {
        ids(e[0], e[1], e[2], e[3]), ids(e[2], e[3]),
    }


def test_skip_to_first_with_one_or_more_at_beginning(spark):
    """AfterMatchSkipITCase.java:564 (docs example) — skip to own start."""
    e = _SKIP_DOC_EVENTS
    p = _doc_pattern().skip_to_first("a")
    assert run_cep(spark, _seq(*e), p) == {
        ids(e[0], e[1], e[2], e[3]), ids(e[1], e[2], e[3]), ids(e[2], e[3]),
    }


def test_no_skip_with_one_or_more_at_beginning(spark):
    """AfterMatchSkipITCase.java:606 (docs example) — greedy begin-loop emits
    one maximal run per anchor."""
    e = _SKIP_DOC_EVENTS
    assert run_cep(spark, _seq(*e), _doc_pattern()) == {
        ids(e[0], e[1], e[2], e[3]), ids(e[1], e[2], e[3]), ids(e[2], e[3]),
    }


def test_skip_to_first_discarding(spark):
    """AfterMatchSkipITCase.java:648 (docs example) — (a|c)·(b|c)·c+·d."""
    a, b = (1, "a", 0.0), (2, "b", 0.0)
    c1, c2, c3, d = (3, "c1", 0.0), (4, "c2", 0.0), (5, "c3", 0.0), (6, "d", 0.0)

    p = (
        Pattern.begin("a_or_c", lambda e: "a" in e["name"] or "c" in e["name"])
        .followed_by("b_or_c", lambda e: "b" in e["name"] or "c" in e["name"])
        .followed_by("cstar", name_has("c")).one_or_more().greedy()
        .followed_by("d", name_has("d"))
        .skip_to_first("cstar")
    )
    assert run_cep(spark, _seq(a, b, c1, c2, c3, d), p) == {
        ids(a, b, c1, c2, c3, d), ids(c1, c2, c3, d),
    }


def test_skip_before_other_already_completed(spark):
    """AfterMatchSkipITCase.java:708 — a completed later-start match must not
    prune an earlier-start partial that completes afterwards: emission is
    START-ordered (held until earlier partials resolve), so (a1 c1 b2) emits
    first and its pruning point spares (a2 c2 b1)."""
    a1, c1 = (1, "a1", 0.0), (2, "c1", 0.0)
    a2, c2 = (3, "a2", 1.0), (4, "c2", 0.0)
    b1, b2 = (5, "b1", 1.0), (6, "b2", 0.0)

    def b_cond(e, ctx):
        return "b" in e["name"] and ctx.events_for("a")[0]["price"] == e["price"]

    p = (
        Pattern.begin("a", name_has("a"))
        .followed_by("c", name_has("c"))
        .followed_by("b", b_cond)
        .skip_to_first("c")
    )
    assert run_cep(spark, _seq(a1, c1, a2, c2, b1, b2), p) == {
        ids(a1, c1, b2), ids(a2, c2, b1),
    }


# ---------------------------------------------------------------------------
# GroupITCase.java — GroupPattern (sub-pattern) quantifiers
# ---------------------------------------------------------------------------

GR_C = (40, "c", 1.0)
GR_A1, GR_B1 = (41, "a", 2.0), (42, "b", 3.0)
GR_A2, GR_B2 = (43, "a", 4.0), (44, "b", 5.0)
GR_A3, GR_B3 = (45, "a", 4.0), (46, "b", 5.0)
GR_D = (47, "d", 6.0)


def _ab_group():
    return Pattern.begin("middle1", name_is("a")).followed_by("middle2", name_is("b"))


_GR_2PAIR = [(GR_C, 1), (GR_A1, 2), (GR_B1, 3), (GR_A2, 4), (GR_B2, 5), (GR_D, 6)]
_GR_3PAIR = [
    (GR_C, 1), (GR_A1, 2), (GR_B1, 3), (GR_A2, 4), (GR_B2, 5),
    (GR_A3, 6), (GR_B3, 7), (GR_D, 8),
]


def test_group_followed_by_times(spark):
    """GroupITCase.java:47 — c (a b){2} d."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_group("grp", _ab_group()).times(2)
        .followed_by("end", name_is("d"))
    )
    assert run_cep(spark, _GR_2PAIR, p) == {ids(GR_C, GR_A1, GR_B1, GR_A2, GR_B2, GR_D)}


def test_group_followed_by_optional(spark):
    """GroupITCase.java:105 — c (a b)? d."""
    c, a1, a2, b, d = (40, "c", 1.0), (41, "a", 2.0), (42, "a", 2.0), (43, "b", 3.0), (44, "d", 4.0)
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_group("grp", _ab_group()).optional()
        .followed_by("end", name_is("d"))
    )
    inp = [(c, 1), (a1, 2), (a2, 3), (b, 4), (d, 5)]
    assert run_cep(spark, inp, p) == {ids(c, d), ids(c, a1, b, d)}


def test_followed_by_group_times_optional(spark):
    """GroupITCase.java:162 — c (a b){2}? d with no completable group."""
    c, a, d = (40, "c", 1.0), (41, "a", 2.0), (45, "d", 3.0)
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_group("grp", _ab_group()).times(2).optional()
        .followed_by("end", name_is("d"))
    )
    assert run_cep(spark, [(c, 1), (a, 2), (d, 3)], p) == {ids(c, d)}


def test_group_followed_by_one_or_more(spark):
    """GroupITCase.java:214 — c (a b)+ d."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_group("grp", _ab_group()).one_or_more()
        .followed_by("end", name_is("d"))
    )
    assert run_cep(spark, _GR_2PAIR, p) == {
        ids(GR_C, GR_A1, GR_B1, GR_D),
        ids(GR_C, GR_A1, GR_B1, GR_A2, GR_B2, GR_D),
    }


def test_group_followed_by_zero_or_more(spark):
    """GroupITCase.java:273 — c (a b)* d."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_group("grp", _ab_group()).one_or_more().optional()
        .followed_by("end", name_is("d"))
    )
    assert run_cep(spark, _GR_2PAIR, p) == {
        ids(GR_C, GR_D),
        ids(GR_C, GR_A1, GR_B1, GR_D),
        ids(GR_C, GR_A1, GR_B1, GR_A2, GR_B2, GR_D),
    }


def test_group_followed_by_any_times_combinations(spark):
    """GroupITCase.java:333 — c any(a b){2}.allowCombinations d: every
    in-order pair of repetitions."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any_group("grp", _ab_group()).times(2).allow_combinations()
        .followed_by("end", name_is("d"))
    )
    assert run_cep(spark, _GR_3PAIR, p) == {
        ids(GR_C, GR_A1, GR_B1, GR_A2, GR_B2, GR_D),
        ids(GR_C, GR_A1, GR_B1, GR_A3, GR_B3, GR_D),
        ids(GR_C, GR_A2, GR_B2, GR_A3, GR_B3, GR_D),
    }


def test_group_followed_by_any_times_optional(spark):
    """GroupITCase.java:397 — c any(a b){2}? d (no combinations: chained
    repetitions only, from every entry)."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any_group("grp", _ab_group()).times(2).optional()
        .followed_by("end", name_is("d"))
    )
    assert run_cep(spark, _GR_3PAIR, p) == {
        ids(GR_C, GR_D),
        ids(GR_C, GR_A1, GR_B1, GR_A2, GR_B2, GR_D),
        ids(GR_C, GR_A2, GR_B2, GR_A3, GR_B3, GR_D),
    }


def test_group_followed_by_any_one_or_more(spark):
    """GroupITCase.java:461 — c any(a b){1,} d."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any_group("grp", _ab_group()).one_or_more()
        .followed_by("end", name_is("d"))
    )
    assert run_cep(spark, _GR_3PAIR, p) == {
        ids(GR_C, GR_A1, GR_B1, GR_D),
        ids(GR_C, GR_A2, GR_B2, GR_D),
        ids(GR_C, GR_A3, GR_B3, GR_D),
        ids(GR_C, GR_A1, GR_B1, GR_A2, GR_B2, GR_D),
        ids(GR_C, GR_A2, GR_B2, GR_A3, GR_B3, GR_D),
        ids(GR_C, GR_A1, GR_B1, GR_A2, GR_B2, GR_A3, GR_B3, GR_D),
    }


def test_group_next_zero_or_more(spark):
    """GroupITCase.java:528 — c next (a b)*.consecutive d."""
    c = (40, "c", 1.0)
    a1, b1 = (41, "a", 2.0), (42, "b", 3.0)
    a2, b2 = (43, "a", 3.0), (44, "b", 3.0)
    a3, b3 = (45, "a", 4.0), (46, "b", 3.0)
    d = (47, "d", 1.0)
    p = (
        Pattern.begin("start", name_is("c"))
        .next_group("grp", _ab_group()).one_or_more().optional().consecutive()
        .followed_by("end", name_is("d"))
    )
    inp = [(c, 1), (a1, 3), (b1, 4), (a2, 5), (b2, 6), (a3, 7), (b3, 8), (d, 9)]
    assert run_cep(spark, inp, p) == {
        ids(c, d),
        ids(c, a1, b1, d),
        ids(c, a1, b1, a2, b2, d),
        ids(c, a1, b1, a2, b2, a3, b3, d),
    }


_GR_NOT_INPUT = [
    ((40, "c", 1.0), 1), ((41, "a", 2.0), 2), ((42, "b", 3.0), 3),
    ((43, "d", 3.0), 4), ((44, "a", 4.0), 5), ((45, "b", 5.0), 6),
    ((46, "e", 6.0), 7),
]


def test_group_not_followed_by(spark):
    """GroupITCase.java:593 — c any(a b) ¬d e: the pair before the d is
    poisoned."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any_group("grp", _ab_group())
        .not_followed_by("notPattern", name_is("d"))
        .followed_by("end", name_is("e"))
    )
    e = _GR_NOT_INPUT
    assert run_cep(spark, e, p) == {(40, 44, 45, 46)}


def test_group_not_next(spark):
    """GroupITCase.java:660 — c any(a b) notNext(d) e."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any_group("grp", _ab_group())
        .not_next("notPattern", name_is("d"))
        .followed_by("end", name_is("e"))
    )
    assert run_cep(spark, _GR_NOT_INPUT, p) == {(40, 44, 45, 46)}


def test_group_nest(spark):
    """GroupITCase.java:727 — d (a (b c)*)? e: nested group loop."""
    d = (40, "d", 1.0)
    a1, b1, c1 = (41, "a", 2.0), (42, "b", 3.0), (43, "c", 4.0)
    b2, c2, e = (44, "b", 5.0), (45, "c", 4.0), (46, "e", 6.0)
    inner = Pattern.begin("middle2", name_is("b")).followed_by("middle3", name_is("c"))
    sub = Pattern.begin("middle1", name_is("a")).followed_by_group("bc", inner).one_or_more().optional()
    p = (
        Pattern.begin("start", name_is("d"))
        .followed_by_group("grp", sub).optional()
        .followed_by("end", name_is("e"))
    )
    inp = [(d, 1), (a1, 2), (b1, 3), (c1, 4), (b2, 5), (c2, 6), (e, 7)]
    assert run_cep(spark, inp, p) == {
        ids(d, e),
        ids(d, a1, e),
        ids(d, a1, b1, c1, e),
        ids(d, a1, b1, c1, b2, c2, e),
    }


_GR_NEST_EVENTS = dict(
    d=(40, "d", 1.0),
    a1=(41, "a", 2.0), b1=(42, "b", 3.0), c1=(43, "c", 4.0),
    b2=(44, "b", 5.0), c2=(45, "c", 4.0), b3=(46, "b", 5.0), c3=(47, "c", 4.0),
    a2=(48, "a", 2.0), b4=(49, "b", 3.0), c4=(50, "c", 4.0),
    b5=(51, "b", 5.0), c5=(52, "c", 4.0), b6=(53, "b", 5.0), c6=(54, "c", 4.0),
    e=(55, "e", 6.0),
)


def test_group_nest_times(spark):
    """GroupITCase.java:797 — d any(a (b c){3}){0,2} e."""
    E = _GR_NEST_EVENTS
    inner = Pattern.begin("middle2", name_is("b")).followed_by("middle3", name_is("c"))
    sub = Pattern.begin("middle1", name_is("a")).followed_by_group("bc", inner).times(3)
    p = (
        Pattern.begin("start", name_is("d"))
        .followed_by_any_group("grp", sub).times(0, 2)
        .followed_by("end", name_is("e"))
    )
    order = ["d", "a1", "b1", "c1", "b2", "c2", "b3", "c3", "a2", "b4", "c4", "b5", "c5", "b6", "c6", "e"]
    inp = [(E[k], i + 1) for i, k in enumerate(order)]
    rep1 = [E[k] for k in ("a1", "b1", "c1", "b2", "c2", "b3", "c3")]
    rep2 = [E[k] for k in ("a2", "b4", "c4", "b5", "c5", "b6", "c6")]
    assert run_cep(spark, inp, p) == {
        ids(E["d"], E["e"]),
        ids(E["d"], *rep1, E["e"]),
        ids(E["d"], *rep2, E["e"]),
        ids(E["d"], *rep1, *rep2, E["e"]),
    }


def test_group_nest_times_consecutive(spark):
    """GroupITCase.java:885 — same but consecutive at both nesting levels; a
    breaking event inside the second repetition kills it."""
    E = _GR_NEST_EVENTS
    inner = Pattern.begin("middle2", name_is("b")).followed_by("middle3", name_is("c"))
    sub = Pattern.begin("middle1", name_is("a")).followed_by_group("bc", inner).times(3).consecutive()
    p = (
        Pattern.begin("start", name_is("d"))
        .followed_by_any_group("grp", sub).times(0, 2).consecutive()
        .followed_by("end", name_is("e"))
    )
    order = ["d", "a1", "b1", "c1", "b2", "c2", "b3", "c3", "a2", "b4", "c4"]
    inp = [(E[k], i + 1) for i, k in enumerate(order)]
    inp.append(((99, "breaking", 99.0), 12))
    inp += [(E[k], 13 + i) for i, k in enumerate(["b5", "c5", "b6", "c6", "e"])]
    rep1 = [E[k] for k in ("a1", "b1", "c1", "b2", "c2", "b3", "c3")]
    assert run_cep(spark, inp, p) == {
        ids(E["d"], E["e"]),
        ids(E["d"], *rep1, E["e"]),
    }


def test_group_begin(spark):
    """GroupITCase.java:972 — (a b){1,2} d: a group AT the begin stage
    anchors fresh runs at every repetition start."""
    a1, b1 = (41, "a", 2.0), (42, "b", 3.0)
    a2, b2 = (43, "a", 4.0), (44, "b", 5.0)
    d = (45, "d", 6.0)
    p = (
        Pattern.begin_group("grp", _ab_group()).times(1, 2)
        .followed_by("end", name_is("d"))
    )
    inp = [(a1, 1), (b1, 2), (a2, 3), (b2, 4), (d, 5)]
    assert run_cep(spark, inp, p) == {
        ids(a1, b1, d),
        ids(a2, b2, d),
        ids(a1, b1, a2, b2, d),
    }


def test_group_followed_by_one_or_more_with_until_condition(spark):
    """GroupITCase.java:1023 — c (a b)+ until(d) d: until stops repetition
    growth; the pending match still completes on the d."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_group("grp", _ab_group()).one_or_more().until(name_is("d"))
        .followed_by("end", name_is("d"))
    )
    assert run_cep(spark, _GR_2PAIR, p) == {
        ids(GR_C, GR_A1, GR_B1, GR_D),
        ids(GR_C, GR_A1, GR_B1, GR_A2, GR_B2, GR_D),
    }


# ---------------------------------------------------------------------------
# NFAITCase.java — the reference NFA's primary acceptance suite
# ---------------------------------------------------------------------------

NFA_A, NFA_B, NFA_C = (60, "a", 1.0), (61, "b", 2.0), (62, "c", 3.0)
NFA_D, NFA_E = (63, "d", 4.0), (64, "e", 5.0)
_NFA_ABCDE = [(NFA_A, 1), (NFA_B, 2), (NFA_C, 3), (NFA_D, 4), (NFA_E, 5)]


def test_no_condition_nfa(spark):
    """NFAITCase.java:70 — two unconstrained stages: each adjacent pair."""
    p = Pattern.begin("start").followed_by("end")
    assert run_cep(spark, _NFA_ABCDE, p) == {
        ids(NFA_A, NFA_B), ids(NFA_B, NFA_C), ids(NFA_C, NFA_D), ids(NFA_D, NFA_E),
    }


def test_no_condition_looping_nfa(spark):
    """NFAITCase.java:100 — unconstrained begin + oneOrMore end: every
    contiguous window of length >= 2."""
    p = Pattern.begin("start").followed_by("end").one_or_more()
    evs = [NFA_A, NFA_B, NFA_C, NFA_D, NFA_E]
    expected = {
        ids(*evs[i:j]) for i in range(5) for j in range(i + 2, 6)
    }
    assert run_cep(spark, _NFA_ABCDE, p) == expected


def test_any_with_no_condition_nfa(spark):
    """NFAITCase.java:136 — followedByAny: every ordered pair."""
    p = Pattern.begin("start").followed_by_any("end")
    evs = [NFA_A, NFA_B, NFA_C, NFA_D, NFA_E]
    expected = {ids(evs[i], evs[j]) for i in range(5) for j in range(i + 1, 5)}
    assert run_cep(spark, _NFA_ABCDE, p) == expected


def test_simple_pattern_nfa(spark):
    """NFAITCase.java:172 — start · SubEvent(volume>5) · end. The SubEvent
    volume rides in the price column; the barfoo SubEvent (volume 5) and the
    base foobar event both fail the >5 bar, so subtype discrimination is
    price-encoded faithfully."""
    start, foobar = (50, "start", 1.0), (51, "foobar", 1.0)
    barfoo, middle = (52, "barfoo", 5.0), (53, "foo", 10.0)
    start2, end = (54, "start", 1.0), (55, "end", 1.0)
    p = (
        Pattern.begin("start", name_is("start"))
        .followed_by("middle", lambda e: e["price"] > 5.0)
        .followed_by("end", name_is("end"))
    )
    inp = [(start, 1), (foobar, 2), (barfoo, 3), (middle, 3), (start2, 4), (end, 5)]
    assert run_cep(spark, inp, p) == {ids(start, middle, end)}


def test_strict_continuity_with_results(spark):
    """NFAITCase.java:219 — a next b over [a b]."""
    m, e = (41, "a", 2.0), (42, "b", 4.0)
    p = Pattern.begin("middle", name_is("a")).next("end", name_is("b"))
    assert run_cep(spark, [(m, 3), (e, 5)], p) == {ids(m, e)}


def test_strict_continuity_no_results(spark):
    """NFAITCase.java:254 — a next b over [a c b]: the c breaks next()."""
    m1, m2, e = (41, "a", 2.0), (42, "c", 3.0), (43, "b", 4.0)
    p = Pattern.begin("middle", name_is("a")).next("end", name_is("b"))
    assert run_cep(spark, [(m1, 3), (m2, 4), (e, 5)], p) == set()


def test_simple_pattern_with_time_window_nfa(spark):
    """NFAITCase.java:293 — within() expiry is STRICT: the id-1 start whose
    end arrives exactly windowTime later matches nothing (NFA.java:270
    ``timestamp - start >= windowTime`` times the partial out)."""
    s1, s2 = (1, "start", 1.0), (2, "start", 1.0)
    mid, foo = (3, "middle", 1.0), (4, "foobar", 1.0)
    e1, e2 = (5, "end", 1.0), (6, "end", 1.0)
    p = (
        Pattern.begin("start", name_is("start"))
        .followed_by("middle", name_is("middle"))
        .followed_by("end", name_is("end"))
        .within(10)
    )
    inp = [(s1, 1), (s2, 2), (mid, 3), (foo, 4), (e1, 11), (e2, 13)]
    assert run_cep(spark, inp, p) == {ids(s2, mid, e1)}


def test_simple_pattern_with_timeout_handling(spark):
    """NFAITCase.java:344 — timeout side output with followedByAny stages:
    every waiting fork alive at expiry reports, INCLUDING the (start2,
    middle) prefix of the one completed match. The reference stamps each
    timeout with the advanceTime watermark that detected it (13 for the
    start2 partials — the next event after the true close 12); our executor
    reports the exact close instant start+within, a deterministic
    refinement asserted here."""
    from flink_1_6_0_spark.streaming.cep import Pattern as P, _scan

    def ev(tsec, eid, name):
        return {"__ts": tsec * 1_000_000, "event_id": eid, "name": name}

    events = [
        ev(1, 1, "start"), ev(2, 2, "start"), ev(3, 3, "middle"),
        ev(4, 4, "foobar"), ev(11, 5, "end"), ev(13, 6, "end"),
    ]
    p = (
        P.begin("start", name_is("start"))
        .followed_by_any("middle", name_is("middle"))
        .followed_by_any("end", name_is("end"))
        .within(10)
    )
    dead = []
    matches = _scan(events, p, timeouts=dead)
    got_matches = {
        tuple(tuple(events[i]["event_id"] for i in r) for r in m) for m in matches
    }
    assert got_matches == {((2,), (3,), (5,))}
    got_timeouts = set()
    for acc, _si in dead:
        eids = tuple(tuple(events[i]["event_id"] for i in r) for r in acc)
        start = min(events[i]["__ts"] for r in acc for i in r)
        got_timeouts.add((eids, (start + 10_000_000) // 1_000_000))
    assert got_timeouts == {
        (((1,), (3,)), 11), (((1,),), 11),
        (((2,), (3,)), 12), (((2,),), 12),
    }


def test_branching_pattern(spark):
    """NFAITCase.java:421 — three chained followedByAny stages branch over
    every combination (SubEvent volume in the price column)."""
    start = (40, "start", 1.0)
    m1, m2, m3 = (41, "foo1", 10.0), (42, "foo2", 10.0), (43, "foo3", 10.0)
    n1, n2 = (44, "next-one", 2.0), (45, "next-one", 2.0)
    end = (46, "end", 1.0)
    p = (
        Pattern.begin("start", name_is("start"))
        .followed_by_any("middle_first", lambda e: e["price"] > 5.0)
        .followed_by_any("middle_second", name_is("next-one"))
        .followed_by_any("end", name_is("end"))
    )
    inp = [(start, 1), (m1, 3), (m2, 4), (m3, 5), (n1, 6), (n2, 7), (end, 8)]
    assert run_cep(spark, inp, p) == {
        ids(start, m, n, end) for m in (m1, m2, m3) for n in (n1, n2)
    }


def test_complex_branching_after_zero_or_more(spark):
    """NFAITCase.java:485 — c · aANY*comb? · bANY · dANY · eANY: every a-subset
    crossed with both d's."""
    from itertools import combinations

    s = (40, "c", 1.0)
    a1, a2, a3 = (41, "a", 2.0), (42, "a", 3.0), (43, "a", 4.0)
    b, d1, d2, e = (44, "b", 5.0), (45, "d", 6.0), (46, "d", 7.0), (47, "e", 8.0)
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).one_or_more().allow_combinations().optional()
        .followed_by_any("end1", name_is("b"))
        .followed_by_any("end2", name_is("d"))
        .followed_by_any("end3", name_is("e"))
    )
    inp = [(s, 1), (a1, 3), (a2, 4), (a3, 5), (b, 6), (d1, 7), (d2, 8), (e, 9)]
    subsets = [sub for k in range(4) for sub in combinations((a1[0], a2[0], a3[0]), k)]
    assert run_cep(spark, inp, p) == {
        (s[0],) + sub + (b[0], d[0], e[0]) for sub in subsets for d in (d1, d2)
    }


def test_zero_or_more(spark):
    """NFAITCase.java:568 — c · aANY*comb · b."""
    s, a1, a2, b = (40, "c", 1.0), (41, "a", 2.0), (42, "a", 3.0), (44, "b", 5.0)
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).one_or_more().allow_combinations().optional()
        .followed_by("end1", name_is("b"))
    )
    inp = [(s, 1), (a1, 3), (a2, 4), (b, 6)]
    assert run_cep(spark, inp, p) == {
        ids(s, a1, a2, b), ids(s, a1, b), ids(s, a2, b), ids(s, b),
    }


def test_eager_zero_or_more(spark):
    """NFAITCase.java:617 — eager zeroOrMore skips the non-matching d and
    emits every prefix of the one grown run."""
    s = (40, "c", 1.0)
    a1, a2, a3, b = (41, "a", 2.0), (42, "a", 3.0), (43, "a", 4.0), (44, "b", 5.0)
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).one_or_more().optional()
        .followed_by("end1", name_is("b"))
    )
    inp = [(s, 1), (a1, 3), (a2, 4), ((50, "d", 6.0), 5), (a3, 6), (b, 7)]
    assert run_cep(spark, inp, p) == {
        ids(s, a1, a2, a3, b), ids(s, a1, a2, b), ids(s, a1, b), ids(s, b),
    }


def test_begin_with_zero_or_more(spark):
    """NFAITCase.java:669 — a*? at the begin stage anchors at every a."""
    a1, a2, a3, b = (40, "a", 2.0), (41, "a", 3.0), (42, "a", 3.0), (43, "b", 4.0)
    p = (
        Pattern.begin("middle", name_is("a")).one_or_more().optional()
        .followed_by("end", name_is("b"))
    )
    inp = [(a1, 3), (a2, 4), (a3, 5), (b, 6)]
    assert run_cep(spark, inp, p) == {
        ids(a1, a2, a3, b), ids(a1, a2, b), ids(a2, a3, b),
        ids(a1, b), ids(a2, b), ids(a3, b), ids(b),
    }


def test_zero_or_more_after_zero_or_more(spark):
    """NFAITCase.java:714 — aANY*comb? then d*comb? back to back."""
    s, a = (40, "c", 1.0), (41, "a", 2.0)
    d1, d2, e = (42, "d", 3.0), (43, "d", 4.0), (44, "e", 4.0)
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle_first", name_is("a")).one_or_more().allow_combinations().optional()
        .followed_by("middle_second", name_is("d")).one_or_more().allow_combinations().optional()
        .followed_by("end", name_is("e"))
    )
    inp = [(s, 1), (a, 3), (d1, 4), (d2, 5), (e, 6)]
    assert run_cep(spark, inp, p) == {
        ids(s, a, d1, d2, e), ids(s, a, d1, e), ids(s, d1, d2, e),
        ids(s, d1, e), ids(s, a, e), ids(s, e),
    }


def test_zero_or_more_after_branching(spark):
    """NFAITCase.java:776 — branching then a kleene dANY*comb? tail."""
    s = (40, "c", 1.0)
    a1, a2, f = (41, "a", 2.0), (42, "a", 3.0), (43, "f", 3.0)
    k1, k2, e = (44, "d", 4.0), (45, "d", 4.0), (46, "e", 4.0)
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("branching", name_is("a"))
        .followed_by_any("merging", name_is("f"))
        .followed_by_any("kleene", name_is("d")).one_or_more().allow_combinations().optional()
        .followed_by("end", name_is("e"))
    )
    inp = [(s, 1), (a1, 3), (a2, 4), (f, 5), (k1, 6), (k2, 7), (e, 8)]
    assert run_cep(spark, inp, p) == {
        ids(s, a, f, *ks, e)
        for a in (a1, a2)
        for ks in ((), (k1,), (k2,), (k1, k2))
    }


def test_strict_continuity_no_results_after_zero_or_more(spark):
    """NFAITCase.java:849 — d a* next b with a c in between: nothing."""
    d, a1, a2, c, b = (40, "d", 2.0), (41, "a", 2.0), (42, "a", 2.0), (43, "c", 3.0), (44, "b", 4.0)
    p = (
        Pattern.begin("start", name_is("d"))
        .followed_by("middle", name_is("a")).one_or_more().optional()
        .next("end", name_is("b"))
    )
    inp = [(d, 1), (a1, 2), (a2, 3), (c, 4), (b, 5)]
    assert run_cep(spark, inp, p) == set()


def test_strict_continuity_results_after_zero_or_more(spark):
    """NFAITCase.java:896 — d aANY*comb? next b: only runs ending right
    before the b survive."""
    d, a1, a2, b = (40, "d", 2.0), (41, "a", 2.0), (42, "a", 2.0), (43, "b", 4.0)
    p = (
        Pattern.begin("start", name_is("d"))
        .followed_by_any("middle", name_is("a")).one_or_more().optional().allow_combinations()
        .next("end", name_is("b"))
    )
    inp = [(d, 1), (a1, 2), (a2, 3), (b, 5)]
    assert run_cep(spark, inp, p) == {ids(d, a1, a2, b), ids(d, a2, b)}


def test_at_least_one(spark):
    """NFAITCase.java:943 — c · aANY+comb · bANY."""
    s, a1, a2, b = (40, "c", 1.0), (41, "a", 2.0), (42, "a", 3.0), (44, "b", 5.0)
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).one_or_more().allow_combinations()
        .followed_by_any("end1", name_is("b"))
    )
    inp = [(s, 1), (a1, 3), (a2, 4), (b, 6)]
    assert run_cep(spark, inp, p) == {
        ids(s, a1, a2, b), ids(s, a1, b), ids(s, a2, b),
    }


def test_begin_with_at_least_one(spark):
    """NFAITCase.java:991 — a+comb at the begin stage: every non-empty
    in-order combination from every anchor."""
    a1, a2, a3, b = (41, "a", 2.0), (42, "a", 3.0), (43, "a", 4.0), (44, "b", 5.0)
    p = (
        Pattern.begin("start", name_is("a")).one_or_more().allow_combinations()
        .followed_by("end", name_is("b"))
    )
    inp = [(a1, 3), (a2, 4), (a3, 5), (b, 6)]
    assert run_cep(spark, inp, p) == {
        ids(a1, a2, a3, b), ids(a1, a2, b), ids(a1, a3, b), ids(a2, a3, b),
        ids(a1, b), ids(a2, b), ids(a3, b),
    }


def test_next_zero_or_more(spark):
    """NFAITCase.java:1036 — start next middle*consecutive: a non-middle
    event immediately after start leaves only the zero-repeat match."""
    start, e, end = (40, "start", 1.0), (1, "event", 1.0), (46, "end", 1.0)
    m1, m2, m3 = (50, "middle", 2.0), (51, "middle", 3.0), (52, "middle", 4.0)
    p = (
        Pattern.begin("start", name_is("start"))
        .next("middle", name_is("middle")).one_or_more().optional().consecutive()
        .followed_by("end", name_is("end"))
    )
    inp = [(start, 1), (e, 2), (m1, 3), (m2, 4), (m3, 5), (end, 6)]
    assert run_cep(spark, inp, p) == {ids(start, end)}


def test_at_least_one_eager(spark):
    """NFAITCase.java:1085 — aANY+ eager: per-entry prefixes, no skipping."""
    s = (40, "c", 1.0)
    a1, a2, a3, b = (41, "a", 2.0), (42, "a", 3.0), (43, "a", 4.0), (44, "b", 5.0)
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).one_or_more()
        .followed_by_any("end1", name_is("b"))
    )
    inp = [(s, 1), (a1, 3), (a2, 4), (a3, 5), (b, 6)]
    assert run_cep(spark, inp, p) == {
        ids(s, a1, a2, a3, b), ids(s, a1, a2, b), ids(s, a2, a3, b),
        ids(s, a1, b), ids(s, a2, b), ids(s, a3, b),
    }


# NFAITCase optional/consecutive tier (ConsecutiveData: S M1 M2 M3 E above;
# middleEvent4 gets distinct id 45 — the Java fixture reuses id 43)
M4 = (45, "a", 5.0)


def test_nfa_optional(spark):
    """NFAITCase.java:1138 — c a? b."""
    s, m, b = (40, "c", 1.0), (43, "a", 4.0), (44, "b", 5.0)
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).optional()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, [(s, 1), (m, 5), (b, 6)], p) == {ids(s, m, b), ids(s, b)}


def test_nfa_times(spark):
    """NFAITCase.java:1183 — c next a{2}comb b: run must start right after c."""
    p = (
        Pattern.begin("start", name_is("c"))
        .next("middle", name_is("a")).times(2).allow_combinations()
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (M1, 2), (M2, 3), (M3, 4), (E, 6)]
    assert run_cep(spark, inp, p) == {ids(S, M1, M2, E), ids(S, M1, M3, E)}


def test_start_with_times(spark):
    """NFAITCase.java:1232 — a{2}consecutive at the begin stage."""
    p = (
        Pattern.begin("middle", name_is("a")).times(2).consecutive()
        .followed_by("end1", name_is("b"))
    )
    inp = [(M1, 2), (M2, 3), (M3, 4), (E, 6)]
    assert run_cep(spark, inp, p) == {ids(M1, M2, E), ids(M2, M3, E)}


def test_nfa_times_non_strict_with_next(spark):
    """NFAITCase.java:1273 — next a{2}comb with fillers between the a's."""
    p = (
        Pattern.begin("start", name_is("c"))
        .next("middle", name_is("a")).times(2).allow_combinations()
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (M1, 2), (_f(23), 3), (M2, 4), (_f(24), 5), (M3, 6), (E, 7)]
    assert run_cep(spark, inp, p) == {ids(S, M1, M2, E), ids(S, M1, M3, E)}


def test_times_not_strict_with_followed_by_eager(spark):
    """NFAITCase.java:1318 — followedBy a{2} eager: the first chain only."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).times(2)
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (M1, 2), (M2, 4), (M3, 6), (E, 7)]
    assert run_cep(spark, inp, p) == {ids(S, M1, M2, E)}


def test_times_not_strict_with_followed_by_not_eager(spark):
    """NFAITCase.java:1360 — followedByAny a{2}comb: every pair."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).times(2).allow_combinations()
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (M1, 2), (M2, 4), (M3, 6), (E, 7)]
    assert run_cep(spark, inp, p) == {
        ids(S, M1, M2, E), ids(S, M1, M3, E), ids(S, M2, M3, E),
    }


def test_times_strict_with_next_and_consecutive(spark):
    """NFAITCase.java:1404 — next a{2}consecutive broken by a filler: empty."""
    p = (
        Pattern.begin("start", name_is("c"))
        .next("middle", name_is("a")).times(2).consecutive()
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (M1, 2), (_f(23), 3), (M2, 4), (M3, 6), (E, 7)]
    assert run_cep(spark, inp, p) == set()


def test_start_with_optional(spark):
    """NFAITCase.java:1445 — c? b at the begin stage."""
    s, b = (40, "c", 1.0), (44, "b", 5.0)
    p = (
        Pattern.begin("start", name_is("c")).optional()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, [(s, 1), (b, 6)], p) == {ids(s, b), ids(b)}


def test_end_with_zero_or_more(spark):
    """NFAITCase.java:1481 — c a*? at the end: every prefix."""
    s = (40, "c", 1.0)
    m1, m2, m3 = (41, "a", 2.0), (42, "a", 3.0), (43, "a", 4.0)
    p = Pattern.begin("start", name_is("c")).followed_by("middle", name_is("a")).one_or_more().optional()
    inp = [(s, 1), (m1, 3), (m2, 4), (m3, 5)]
    assert run_cep(spark, inp, p) == {
        ids(s, m1, m2, m3), ids(s, m1, m2), ids(s, m1), ids(s),
    }


def test_start_and_end_with_zero_or_more(spark):
    """NFAITCase.java:1523 — the whole pattern is a*?: per-anchor prefixes
    (the bare empty match emits nothing — no event consumed)."""
    s = (40, "c", 1.0)
    m1, m2, m3 = (41, "a", 2.0), (42, "a", 3.0), (43, "a", 4.0)
    d1, d2, d3 = (44, "d", 5.0), (45, "d", 5.0), (46, "d", 5.0)
    p = Pattern.begin("start", name_is("a")).one_or_more().optional()
    inp = [(s, 1), (m1, 3), (m2, 4), (m3, 5), (d1, 6), (d2, 7), (d3, 8)]
    got = run_cep(spark, inp, p)
    got.discard(())  # the zero-event match has no key rows in a DataFrame
    assert got == {
        ids(m1, m2, m3), ids(m1, m2), ids(m1),
        ids(m2, m3), ids(m2), ids(m3),
    }


def test_end_with_optional(spark):
    """NFAITCase.java:1566 — c a? at the end."""
    s, m1 = (40, "c", 1.0), (41, "a", 2.0)
    p = Pattern.begin("start", name_is("c")).followed_by("middle", name_is("a")).optional()
    assert run_cep(spark, [(s, 1), (m1, 3)], p) == {ids(s, m1), ids(s)}


def test_end_with_one_or_more(spark):
    """NFAITCase.java:1602 — c a+ at the end: every non-empty prefix."""
    s = (40, "c", 1.0)
    m1, m2, m3 = (41, "a", 2.0), (42, "a", 3.0), (43, "a", 4.0)
    p = Pattern.begin("start", name_is("c")).followed_by("middle", name_is("a")).one_or_more()
    inp = [(s, 1), (m1, 3), (m2, 4), (m3, 5)]
    assert run_cep(spark, inp, p) == {
        ids(s, m1, m2, m3), ids(s, m1, m2), ids(s, m1),
    }


def test_nfa_times_non_strict_optional1(spark):
    """NFAITCase.java:1645 — a{3}? with no a's: the empty-loop match."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).times(3).optional()
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (_f(23), 2), (E, 7)]
    assert run_cep(spark, inp, p) == {ids(S, E)}


def test_nfa_times_non_strict_optional2(spark):
    """NFAITCase.java:1685 — followedByAny a{2}comb? over the filler input."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).times(2).allow_combinations().optional()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _TR_INPUT, p) == {
        ids(S, M1, M2, E), ids(S, M1, M3, E), ids(S, M2, M3, E), ids(S, E),
    }


def test_nfa_times_non_strict_optional3(spark):
    """NFAITCase.java:1732 — followedByAny a{2}? (no combinations)."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).times(2).optional()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _TR_INPUT, p) == {
        ids(S, M1, M2, E), ids(S, M2, M3, E), ids(S, E),
    }


def test_nfa_times_strict_optional(spark):
    """NFAITCase.java:1778 — followedByAny a{2}consecutive?."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).times(2).consecutive().optional()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _TR_INPUT, p) == {ids(S, M2, M3, E), ids(S, E)}


def test_one_or_more_strict_optional(spark):
    """NFAITCase.java:1823 — followedByAny a+consecutive?."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).one_or_more().consecutive().optional()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _TR_INPUT, p) == {
        ids(S, M2, M3, E), ids(S, M1, E), ids(S, M2, E), ids(S, M3, E), ids(S, E),
    }


def test_nfa_times_strict_optional1(spark):
    """NFAITCase.java:1871 — next a{2}consecutive? (positional adjacency)."""
    p = (
        Pattern.begin("start", name_is("c"))
        .next("middle", name_is("a")).times(2).consecutive().optional()
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (M1, 3), (M2, 5), (M3, 6), (E, 7)]
    assert run_cep(spark, inp, p) == {ids(S, M1, M2, E), ids(S, E)}


def test_optional_times_non_strict_with_next(spark):
    """NFAITCase.java:1914 — next a{2}comb? with fillers."""
    p = (
        Pattern.begin("start", name_is("c"))
        .next("middle", name_is("a")).times(2).allow_combinations().optional()
        .followed_by("end1", name_is("b"))
    )
    inp = [(S, 1), (M1, 2), (_f(23), 3), (M2, 4), (_f(24), 5), (M3, 6), (E, 7)]
    assert run_cep(spark, inp, p) == {
        ids(S, M1, M2, E), ids(S, M1, M3, E), ids(S, E),
    }


_NFA_OOM_INPUT = [
    (S, 1), (_f(50), 2), (M1, 3), (M2, 4), (M3, 4), (_f(51), 5), (M4, 6), (E, 7),
]


def test_strict_one_or_more(spark):
    """NFAITCase.java:1973 — a+ consecutive: the filler at ts 5 ends growth."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).one_or_more().consecutive()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _NFA_OOM_INPUT, p) == {
        ids(S, M1, M2, M3, E), ids(S, M1, M2, E), ids(S, M1, E),
    }


def test_skip_till_next_one_or_more(spark):
    """NFAITCase.java:1984 — a+ eager skips the filler and takes M4 too."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).one_or_more()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _NFA_OOM_INPUT, p) == {
        ids(S, M1, M2, M3, M4, E), ids(S, M1, M2, M3, E),
        ids(S, M1, M2, E), ids(S, M1, E),
    }


def test_skip_till_any_one_or_more(spark):
    """NFAITCase.java:1996 — a+comb: every combination anchored at M1."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).one_or_more().allow_combinations()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _NFA_OOM_INPUT, p) == {
        ids(S, M1, M2, M3, M4, E), ids(S, M1, M3, M4, E),
        ids(S, M1, M2, M3, E), ids(S, M1, M2, M4, E),
        ids(S, M1, M2, E), ids(S, M1, M3, E), ids(S, M1, M4, E),
        ids(S, M1, E),
    }


def test_strict_eager_zero_or_more(spark):
    """NFAITCase.java:2065 — a*consecutive?."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).one_or_more().optional().consecutive()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _NFA_OOM_INPUT, p) == {
        ids(S, M1, M2, M3, E), ids(S, M1, M2, E), ids(S, M1, E), ids(S, E),
    }


def test_skip_till_any_zero_or_more(spark):
    """NFAITCase.java:2077 — a*comb?."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).one_or_more().optional().allow_combinations()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _NFA_OOM_INPUT, p) == {
        ids(S, M1, M2, M3, M4, E), ids(S, M1, M2, M4, E), ids(S, M1, M3, M4, E),
        ids(S, M1, M4, E), ids(S, M1, M2, M3, E), ids(S, M1, M2, E),
        ids(S, M1, M3, E), ids(S, M1, E), ids(S, E),
    }


def test_skip_till_next_zero_or_more(spark):
    """NFAITCase.java:2094 — a*? eager."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle", name_is("a")).one_or_more().optional()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _NFA_OOM_INPUT, p) == {
        ids(S, M1, M2, M3, M4, E), ids(S, M1, M2, M3, E),
        ids(S, M1, M2, E), ids(S, M1, E), ids(S, E),
    }


def test_nfa_times_strict(spark):
    """NFAITCase.java:2160 — followedByAny a{2}.consecutive."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).times(2).consecutive()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _TR_INPUT, p) == {ids(S, M2, M3, E)}


def test_nfa_times_non_strict(spark):
    """NFAITCase.java:2204 — followedByAny a{2}.allowCombinations."""
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by_any("middle", name_is("a")).times(2).allow_combinations()
        .followed_by("end1", name_is("b"))
    )
    assert run_cep(spark, _TR_INPUT, p) == {
        ids(S, M1, M2, E), ids(S, M1, M3, E), ids(S, M2, M3, E),
    }


@pytest.mark.parametrize("optional", [True, False], ids=["zeroOrMore", "oneOrMore"])
def test_start_with_one_or_zero_or_more_strict(spark, optional):
    """NFAITCase.java:2250/:2264 — a+consecutive (a*consecutive) at the begin
    stage: runs break at every non-a."""
    s = (40, "c", 1.0)
    p = Pattern.begin("start", name_is("a")).one_or_more()
    if optional:
        p = p.optional()
    p = p.consecutive()
    inp = [(s, 1), (M1, 3), ((140, "c", 1.0), 4), (M2, 5), (M3, 6)]
    got = run_cep(spark, inp, p)
    got.discard(())
    assert got == {ids(M1), ids(M2, M3), ids(M2), ids(M3)}


def test_branching_pattern_skip_till_next(spark):
    """NFAITCase.java:2488 — both middles followedBy (first match only)."""
    start = (40, "start", 1.0)
    m1, m2, m3 = (41, "foo1", 10.0), (42, "foo2", 10.0), (43, "foo3", 10.0)
    n1, n2, end = (44, "next-one", 2.0), (45, "next-one", 2.0), (46, "end", 1.0)
    p = (
        Pattern.begin("start", name_is("start"))
        .followed_by("middle_first", lambda e: e["price"] > 5.0)
        .followed_by("middle_second", name_is("next-one"))
        .followed_by_any("end", name_is("end"))
    )
    inp = [(start, 1), (m1, 3), (m2, 4), (m3, 5), (n1, 6), (n2, 7), (end, 8)]
    assert run_cep(spark, inp, p) == {ids(start, m1, n1, end)}


def test_branching_pattern_mixed_followed_by(spark):
    """NFAITCase.java:2547 — ANY first middle, eager second."""
    start = (40, "start", 1.0)
    m1, m2, m3 = (41, "foo1", 10.0), (42, "foo2", 10.0), (43, "foo3", 10.0)
    n1, n2, end = (44, "next-one", 2.0), (45, "next-one", 2.0), (46, "end", 1.0)
    p = (
        Pattern.begin("start", name_is("start"))
        .followed_by_any("middle_first", lambda e: e["price"] > 5.0)
        .followed_by("middle_second", name_is("next-one"))
        .followed_by_any("end", name_is("end"))
    )
    inp = [(start, 1), (m1, 3), (m2, 4), (m3, 5), (n1, 6), (n2, 7), (end, 8)]
    assert run_cep(spark, inp, p) == {
        ids(start, m, n1, end) for m in (m1, m2, m3)
    }


def test_multiple_takes_version_collision(spark):
    """NFAITCase.java:2608 — two back-to-back a+comb loops over five a's:
    exactly the 20 (loop1, loop2) splits the reference's Dewey versioning
    keeps apart. Expected derived by the NFA's own rule: loop1 anchors at
    the first a with every in-order combination; loop2 anchors at the first
    a after loop1's last element."""
    from itertools import combinations

    s = (40, "c", 1.0)
    m = [(41 + i, "a", 2.0 + i) for i in range(5)]
    b = (50, "b", 5.0)
    p = (
        Pattern.begin("start", name_is("c"))
        .followed_by("middle1", name_is("a")).one_or_more().allow_combinations()
        .followed_by("middle2", name_is("a")).one_or_more().allow_combinations()
        .followed_by("end", name_is("b"))
    )
    inp = [(s, 1), (m[0], 3), (m[1], 4), (m[2], 5), (m[3], 6), (m[4], 7), (b, 10)]
    mid_ids = [e[0] for e in m]
    expected = set()
    for k1 in range(5):
        for tail1 in combinations(mid_ids[1:], k1):
            run1 = (mid_ids[0],) + tail1
            last_pos = mid_ids.index(run1[-1])
            if last_pos + 1 >= len(mid_ids):
                continue  # no entry left for the mandatory second loop
            entry = mid_ids[last_pos + 1]
            rest = mid_ids[last_pos + 2:]
            for k2 in range(len(rest) + 1):
                for tail2 in combinations(rest, k2):
                    expected.add((run1, (entry,) + tail2))
    assert len(expected) == 20
    df = cep_batch(
        spark.createDataFrame(
            [(e[0], e[1], e[2], ts) for e, ts in inp],
            "event_id long, name string, price double, tsec long",
        ).withColumn("k", F.lit(1)).withColumn("ts", F.col("tsec").cast("timestamp")),
        p, ["k"], "ts", "event_id",
    )
    got = {
        (tuple(r["middle1_ids"]), tuple(r["middle2_ids"])) for r in df.collect()
    }
    assert got == expected


def test_nfa_result_ordering(spark):
    """NFAITCase.java:2690 — events within a looping stage's output array
    are in accept order."""
    a = [(70 + i, f"a-{i + 1}", 2.0 + i) for i in range(4)]
    b = [(80 + i, f"b-{i + 1}", 6.0 + i) for i in range(3)]
    p = (
        Pattern.begin("start", lambda e: e["name"].startswith("a-")).times(4).allow_combinations()
        .followed_by_any("middle", lambda e: e["name"].startswith("b-")).times(3).consecutive()
    )
    inp = [(a[0], 1), (a[1], 3), (a[2], 4), (a[3], 5), (b[0], 6), (b[1], 7), (b[2], 10)]
    df = cep_batch(
        spark.createDataFrame(
            [(e[0], e[1], e[2], ts) for e, ts in inp],
            "event_id long, name string, price double, tsec long",
        ).withColumn("k", F.lit(1)).withColumn("ts", F.col("tsec").cast("timestamp")),
        p, ["k"], "ts", "event_id",
    )
    rows = df.collect()
    assert len(rows) == 1
    assert list(rows[0]["start_ids"]) == [e[0] for e in a]
    assert list(rows[0]["middle_ids"]) == [e[0] for e in b]


def test_nfa_result_key_ordering(spark):
    """NFAITCase.java:2757 — output columns follow pattern declaration
    order (the reference's LinkedHashMap key order)."""
    evs = [(41, "a", 2.0), (42, "b", 3.0), (43, "aa", 4.0), (44, "bb", 5.0), (45, "ab", 6.0)]
    p = (
        Pattern.begin("a", name_is("a"))
        .next("b", name_is("b"))
        .next("aa", name_is("aa"))
        .next("bb", name_is("bb"))
        .next("ab", name_is("ab"))
    )
    df = cep_batch(
        spark.createDataFrame(
            [(e[0], e[1], e[2], i + 1) for i, e in enumerate(evs)],
            "event_id long, name string, price double, tsec long",
        ).withColumn("k", F.lit(1)).withColumn("ts", F.col("tsec").cast("timestamp")),
        p, ["k"], "ts", "event_id",
    )
    stage_cols = [c for c in df.columns if c.endswith("_id") and c != "event_id"]
    assert stage_cols == ["a_id", "b_id", "aa_id", "bb_id", "ab_id"]
    assert df.count() == 1


# NOT ported from NFAITCase.java (assert NFA-internal state, not outputs):
# testTimesClearingBuffer:2302, testOptionalClearingBuffer:2350,
# testAtLeastOneClearingBuffer:2394, testZeroOrMoreClearingBuffer:2440 and
# testSharedBufferClearing:2833 verify partial-match/SharedBuffer cleanup —
# our executor has no shared buffer; the equivalent guarantee (state
# bounded by the within horizon) is pinned by the stream-kernel state-trim
# tests in test_streaming.py / test_lake.py.


# ---------------------------------------------------------------------------
# NFACompilerTest.java — MalformedPatternException validation goldens
# ---------------------------------------------------------------------------


def test_compiler_unique_pattern_name(spark):
    """NFACompilerTest.java:77 — duplicate stage names are rejected."""
    p = (
        Pattern.begin("start", name_is("a"))
        .followed_by("middle", name_is("b"))
        .followed_by("start", name_is("c"))
    )
    with pytest.raises(ValueError, match="Duplicate pattern name: start"):
        run_cep(spark, [((1, "a", 1.0), 1)], p)


def test_compiler_pattern_ends_with_not_followed_by(spark):
    """NFACompilerTest.java:92 — notFollowedBy cannot end a pattern."""
    p = (
        Pattern.begin("start", name_is("a"))
        .followed_by("middle", name_is("b"))
        .not_followed_by("end", name_is("c"))
    )
    with pytest.raises(ValueError, match="notFollowedBy is not supported as the last part"):
        run_cep(spark, [((1, "a", 1.0), 1)], p)


def test_compiler_skip_to_nonexistent_pattern(spark):
    """NFACompilerTest.java:189 — a skip target absent from the pattern."""
    p = (
        Pattern.begin("start", name_is("a"))
        .followed_by("end", name_is("b"))
        .skip_to_first("midd")
    )
    with pytest.raises(ValueError, match="midd"):
        run_cep(spark, [((1, "a", 1.0), 1)], p)


# ---------------------------------------------------------------------------
# CEPITCase.java — DataStream-level end-to-end scenarios
# ---------------------------------------------------------------------------


def test_simple_keyed_pattern_cep(spark):
    """CEPITCase.java:118 — keyBy(id): the funnel completes independently
    per key; the base-Event 'middle' of key 5 fails the subtype() check
    (kind column plays the SubEvent class)."""
    rows = [
        # (key, seq, name, price, kind)
        (1, 1, "barfoo", 1.0, "base"),
        (2, 2, "start", 2.0, "base"),
        (3, 3, "start", 2.1, "base"),
        (3, 4, "foobar", 3.0, "base"),
        (4, 5, "foo", 4.0, "sub"),
        (3, 6, "middle", 3.2, "sub"),
        (42, 7, "start", 3.1, "base"),
        (42, 8, "middle", 3.3, "sub"),
        (5, 9, "middle", 5.0, "base"),
        (2, 10, "middle", 6.0, "sub"),
        (7, 11, "bar", 3.0, "sub"),
        (42, 12, "42", 42.0, "base"),
        (3, 13, "end", 2.0, "base"),
        (2, 14, "end", 1.0, "base"),
        (42, 15, "end", 42.0, "base"),
    ]
    df = (
        spark.createDataFrame(rows, "k long, event_id long, name string, price double, kind string")
        .withColumn("ts", F.col("event_id").cast("timestamp"))
    )
    p = (
        Pattern.begin("start", name_is("start"))
        .followed_by_any("middle").subtype("sub", field="kind").where(name_is("middle"))
        .followed_by_any("end", name_is("end"))
    )
    out = cep_batch(df, p, ["k"], "ts", "event_id")
    got = sorted((r["k"],) for r in out.collect())
    assert got == [(2,), (3,), (42,)]


def test_simple_pattern_event_time(spark):
    """CEPITCase.java:190 — event-time ordering, not arrival order, drives
    the match: only (start@5, middle@7, end@10)."""
    rows = [  # (event_id, name, event-time) in ARRIVAL order
        (1, "start", 5), (2, "middle", 1), (3, "end", 3),
        (4, "end", 10), (5, "middle", 7), (6, "middle", 100),
    ]
    df = (
        spark.createDataFrame(rows, "event_id long, name string, tsec long")
        .withColumn("k", F.lit(1))
        .withColumn("ts", F.col("tsec").cast("timestamp"))
    )
    p = (
        Pattern.begin("start", name_is("start"))
        .followed_by_any("middle", name_is("middle"))
        .followed_by_any("end", name_is("end"))
    )
    out = cep_batch(df, p, ["k"], "ts", "event_id")
    got = {(r["start_id"], r["middle_id"], r["end_id"]) for r in out.collect()}
    assert got == {(1, 5, 4)}


def test_simple_or_filter_pattern_cep(spark):
    """CEPITCase.java:509 — where().or_() on the middle stage."""
    rows = [(i + 1, n, float(i + 1)) for i, n in enumerate(
        ["start", "middle", "end", "start", "middle", "end"]
    )]
    df = (
        spark.createDataFrame(rows, "event_id long, name string, price double")
        .withColumn("k", F.lit(1))
        .withColumn("ts", F.col("event_id").cast("timestamp"))
    )
    p = (
        Pattern.begin("start", name_is("start"))
        .followed_by_any("middle", lambda e: e["price"] == 2.0).or_(lambda e: e["price"] == 5.0)
        .followed_by_any("end", name_is("end"))
    )
    out = cep_batch(df, p, ["k"], "ts", "event_id")
    got = {(r["start_id"], r["middle_id"], r["end_id"]) for r in out.collect()}
    assert got == {(1, 2, 3), (1, 2, 6), (1, 5, 6), (4, 5, 6)}


def test_simple_pattern_event_time_with_comparator(spark):
    """CEPITCase.java:587 — a custom same-timestamp comparator (by price)
    orders the two ts-7 middles; both complete through the ANY stage."""
    rows = [  # (event_id, name, price, event-time)
        (1, "start", 1.0, 5), (2, "middle", 2.0, 1), (3, "end", 3.0, 3),
        (4, "end", 4.0, 10), (5, "middle", 6.0, 7), (6, "middle", 5.0, 7),
        (7, "middle", 5.0, 100),
    ]
    df = (
        spark.createDataFrame(rows, "event_id long, name string, price double, tsec long")
        .withColumn("k", F.lit(1))
        .withColumn("ts", F.col("tsec").cast("timestamp"))
    )
    p = (
        Pattern.begin("start", name_is("start"))
        .followed_by_any("middle", name_is("middle"))
        .followed_by_any("end", name_is("end"))
    )
    out = cep_batch(df, p, ["k"], "ts", "event_id", comparator_cols=["price"])
    got = {(r["start_id"], r["middle_id"], r["end_id"]) for r in out.collect()}
    assert got == {(1, 6, 4), (1, 5, 4)}

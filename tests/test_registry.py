"""Derived driver-window invariants (round-8 verdict task 2: the static
priority head silently failed to rotate in round 8, so the head is now
DERIVED — these pins make the derivation itself regression-checked)."""

from __future__ import annotations

from flink_1_6_0_spark.registry import (
    _ROTATE_IN,
    _SENTINELS,
    _evidence_rounds,
    load_all,
)


def test_head_is_sentinels_then_reseats_then_never_checked():
    reg = load_all()
    names = list(reg)
    # no duplicates anywhere
    assert len(names) == len(set(names))
    # sentinels lead, in declared order
    assert tuple(names[: len(_SENTINELS)]) == _SENTINELS
    # explicit re-seats follow immediately
    k = len(_SENTINELS)
    expected_reseats = [n for n in _ROTATE_IN if n not in _SENTINELS]
    assert names[k : k + len(expected_reseats)] == expected_reseats
    # EVERY registered query that has no driver evidence sits inside the
    # 50-query gate window (the invariant whose violation was round 8's
    # headline finding)
    evidence = _evidence_rounds()
    never = [n for n in names if n not in evidence]
    head50 = set(names[:50])
    missing = [n for n in never if n not in head50]
    assert not missing, f"never-driver-checked queries outside the window: {missing}"


def test_rest_is_stalest_evidence_first():
    reg = load_all()
    names = list(reg)
    evidence = _evidence_rounds()
    k = len(_SENTINELS) + len([n for n in _ROTATE_IN if n not in _SENTINELS])
    never = [n for n in names if n not in evidence and n not in names[:k]]
    rest = names[k + len(never):]
    rounds = [evidence.get(n, -1) for n in rest]
    assert rounds == sorted(rounds), "tail must be ordered stalest-evidence-first"


def test_priority_names_are_registered():
    reg = load_all()
    for n in _SENTINELS + _ROTATE_IN:
        assert n in reg

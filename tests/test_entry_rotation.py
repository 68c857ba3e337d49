"""Driver-contract rotation (__spark_entry__._rotated): the ordering
that decides which queries the driver's first-50 correctness window
re-verifies each round. Evidence files are synthesized into a tmp dir
and the module's root is monkeypatched there."""

from __future__ import annotations

import json
import sys

import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry  # noqa: E402


@pytest.fixture
def evidence_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(entry, "_HERE", str(tmp_path))

    def write(round_no: int, results: dict) -> None:
        (tmp_path / f"CORRECTNESS_r{round_no:02d}.json").write_text(
            json.dumps(results)
        )

    return write


def _green():
    return {"hash_match": True, "err": None}


def _rows_only():
    return {"hash_match": None, "err": "no_oracle"}


def _mismatch():
    return {"hash_match": False, "err": None}


def test_never_checked_oracled_queries_come_first(evidence_dir):
    evidence_dir(1, {"a": _green(), "b": _green()})
    names = ["a", "b", "new1", "new2"]
    order = entry._rotated(names, oracled=frozenset(names))
    assert order[:2] == ["new1", "new2"]  # registration order preserved
    assert set(order[2:]) == {"a", "b"}


def test_oldest_evidence_first(evidence_dir):
    evidence_dir(1, {"a": _green(), "b": _green(), "c": _green()})
    evidence_dir(2, {"b": _green()})
    evidence_dir(3, {"c": _green()})
    order = entry._rotated(["c", "b", "a"], oracled=frozenset("abc"))
    assert order == ["a", "b", "c"]  # a(r1) < b(r2) < c(r3), not reg order


def test_mismatch_and_error_do_not_count_as_evidence(evidence_dir):
    evidence_dir(1, {"a": _green(), "b": _green()})
    # round 2: b re-checked but MISMATCHED -> its last evidence stays r1;
    # a real error likewise leaves c never-checked
    evidence_dir(2, {"a": _green(), "b": _mismatch(), "c": {"err": "boom"}})
    order = entry._rotated(["a", "b", "c"], oracled=frozenset("abc"))
    assert order[0] == "c"  # never earned evidence
    assert order[1] == "b"  # stale (r1) before fresh (r2)
    assert order[2] == "a"


def test_newly_oracled_query_ignores_old_rows_only_record(evidence_dir):
    """A query upgraded from rows-only to oracled (this round: pagerank,
    the BPE pair) must count as NEVER-checked — its oracle has no green
    row yet, whatever rows-only history exists."""
    evidence_dir(1, {"up": _rows_only(), "old": _green()})
    order = entry._rotated(["old", "up"], oracled=frozenset(["old", "up"]))
    assert order == ["up", "old"]


def test_rows_only_queries_rotate_on_no_oracle_records(evidence_dir):
    evidence_dir(1, {"r1q": _rows_only()})
    evidence_dir(2, {"r2q": _rows_only()})
    order = entry._rotated(["r2q", "r1q"], oracled=frozenset())
    assert order == ["r1q", "r2q"]  # oldest rows-only evidence first


def test_reverify_pin_sorts_absolutely_first(evidence_dir, monkeypatch):
    """A pinned query (impl/oracle changed since its last driver green)
    precedes even never-checked queries — the driver window must record
    the changed semantics this round."""
    evidence_dir(5, {"pinme": _green(), "old": _green()})
    monkeypatch.setattr(entry, "_REVERIFY_FIRST", ("pinme",))
    order = entry._rotated(["old", "pinme", "brandnew"],
                           oracled=frozenset(["old", "pinme", "brandnew"]))
    assert order == ["pinme", "brandnew", "old"]


def test_reverify_names_are_registered_and_oracled():
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    for n in entry._REVERIFY_FIRST:
        assert n in qs, n
        assert n in oracles, n  # the pin exists to refresh HASH evidence


def test_local_evidence_folds_in_only_when_asked(evidence_dir, tmp_path):
    evidence_dir(1, {"a": _green()})
    (tmp_path / "CORRECTNESS_LOCAL_r02.json").write_text(
        json.dumps({"a": _green(), "b": _green()})
    )
    driver_green, _ = entry._evidence_rounds()
    assert driver_green == {"a": 1}  # rotation view: driver files only
    all_green, _ = entry._evidence_rounds(include_local=True)
    assert all_green == {"a": 2, "b": 2}


def test_live_registry_orders_unchecked_queries_first():
    """Against the REAL repo evidence files: every registered query with
    no recorded evidence (new this round) must sort into the window
    head — behind only the explicit re-verify pins — and the ordering
    covers exactly the registry."""
    qs = entry.queries()
    names = list(qs)
    green, rows_only = entry._evidence_rounds()
    oracled = set(entry.oracle_sql())
    # mirror the rotation's evidence rule: an ORACLED query counts as
    # seen only with a green hash row (a rows-only record from before
    # it was upgraded to oracled doesn't exercise the oracle); rows-only
    # queries count their rows-only record
    seen = {
        n
        for n in names
        if ((n in green) if n in oracled else (n in rows_only))
    }
    pinned = set(entry._REVERIFY_FIRST)
    unseen = [n for n in names if n not in seen and n not in pinned]
    # all unseen queries (if any) sort before every seen, unpinned one
    if unseen:
        first_seen_idx = min(
            names.index(n) for n in names if n in seen and n not in pinned
        )
        assert all(names.index(n) < first_seen_idx for n in unseen)
    assert len(names) == len(set(names))
    assert set(entry.oracle_sql()) <= set(names)

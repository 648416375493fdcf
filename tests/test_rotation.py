"""tools/rotation.py ordering contract (JVM-free)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

from rotation import last_green_round  # noqa: E402


def g(ok=True):
    return {"rows_match": ok, "schema_match": ok, "hash_match": ok}


def test_last_green_round_picks_most_recent_green():
    history = {1: {"q": g()}, 2: {"q": g(False)}, 3: {}}
    assert last_green_round("q", history) == 1
    history[3] = {"q": g()}
    assert last_green_round("q", history) == 3


def test_never_verified_is_none():
    assert last_green_round("q", {1: {"other": g()}}) is None
    assert last_green_round("q", {1: {"q": g(False)}}) is None


def test_freshness_ordering_key():
    # the sort key used by the proposer: never-verified first, then
    # stalest round, stable by current order
    entries = [
        ("new_b", None, 5),
        ("old_r1", 1, 9),
        ("old_r3", 3, 2),
        ("new_a", None, 1),
        ("old_r2", 2, 0),
    ]
    keyed = sorted(
        ((rnd is not None, rnd or 0, order), name)
        for name, rnd, order in entries
    )
    assert [name for _, name in keyed] == [
        "new_a", "new_b", "old_r1", "old_r2", "old_r3"
    ]

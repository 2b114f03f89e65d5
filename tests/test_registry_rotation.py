"""Driver-row rotation invariants (VERDICT r4 item 3 + the r4 ADVICE high
finding): the queries() ordering must be a mechanical recency rule over the
recorded CORRECTNESS artifacts — never a hand-curated subset — and must
guarantee that every registry entry either already has a recorded driver row
or sits inside the driver's 50-row recording window this round."""

import importlib.util
import os
import sys

import pytest

_here = os.path.dirname(__file__)
sys.path.insert(0, os.path.join(_here, ".."))

import __spark_entry__ as entry  # noqa: E402


def _registry_names():
    from osm_merge_spark.queries import REGISTRY

    return list(REGISTRY)


def test_every_query_has_a_row_or_is_in_window():
    names = _registry_names()
    order = entry._rotated(names)
    window = set(order[: entry._DRIVER_ROW_CAP])
    rows = entry._driver_rows()
    uncovered = [n for n in names if n not in window and n not in rows]
    assert uncovered == [], (
        f"{uncovered} would end this round with no driver row in any recorded "
        "round and none coming — the rotation must fail loudly, not silently "
        "drop coverage"
    )


def test_every_needs_row_query_is_in_window():
    """A query with no recorded row, or whose latest row was red, must be
    inside the window so the driver records (or re-records) it this round."""
    names = _registry_names()
    order = entry._rotated(names)
    window = set(order[: entry._DRIVER_ROW_CAP])
    rows = entry._driver_rows()
    needs = [n for n in names if n not in rows or not rows[n][1]]
    assert len(needs) <= entry._DRIVER_ROW_CAP, (
        f"{len(needs)} queries need a driver row but only "
        f"{entry._DRIVER_ROW_CAP} fit the window — coverage is impossible "
        "this round; stop adding queries or get the cap raised"
    )
    missing = [n for n in needs if n not in window]
    assert missing == []


def test_rotation_is_permutation_and_deterministic():
    names = _registry_names()
    a, b = entry._rotated(names), entry._rotated(names)
    assert a == b
    assert sorted(a) == sorted(names)


def test_tail_is_most_recently_green_not_hand_picked():
    """The rotated-out tail must consist solely of queries whose LATEST
    driver row is green, and every tail entry must have been recorded at
    least as recently as every in-window recorded-green entry (pure recency
    — the mechanical rule the r4 ADVICE asked for)."""
    names = _registry_names()
    order = entry._rotated(names)
    cap = entry._DRIVER_ROW_CAP
    tail = order[cap:]
    rows = entry._driver_rows()
    for n in tail:
        assert n in rows and rows[n][1], f"tail entry {n} lacks a green driver row"
    if tail:
        max_window_rnd = max(
            (rows[n][0] for n in order[:cap] if n in rows and rows[n][1]),
            default=-1,
        )
        assert all(rows[n][0] >= max_window_rnd for n in tail)


def test_known_red_row_rotates_back_into_window():
    """q_corpus_prep was hash-red in CORRECTNESS_r04 — the recency rule must
    place it (and any future red row) inside the window automatically."""
    rows = entry._driver_rows()
    if "q_corpus_prep" not in rows or rows["q_corpus_prep"][1]:
        pytest.skip("q_corpus_prep latest row is green — nothing to re-record")
    order = entry._rotated(_registry_names())
    assert "q_corpus_prep" in order[: entry._DRIVER_ROW_CAP]


def test_driver_rows_reads_all_recorded_rounds():
    rows = entry._driver_rows()
    # r1-r4 artifacts are committed; the union covers the whole registry
    assert rows, "no CORRECTNESS artifacts parsed"
    rounds = {rnd for rnd, _ in rows.values()}
    assert max(rounds) >= 4

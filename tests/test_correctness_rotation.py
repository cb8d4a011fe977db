"""Machine-check the CORRECTNESS-window rotation (VERDICT r9 item 1,
lifecycle fixed per VERDICT r10 item 1 / ADVICE r10).

The grading driver records only the first 50 registered queries per
round, so window membership is a curated list
(etl_mudah_spark/plans/__init__._PRIORITY). Historically the rotation
was manual prose in a comment — and the late round-9 additions missed
it, leaving 33 queries without any driver-produced CORRECTNESS row.
These tests make a missed rotation a FAILING BUILD:

1. every query that has never had a driver row must sit in the current
   window (new queries must be added to _PRIORITY when registered);
2. the window slots left over after (1) must go to the STALEST
   recorded queries — filler may not leapfrog an older record;
3. the window must not outlive its round: once the driver has written
   CORRECTNESS_r{N}.json for N > _WINDOW_ROUND, the window is stale.

Lifecycle: the r10 version of check (2) compared against ALL records,
so it went red the moment the driver wrote the current round's file
(the window names jumped to latest=current while rotated-out names sat
older). Check (2) now evaluates staleness against the records that
existed at the window's FREEZE (rounds < _WINDOW_ROUND), which is
invariant across the driver run; check (3) is what catches a rotation
missed in a later round.
"""

from __future__ import annotations

import glob
import json
import os

import etl_mudah_spark.plans  # noqa: F401  (registers + orders queries)
from etl_mudah_spark.plans import _PRIORITY, _WINDOW_ROUND
from etl_mudah_spark.plans.registry import REGISTRY

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW_SIZE = 50


def _latest_round_by_query(*, before_round: int | None = None) -> dict[str, int]:
    """Latest CORRECTNESS round per query, optionally restricted to
    records strictly older than ``before_round`` (the freeze view)."""
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json")):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        if before_round is not None and rnd >= before_round:
            continue
        with open(path) as fh:
            rec = json.load(fh)
        for name in rec:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def test_never_rowed_queries_are_in_window():
    latest = _latest_round_by_query()
    window = list(REGISTRY)[:WINDOW_SIZE]
    never = sorted(n for n in REGISTRY if n not in latest)
    assert len(never) <= WINDOW_SIZE, (
        f"{len(never)} never-rowed queries exceed the {WINDOW_SIZE}-slot "
        "window; stage registrations across rounds"
    )
    missing = sorted(set(never) - set(window))
    assert not missing, (
        "queries with no driver CORRECTNESS row in any round are outside "
        f"the current window — add them to plans/__init__._PRIORITY: "
        f"{missing}"
    )


def test_window_filler_takes_stalest_records():
    # Freeze view: only records from rounds before this window's round
    # count, so the driver writing CORRECTNESS_r{_WINDOW_ROUND}.json
    # does not flip this test (the r10 lifecycle flaw).
    latest = _latest_round_by_query(before_round=_WINDOW_ROUND)
    window = list(REGISTRY)[:WINDOW_SIZE]
    filler_rounds = [latest[n] for n in window if n in latest]
    outside_rounds = [
        latest[n] for n in REGISTRY if n not in window and n in latest
    ]
    if not filler_rounds or not outside_rounds:
        return
    assert max(filler_rounds) <= min(outside_rounds), (
        "window filler leapfrogs a staler record: a query outside the "
        f"window has latest round {min(outside_rounds)} while the window "
        f"spends a slot on latest round {max(filler_rounds)} — rotate the "
        "stalest names in first"
    )


def test_window_has_not_outlived_its_round():
    latest = _latest_round_by_query()
    max_recorded = max(latest.values(), default=0)
    assert max_recorded <= _WINDOW_ROUND, (
        f"CORRECTNESS_r{max_recorded}.json exists but the window targets "
        f"round {_WINDOW_ROUND} — a later round ran without a rotation; "
        "bump _WINDOW_ROUND and rotate plans/__init__._PRIORITY"
    )


def test_window_is_exactly_the_priority_list():
    assert len(_PRIORITY) == WINDOW_SIZE
    assert list(REGISTRY)[:WINDOW_SIZE] == _PRIORITY

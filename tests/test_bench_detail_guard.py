"""Pin the BENCH_DETAIL overwrite policy (VERDICT r13 item 3).

A solo-attested bench record (quiet box, SPARK_GRAFT_BENCH_SOLO=1) is
the round's canonical measurement; the driver's own re-run is load-
contaminated by construction and for four consecutive rounds it
silently clobbered the committed solo record in the working tree.
bench.detail_target must route a non-solo run AWAY from an existing
solo-attested record (suffixed file) while leaving every other
combination on the base path.
"""

from __future__ import annotations

import json

import bench


def _write(path, solo: bool) -> None:
    path.write_text(json.dumps({"load": {"solo_attested": solo}}))


def _result(solo: bool) -> dict:
    return {"load": {"solo_attested": solo}}


def test_nonsolo_may_not_clobber_solo(tmp_path):
    base = tmp_path / "BENCH_DETAIL.json"
    _write(base, solo=True)
    target = bench.detail_target(base, _result(solo=False))
    assert target != base
    assert target.name == "BENCH_DETAIL.nonsolo.json"
    assert target.parent == base.parent
    # and the solo record is untouched by the decision itself
    assert json.loads(base.read_text())["load"]["solo_attested"] is True


def test_solo_overwrites_solo():
    # a fresh solo run IS the new canonical record
    from pathlib import Path

    base = Path("/nonexistent-dir/BENCH_DETAIL.json")
    assert bench.detail_target(base, _result(solo=True)) == base


def test_solo_overwrites_nonsolo(tmp_path):
    base = tmp_path / "BENCH_DETAIL.json"
    _write(base, solo=False)
    assert bench.detail_target(base, _result(solo=True)) == base


def test_nonsolo_overwrites_nonsolo(tmp_path):
    base = tmp_path / "BENCH_DETAIL.json"
    _write(base, solo=False)
    assert bench.detail_target(base, _result(solo=False)) == base


def test_nonsolo_with_no_prior_record(tmp_path):
    base = tmp_path / "BENCH_DETAIL.json"
    assert bench.detail_target(base, _result(solo=False)) == base


def test_unreadable_prior_record_is_not_protected(tmp_path):
    base = tmp_path / "BENCH_DETAIL.json"
    base.write_text("{not json")
    assert bench.detail_target(base, _result(solo=False)) == base

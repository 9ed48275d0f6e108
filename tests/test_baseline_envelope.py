"""Contract tests for the pinned bench envelope (BASELINE_BENCH.json).

The envelope is the 2x perf gate's fixed reference; fields added
outside tools/pin_baseline.py (the scheduling-kernel reference, the
round-14 compute-bound SF1 block) must survive regeneration — the
advice-r13 finding was exactly this schema silently degrading.  These
tests pin the schema so a regen that drops a field fails CI instead of
nulling bench.py's sched_kernel_ratio / vs_pinned_sf1.
"""

from __future__ import annotations

import json
import os

PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BASELINE_BENCH.json",
)


def _load() -> dict:
    with open(PATH) as f:
        return json.load(f)


def test_envelope_core_schema():
    pin = _load()
    for key in ("calib_ref", "queries", "provenance"):
        assert key in pin, key
    assert pin["calib_ref"] > 0
    # every query has provenance and vice versa
    assert set(pin["queries"]) == set(pin["provenance"])
    assert all(v > 0 for v in pin["queries"].values())


def test_envelope_sched_kernel_reference():
    pin = _load()
    assert pin.get("calib_sched_ref"), (
        "calib_sched_ref missing — bench.py's sched_kernel_ratio "
        "degrades to null (advice r13; pin_baseline.py must carry it)"
    )
    assert pin.get("calib_sched_ref_note")


def test_envelope_sf1_block():
    pin = _load()
    sf1 = pin.get("sf1")
    assert sf1, (
        "sf1 block missing — vs_pinned_sf1 degrades to null "
        "(pinned round 14 via tools/tpch_sf1_bench.py --pin; "
        "pin_baseline.py must carry it through regenerations)"
    )
    assert set(sf1["queries"]) == {f"tpch_q{n}" for n in range(1, 23)}
    assert sf1["calib_ref"] > 0
    assert abs(sum(sf1["queries"].values()) - sf1["total"]) < 0.05

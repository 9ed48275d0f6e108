"""Generate BASELINE_BENCH.json — the FIXED per-query bench envelope
(VERDICT r12 item 2).

Three rounds of drift-adjudication essays (r10 box vs r11 box vs r12
box) showed the problem: with no absolute reference numbers
(BASELINE.md — the reference repo publishes none), the 2x gate floated
against whichever box state the previous round ran on.  This pins it:

- the 34 queries BENCH_r10.json recorded (TPC-H q1-q22 + the 12 most
  expensive pipeline headliners of that round) keep r10's driver
  medians VERBATIM — the cleanest full-suite run on record (calib
  0.308, flattest before/after kernels);
- every query that landed after r10 (or was elided from r10's compact
  line) is filled from a clean current run, converted onto the r10 box
  via the calibration-kernel ratio (sec * calib_r10 / calib_now).

All numbers are therefore "seconds on the r10 box"; bench.py's
vs_pinned_baseline block converts each future run onto the same box
before dividing.  Provenance is recorded per query.

Usage: python tools/pin_baseline.py   (reads BENCH_r10.json and a
fresh BENCH_RESULT.json produced by an UNCONTENDED `python bench.py`
run; refuses a contended run by checking the before/after kernels).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    with open(os.path.join(REPO, "BENCH_r10.json")) as f:
        r10 = json.load(f)["parsed"]
    with open(os.path.join(REPO, "BENCH_RESULT.json")) as f:
        now = json.load(f)
    # Fields added to BASELINE_BENCH.json outside this tool (the
    # scheduling-latency reference, the SF1 block) must round-trip a
    # regeneration — otherwise re-running the tool silently degrades
    # bench.py's sched_kernel_ratio / vs_pinned_sf1 to null (round-14
    # advice fix).
    carried: dict = {}
    prev_path = os.path.join(REPO, "BASELINE_BENCH.json")
    if os.path.exists(prev_path):
        with open(prev_path) as f:
            prev = json.load(f)
        for key in ("calib_sched_ref", "calib_sched_ref_note", "sf1"):
            if key in prev:
                carried[key] = prev[key]

    calib_r10 = float(r10["calib_sec"])
    cb, ca = float(now["calib_sec"]), float(now["calib_sec_after"])
    if max(cb, ca) / min(cb, ca) > 1.25:
        sys.exit(
            f"refusing: fill run's kernels drifted mid-run "
            f"({cb} -> {ca}); re-run bench.py on a quiet box"
        )
    scale = calib_r10 / ((cb + ca) / 2)

    queries: dict[str, float] = {}
    provenance: dict[str, str] = {}
    for name, sec in now["queries"].items():
        queries[name] = round(sec * scale, 3)
        provenance[name] = "r13_fill"
    # r10 rows override fills: the pinned number is the oldest clean
    # measurement, not the newest
    for name, sec in r10["queries"].items():
        queries[name] = sec
        provenance[name] = "r10"

    out = {
        "description": (
            "Fixed bench envelope in r10-box seconds: r10 driver "
            "medians verbatim; post-r10 queries filled from a clean "
            "run via the calibration kernel.  bench.py emits "
            "vs_pinned_baseline ratios against this file."
        ),
        "calib_ref": calib_r10,
        "fill_run": {
            "git_sha": now.get("git_sha"),
            "calib_before": cb,
            "calib_after": ca,
            "scale_to_r10_box": round(scale, 4),
        },
        "queries": dict(sorted(queries.items())),
        "provenance": dict(sorted(provenance.items())),
    }
    out.update(carried)
    path = os.path.join(REPO, "BASELINE_BENCH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    n10 = sum(1 for v in provenance.values() if v == "r10")
    print(
        f"wrote {path}: {len(queries)} queries "
        f"({n10} r10 verbatim, {len(queries) - n10} filled, "
        f"scale {scale:.4f})"
    )


if __name__ == "__main__":
    main()

"""Gate for the multi-process OCC stress harness (VERDICT r10 task 3).

Two legs: (1) the INVARIANT CHECKER must actually detect violations —
a tampered worker report (claiming an increment that never committed)
must fail it, else a green tools/occ_stress_r11.log proves nothing;
(2) a small LIVE run — 2 real OS processes with their own
SparkSessions racing merges/appends/replays on one table — must pass
it. The full 6-worker evidence run is tools/occ_stress_r11.log.
"""

from __future__ import annotations

import copy
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from occ_stress_r11 import check_invariants, run  # noqa: E402


def test_checker_detects_tampered_report(tmp_path):
    """One live run, three checker probes: the genuine reports pass;
    a report claiming an increment that never committed must surface
    as LOST UPDATE; a report claiming a phantom append must surface as
    an append mismatch. This is what makes a green
    tools/occ_stress_r11.log evidence rather than decoration."""
    out = str(tmp_path / "run.log")
    rc = run(workers=2, increments=2, appends=2, out=out)
    assert rc == 0
    rec = json.load(open(out))
    assert rec["ok"] and not rec["violations"]
    path = rec["table"]
    assert check_invariants(path, rec["reports"]) == []
    tampered = copy.deepcopy(rec["reports"])
    slot0 = next(iter(tampered[0]["incr"]))
    tampered[0]["incr"][slot0] += 1
    errs = check_invariants(path, tampered)
    assert any("LOST UPDATE" in e for e in errs), errs
    tampered = copy.deepcopy(rec["reports"])
    tampered[1]["appended"].append(99_999)
    errs = check_invariants(path, tampered)
    assert any("append mismatch" in e for e in errs), errs


def test_live_two_process_race_passes_checker(tmp_path):
    """End-to-end: the harness's own exit code IS the checker verdict;
    rc != 0 means a serializability violation was found."""
    out = str(tmp_path / "live.log")
    rc = subprocess.call(
        [
            sys.executable,
            os.path.join(REPO, "tools", "occ_stress_r11.py"),
            "--workers", "2", "--increments", "2", "--appends", "2",
            "--out", out,
        ],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        timeout=580,
    )
    assert rc == 0
    rec = json.load(open(out))
    assert rec["ok"] and rec["commits"] >= 1 + 2 * (2 + 2)
    assert all(r["replayed"]["noop"] for r in rec["reports"])

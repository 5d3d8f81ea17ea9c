#!/usr/bin/env python
"""Interleaved same-session A/B (VERDICT r13 task 4): alternate fresh-JVM
probe samples of the r12 round-end tree, the r13 round-end tree and r14
HEAD — r12,r13,r14,r12,r13,r14,... — so every tree sees the same host
window distribution. Settles whether the r13 headline 'regression'
(PERF_r13: 0.695x geomean on untouched code) was code or window.

Usage: python tools/ab_interleave_r14.py <r12_dir> <r13_dir> <r14_dir>
       [rounds]
Appends per-sample JSON lines + a min/median summary to
tools/ab_interleave_r14.log.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

PROBE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "ab_probe_r14.py")


def main() -> None:
    dirs = sys.argv[1:4]
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    labels = ["r12", "r13", "r14"]
    log = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ab_interleave_r14.log")
    samples: dict[str, list[dict]] = {lb: [] for lb in labels}
    with open(log, "a") as fh:
        for rnd in range(rounds):
            for lb, d in zip(labels, dirs):
                proc = subprocess.run(
                    [sys.executable, PROBE, d],
                    capture_output=True, text=True, timeout=1200,
                )
                line = proc.stdout.strip().splitlines()[-1]
                rec = json.loads(line)
                rec["label"], rec["round"] = lb, rnd
                samples[lb].append(rec)
                fh.write(json.dumps(rec) + "\n")
                fh.flush()
                print(f"round {rnd} {lb}: steady {rec['steady_suite']} "
                      f"fresh {rec['fresh_suite']} "
                      f"stream {rec['stream_events_per_sec']}")
        summary: dict = {"summary": True, "rounds": rounds}
        for lb in labels:
            ss = [r["steady_suite"] for r in samples[lb]]
            fs = [r["fresh_suite"] for r in samples[lb]]
            st = [r["stream_events_per_sec"] for r in samples[lb]]
            per_q = {
                q: round(min(r["steady"][q] for r in samples[lb]), 4)
                for q in samples[lb][0]["steady"]
            }
            summary[lb] = {
                "steady_suite_min": round(min(ss), 4),
                "steady_suite_median": round(statistics.median(ss), 4),
                "steady_per_query_min": per_q,
                "fresh_suite_min": round(min(fs), 4),
                "fresh_suite_median": round(statistics.median(fs), 4),
                "stream_eps_max": max(st),
                "stream_eps_median": round(statistics.median(st)),
            }
        fh.write(json.dumps(summary) + "\n")
        print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()

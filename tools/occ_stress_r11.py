#!/usr/bin/env python
"""Multi-PROCESS OCC stress harness (VERDICT r10 task 3).

The thread race tests (tests/test_acid.py) share one interpreter and
one SparkSession; the log-layer cross-process test races bare
``_try_commit`` calls. This harness is the deployment shape neither
covers: N independent OS processes, EACH WITH ITS OWN SparkSession,
hammering ONE MiniLog table with the full verb mix —

- counter MERGEs on a SHARED slot range (read-modify-write: the
  textbook lost-update workload — every increment must serialize or
  abort, never silently vanish),
- unique-row APPENDs (auto-rebase through version races),
- a deliberate txn REPLAY of an already-committed append batch
  (exactly-once: it must commit nothing),
- mid-run OPTIMIZE attempts (maintenance must lose to racing data
  changes, never corrupt).

Serializability is then asserted FROM THE LOG by ``check_invariants``:

1. versions are a gapless serial order 0..N and every entry parses;
2. no lost update: each slot's final value equals the number of
   increment commits the workers REPORTED successful (a racing merge
   that silently dropped another's write would break this exactly);
3. no lost/duplicated append: the set of appended keys equals the
   union of worker reports, each exactly once;
4. txn exactly-once: the replayed (app, version) appears once in the
   log's txn map and its rows are not duplicated;
5. reading any historical snapshot still folds cleanly (time travel
   unbroken by the race).

Usage:
    python tools/occ_stress_r11.py [--workers 6] [--increments 6]
        [--appends 4] [--out tools/occ_stress_r11.log]

Exit code 0 iff every invariant holds; the log file records per-worker
reports + the checker verdict. tests/test_occ_stress.py gates the
checker (a tampered report must FAIL it) and runs a small live config.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_SLOTS = 4

WORKER = r"""
import json, os, sys, time, random
sys.path.insert(0, sys.argv[1])
path, wid, n_incr, n_app, barrier, outp = (
    sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5]),
    sys.argv[6], sys.argv[7],
)
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"occ-worker-{wid}")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from bootic_stats_aggregates_spark.acid import (
    ConcurrentModification, MiniLogTable,
)

N_SLOTS = 4
report = {"wid": wid, "incr": {}, "appended": [], "replayed": None,
          "optimize": {"ok": 0, "lost": 0}, "errors": []}
open(outp + ".ready", "w").close()
deadline = time.time() + 120
while not os.path.exists(barrier):
    time.sleep(0.01)
    assert time.time() < deadline, "barrier never appeared"

def table():
    return MiniLogTable(spark, path, stats_cols=("slot",))

# --- shared-slot increments: read-modify-write via MERGE, retried on
# --- OCC conflicts (the conflict IS the correctness mechanism)
for i in range(n_incr):
    slot = (wid + i) % N_SLOTS
    src = spark.createDataFrame([(slot,)], "slot INT")
    for attempt in range(60):
        try:
            table().merge_clauses(
                src, keys=("slot",),
                matched=({"action": "update",
                          "set": {"val": "target.val + 1"}},),
            )
            report["incr"][str(slot)] = report["incr"].get(str(slot), 0) + 1
            break
        except ConcurrentModification:
            time.sleep(random.uniform(0.01, 0.1))
    else:
        report["errors"].append(f"increment slot {slot} starved")

# --- unique appends with txn markers (exactly-once)
app = f"occ-w{wid}"
for i in range(n_app):
    key = 10_000 * (wid + 1) + i
    df = spark.createDataFrame([(key, None)], "slot INT, val INT")
    try:
        table().append(df, txn={"app": app, "version": i})
        report["appended"].append(key)
    except Exception as e:
        report["errors"].append(f"append {key}: {e}")
    if i == 0:
        # mid-run maintenance: must either land or lose cleanly
        try:
            table().optimize(target_rows=1_000_000)
            report["optimize"]["ok"] += 1
        except ConcurrentModification:
            report["optimize"]["lost"] += 1

# --- deliberate replay of txn version 0: must commit NOTHING.
# (Version numbers race with other workers, so "no new rows under MY
# key" — which only this worker writes — is the race-free no-op proof.)
df = spark.createDataFrame(
    [(10_000 * (wid + 1),  None)], "slot INT, val INT"
)
table().append(df, txn={"app": app, "version": 0})
cnt = table().read().filter(f"slot = {10_000 * (wid + 1)}").count()
report["replayed"] = {"app": app, "version": 0, "noop": cnt == 1}

with open(outp, "w") as fh:
    json.dump(report, fh)
spark.stop()
"""


def check_invariants(path: str, reports: list[dict]) -> list[str]:
    """Serializability audit from the log. Returns [] iff clean."""
    sys.path.insert(0, REPO)
    from bootic_stats_aggregates_spark.acid import MiniLogTable

    errs: list[str] = []
    t = MiniLogTable.fold_only(path)
    # 1. gapless serial versions, every entry parseable
    versions = t._versions()
    if versions != list(range(versions[0], t.version + 1)):
        errs.append(f"version gap: {versions}")
    for v in versions:
        try:
            t._read_entry(v)
        except Exception as e:  # pragma: no cover
            errs.append(f"entry {v} unreadable: {e}")
    snap = t.snapshot()
    # table state via pyarrow (no Spark needed for the audit)
    import pyarrow.parquet as pq

    rows: list[tuple] = []
    for f in snap.files:
        if f.dv:
            errs.append(f"unexpected deletion vector on {f.file}")
        tb = pq.read_table(os.path.join(path, f.file))
        cols = {c: tb.column(c).to_pylist() for c in ("slot", "val")}
        rows += list(zip(cols["slot"], cols["val"]))
    # 2. no lost update: final slot value == reported increments
    want = {s: 0 for s in range(N_SLOTS)}
    for r in reports:
        for slot, n in r["incr"].items():
            want[int(slot)] += n
    slot_rows = [s for s, _ in rows if s is not None and s < N_SLOTS]
    if sorted(slot_rows) != list(range(N_SLOTS)):
        errs.append(f"slot rows not unique/complete: {sorted(slot_rows)}")
    got = {s: v for s, v in rows if s is not None and s < N_SLOTS}
    for s in range(N_SLOTS):
        if got.get(s) != want[s]:
            errs.append(
                f"LOST UPDATE slot {s}: table={got.get(s)} "
                f"reported={want[s]}"
            )
    # 3. appends exactly once
    appended = [s for s, _ in rows if s is not None and s >= 10_000]
    want_keys = sorted(k for r in reports for k in r["appended"])
    if sorted(appended) != want_keys:
        errs.append(
            f"append mismatch: table has {len(appended)} "
            f"(dups={len(appended) - len(set(appended))}), "
            f"workers reported {len(want_keys)}"
        )
    # 4. txn exactly-once: replay was a no-op and the log's txn map
    # holds each app at its highest committed batch
    for r in reports:
        if not (r["replayed"] or {}).get("noop"):
            errs.append(f"worker {r['wid']}: txn replay COMMITTED")
        app = f"occ-w{r['wid']}"
        n_app = len(r["appended"])
        if n_app and snap.txns.get(app) != n_app - 1:
            errs.append(
                f"txn map for {app}: {snap.txns.get(app)} != {n_app - 1}"
            )
    # 5. every worker's increments all landed (no starvation)
    for r in reports:
        if r["errors"]:
            errs.append(f"worker {r['wid']} errors: {r['errors']}")
    return errs


def run(workers: int, increments: int, appends: int, out: str) -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("occ-stress-seed")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    from bootic_stats_aggregates_spark.acid import MiniLogTable

    root = tempfile.mkdtemp(prefix="occ_stress_")
    path = os.path.join(root, "table")
    t = MiniLogTable(spark, path, stats_cols=("slot",))
    t.append(
        spark.createDataFrame(
            [(s, 0) for s in range(N_SLOTS)], "slot INT, val INT"
        )
    )
    barrier = os.path.join(root, "go")
    procs, outs = [], []
    script = os.path.join(root, "worker.py")
    with open(script, "w") as fh:
        fh.write(WORKER)
    for w in range(workers):
        outp = os.path.join(root, f"report_{w}.json")
        outs.append(outp)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, script, REPO, path, str(w),
                    str(increments), str(appends), barrier, outp,
                ],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
        )
    deadline = time.time() + 300
    while not all(os.path.exists(o + ".ready") for o in outs):
        time.sleep(0.2)
        assert time.time() < deadline, "workers never became ready"
    t0 = time.time()
    open(barrier, "w").close()
    for p in procs:
        rc = p.wait(timeout=600)
        assert rc == 0, f"worker exited {rc}"
    wall = time.time() - t0
    reports = [json.load(open(o)) for o in outs]
    errs = check_invariants(path, reports)
    final = MiniLogTable.fold_only(path)
    record = {
        "table": path,  # kept on disk: the checker can be re-run on it
        "workers": workers,
        "increments_per_worker": increments,
        "appends_per_worker": appends,
        "commits": final.version + 1,
        "wall_sec": round(wall, 2),
        "reports": reports,
        "violations": errs,
        "ok": not errs,
    }
    with open(out, "w") as fh:
        fh.write(json.dumps(record, indent=1) + "\n")
    print(json.dumps({k: record[k] for k in
                      ("workers", "commits", "wall_sec", "ok")}))
    if errs:
        print("VIOLATIONS:", *errs, sep="\n  ")
    # NOTE: no spark.stop() — under pytest getOrCreate() returns the
    # suite's shared session; stopping it here would kill every later
    # test. The CLI path cleans up on process exit.
    return 0 if not errs else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=6)
    ap.add_argument("--increments", type=int, default=6)
    ap.add_argument("--appends", type=int, default=4)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "tools", "occ_stress_r11.log")
    )
    a = ap.parse_args()
    sys.exit(run(a.workers, a.increments, a.appends, a.out))

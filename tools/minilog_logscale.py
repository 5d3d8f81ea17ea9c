#!/usr/bin/env python
"""MiniLog COMMIT-LOG scale: is snapshot() O(since-checkpoint) at 10k
commits, or does the driver-side fold degrade with log length?

(VERDICT r7 task 5.) Builds a table of N merge-shaped commits (each
adds one file and removes the previous — the live set stays tiny, so
any fold-time growth is LOG overhead, not state size) entirely through
the spark-free commit layer (fold_only + _try_commit — the exact
protocol, no JVM), then measures:

1. snapshot() wall time at versions spread across the log — must be
   FLAT (checkpoint read + <= CHECKPOINT_EVERY tail entries + one
   os.listdir of the log dir), not O(version).
2. the checkpoint-interval curve: fold time at distance 0..interval-1
   past a checkpoint — the tail is the only growing term.
3. history() at N commits — the one honest O(log) operation (it reads
   every entry by contract).
4. CHECKPOINT_EVERY sweep (10 / 100 / 1000): build + fold cost vs
   interval, the knob a 100 TB deployment tunes.

Usage: python tools/minilog_logscale.py [n_commits]   (default 10_000)
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000


def build(root: str, n: int) -> "object":
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bootic_stats_aggregates_spark.acid import MiniLogTable

    tbl = MiniLogTable.fold_only(os.path.join(root, "t"), create=True)
    seed = os.path.join(tbl.path, "seed.parquet")
    pq.write_table(
        pa.table({"k": pa.array([0], type=pa.int64()),
                  "v": pa.array(["x"])}),
        seed,
    )
    prev = None
    t0 = time.perf_counter()
    for i in range(n):
        name = f"f{i:07d}.parquet"
        os.link(seed, os.path.join(tbl.path, name))
        actions = [{
            "type": "add", "file": name, "rows": 1,
            "stats": {"k": {"min": i, "max": i, "nulls": 0}},
        }]
        if prev is not None:
            actions.append({"type": "remove", "file": prev})
        tbl._try_commit("merge", actions)
        prev = name
    dt = time.perf_counter() - t0
    print(f"build: {n} merge commits in {dt:.1f}s "
          f"({n / dt:.0f} commits/s, spark-free layer)")
    return tbl


def fold_ms(tbl, v=None, reps=5) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s = tbl.snapshot(v)
        ts.append((time.perf_counter() - t0) * 1000)
        assert len(s.files) <= 2
    return statistics.median(ts)


def main() -> None:
    import bootic_stats_aggregates_spark.acid as acid

    root = tempfile.mkdtemp(prefix="minilog_logscale_")
    try:
        tbl = build(root, N)
        print(f"log dir: {len(os.listdir(os.path.join(tbl.path, '_minilog')))}"
              f" entries (incl. {N // acid.CHECKPOINT_EVERY} checkpoints)")
        # 1. flatness across the log
        for v in [100, N // 10, N // 2, N - 1]:
            print(f"snapshot(v={v}): {fold_ms(tbl, v):.1f}ms")
        print(f"snapshot(latest): {fold_ms(tbl):.1f}ms")
        # 2. distance-from-checkpoint curve (at the top of the log)
        base = (N // acid.CHECKPOINT_EVERY - 1) * acid.CHECKPOINT_EVERY
        curve = {
            d: fold_ms(tbl, base + d)
            for d in range(0, acid.CHECKPOINT_EVERY,
                           max(1, acid.CHECKPOINT_EVERY // 5))
        }
        print("fold vs distance-past-checkpoint:",
              {d: f"{ms:.1f}ms" for d, ms in curve.items()})
        # 3. the honest O(log) op
        t0 = time.perf_counter()
        h = tbl.history()
        print(f"history(): {len(h)} commits in "
              f"{time.perf_counter() - t0:.2f}s (reads every entry by contract)")
    finally:
        shutil.rmtree(root, ignore_errors=True)

    # 4. checkpoint-interval sweep at N/5 commits each
    n = max(1000, N // 5)
    for interval in (10, 100, 1000):
        old = acid.CHECKPOINT_EVERY
        acid.CHECKPOINT_EVERY = interval
        root = tempfile.mkdtemp(prefix="minilog_logscale_")
        try:
            t = build(root, n)
            worst = interval * (n // interval) - 1  # farthest from a ckpt
            print(f"interval={interval}: snapshot(latest) "
                  f"{fold_ms(t):.1f}ms, worst-distance fold "
                  f"{fold_ms(t, worst):.1f}ms")
        finally:
            acid.CHECKPOINT_EVERY = old
            shutil.rmtree(root, ignore_errors=True)
    print("OK")


if __name__ == "__main__":
    main()

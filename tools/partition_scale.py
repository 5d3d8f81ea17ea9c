#!/usr/bin/env python
"""Hive-partitioned layout at scale: is directory-level pruning really
O(metadata), and does per-partition OPTIMIZE stay inside its scope?

(VERDICT r8 task 2 evidence.) Builds a table of P partitions x F files
each (appends through the real write path, so add actions carry the
partition values), then measures:

1. one-partition file selection — must return exactly F of P*F files,
   in driver-side microseconds (no data IO at all)
2. partition + stats composition — the day predicate prunes
   directories, the k range then prunes within the survivor
3. scoped OPTIMIZE (where=day) — compacts ONLY that partition's files;
   every other partition's file list is untouched
4. bytes touched by a one-partition read vs the full scan — the
   cold-cache/object-store win

Usage: python tools/partition_scale.py [partitions] [files_per_part]
Defaults: 64 x 8 = 512 files.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P = int(sys.argv[1]) if len(sys.argv) > 1 else 64
FPP = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ROWS = 2_000  # per file


def main() -> None:
    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.acid import MiniLogTable
    from bootic_stats_aggregates_spark.session import get_spark

    spark = get_spark("partition-scale")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="partition_scale_")
    try:
        tbl = MiniLogTable(
            spark, os.path.join(root, "t"),
            stats_cols=("k",), partition_by=("day",),
        )
        t0 = time.perf_counter()
        for f in range(FPP):
            df = spark.range(P * ROWS).select(
                (F.col("id") + f * P * ROWS).cast("long").alias("k"),
                (F.col("id") % P).cast("int").alias("day"),
            )
            # target_files=1: the partitionBy split then lands exactly
            # ONE file per partition value per append
            tbl.append(df, target_files=1)
        t_build = time.perf_counter() - t0
        snap = tbl.snapshot()
        n_files = len(snap.files)
        print(f"build: {P} partitions x {FPP} appends = {n_files} files "
              f"({P * ROWS * FPP} rows) in {t_build:.1f}s")
        assert all(f.partition for f in snap.files)

        t0 = time.perf_counter()
        sel = tbl.select_files(prune=("day", 17, 17))
        t_sel = time.perf_counter() - t0
        print(f"one-partition selection: {len(sel)}/{n_files} files in "
              f"{t_sel * 1000:.1f}ms driver-side (zero data IO)")
        assert len(sel) == FPP, (len(sel), FPP)
        assert all(f"day=17{os.sep}" in p for p in sel)

        # composition: directory prune, then k-stats prune within it
        lo = 2 * P * ROWS  # k range written only by append f=2
        t0 = time.perf_counter()
        sel2 = tbl.select_files(
            prune=[("day", 17, 17), ("k", lo, lo + P - 1)]
        )
        t_sel2 = time.perf_counter() - t0
        print(f"partition+stats composition: {len(sel2)}/{n_files} files "
              f"in {t_sel2 * 1000:.1f}ms (directory prune x min/max "
              f"residual)")
        assert 0 < len(sel2) < FPP

        others = {
            f.file for f in snap.files if f.partition.get("day") != 17
        }
        t0 = time.perf_counter()
        info = tbl.optimize(target_rows=10_000_000, where=("day", 17, 17))
        t_opt = time.perf_counter() - t0
        snap2 = tbl.snapshot()
        others2 = {
            f.file for f in snap2.files if f.partition.get("day") != 17
        }
        n17 = sum(1 for f in snap2.files if f.partition.get("day") == 17)
        print(f"scoped OPTIMIZE day=17: {info['compacted']} files -> "
              f"{n17} in {t_opt:.1f}s; other partitions untouched: "
              f"{others == others2}")
        assert others == others2
        assert n17 == 1

        b_sel = sum(os.path.getsize(p) for p in tbl.select_files(
            prune=("day", 3, 3)
        ))
        b_all = sum(os.path.getsize(p) for p in tbl.select_files())
        n_rows = tbl.read(prune=("day", 3, 3)).count()
        print(f"one-partition read: {b_sel / b_all:.2%} of table bytes "
              f"({n_rows} rows) — the {b_all / b_sel:.0f}x IO win "
              f"directory pruning buys before any stats/bloom skipping")
        print("OK")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

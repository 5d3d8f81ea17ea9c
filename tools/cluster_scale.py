#!/usr/bin/env python
"""Incremental (liquid-style) clustering at scale: O(new data) per
pass, not O(table).

Builds an initial table of BATCHES appends x ROWS rows with a fully
interleaved key domain (every file spans the whole range, so an
unclustered read of a key band touches everything), declares the
clustering key, and then measures:

1. PASS 1 (cold): clusters the whole backlog — the one full-scope cost.
2. PASS 2 after one fresh append: must rewrite ONLY the files appended
   since pass 1 (the Delta liquid-clustering contract) — the log pins
   the exact file sets before/after.
3. CONVERGED pass: zero files, ZERO commits.
4. Band-read selectivity before/after: post-clustering, a key-band
   read (via stats pruning) touches ~1/TARGET of the files instead of
   all of them — what the pass actually buys.

Usage: python tools/cluster_scale.py [batches] [rows_per_batch]
Defaults: 8 x 250_000 = 2M rows.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000
TARGET = 8


def main() -> None:
    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.acid import MiniLogTable
    from bootic_stats_aggregates_spark.session import get_spark

    spark = get_spark("cluster-scale")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="cluster_scale_")
    try:
        tbl = MiniLogTable(
            spark, os.path.join(root, "t"), stats_cols=("k",)
        )
        domain = BATCHES * ROWS
        for b in range(BATCHES):
            # stride the key so EVERY file spans the whole domain:
            # stats pruning is useless until the data is clustered
            tbl.append(
                spark.range(ROWS).select(
                    ((F.col("id") * BATCHES + b) % domain).alias("k"),
                    F.col("id").alias("payload"),
                )
            )
        n0 = len(tbl.select_files())
        band = (0, domain // TARGET - 1)
        pre_band = len(tbl.select_files(prune=("k", *band)))
        print(
            f"backlog: {n0} files x {ROWS} rows, interleaved domain "
            f"{domain}; band read pre-clustering scans {pre_band}/{n0}"
        )
        tbl.set_cluster_keys(("k",))
        t0 = time.time()
        r1 = tbl.optimize_cluster(target_files=TARGET)
        t1 = time.time() - t0
        files_p1 = {f.file for f in tbl.snapshot().files}
        print(
            f"pass 1 (backlog): reclustered {r1['reclustered']} files "
            f"-> {len(files_p1)} in {t1:.2f}s (epoch {r1['epoch']})"
        )
        # fresh churn lands unclustered
        tbl.append(
            spark.range(ROWS).select(
                ((F.col("id") * 17) % domain).alias("k"),
                F.col("id").alias("payload"),
            )
        )
        fresh = {f.file for f in tbl.snapshot().files} - files_p1
        t0 = time.time()
        r2 = tbl.optimize_cluster(target_files=1)
        t2 = time.time() - t0
        survivors = {f.file for f in tbl.snapshot().files}
        untouched = files_p1 & survivors
        assert r2["reclustered"] == len(fresh), (r2, len(fresh))
        assert untouched == files_p1, "pass 2 touched a converged file"
        print(
            f"pass 2 (incremental): reclustered {r2['reclustered']} "
            f"file(s) = exactly the {len(fresh)} appended since pass 1, "
            f"in {t2:.2f}s; all {len(files_p1)} pass-1 files untouched "
            f"(O(new data), not O(table))"
        )
        v = tbl.version
        r3 = tbl.optimize_cluster()
        assert r3["reclustered"] == 0 and tbl.version == v
        print("converged pass: 0 files, 0 commits")
        post_band = len(tbl.select_files(prune=("k", *band)))
        total = len(tbl.select_files())
        print(
            f"band read post-clustering scans {post_band}/{total} files "
            f"(was {pre_band}/{n0}): "
            f"{pre_band / n0 / (post_band / total):.1f}x less IO"
        )
        n = tbl.read().count()
        assert n == (BATCHES + 1) * ROWS, n
        print(f"row count stable through all passes: {n}")
        print("OK")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Z-order layout vs single-column sort: measured row-group pruning.

layout_zorder claims the Morton interleave gives tight parquet row-group
min/max stats on BOTH predicate dimensions, so a 2-D box query skips most
of the file, while a linear (single-column) sort is tight on its leading
column only. This tool makes the claim a number: it writes the SAME
synthetic events three ways — unsorted, sorted by user, z-sorted — then

1. reads every parquet footer (pyarrow) and counts row groups whose
   (user, hour) stats-box intersects a 1/16 x 1/16 query box — the exact
   set a stats-pruning scan must touch, engine-independent;
2. times the Spark filter-count on each layout (row-group skipping is
   applied by the parquet reader after predicate pushdown).

Usage: python tools/zorder_scale.py [n_rows]   (default 10_000_000)
Prints one JSON line per layout.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def touched_row_groups(path: str, lo_x: int, hi_x: int, lo_y: int, hi_y: int):
    import pyarrow.parquet as pq

    total = touched = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        cols = {md.row_group(0).column(i).path_in_schema: i
                for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            sx = g.column(cols["xb"]).statistics
            sy = g.column(cols["yb"]).statistics
            total += 1
            if sx.min <= hi_x and sx.max >= lo_x and sy.min <= hi_y and sy.max >= lo_y:
                touched += 1
    return touched, total


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000

    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.layout import _interleave_sql
    from bootic_stats_aggregates_spark.session import get_spark

    spark = get_spark("zorder-scale")
    root = tempfile.mkdtemp(prefix="zorder_scale_")

    # synthetic events: 256 user buckets x 256 hour buckets, decorrelated
    base = spark.range(n).select(
        ((F.col("id") * 2654435761) % 1000000007 % 256).cast("long").alias("xb"),
        ((F.col("id") * 48271) % 999983 % 256).cast("long").alias("yb"),
        (F.col("id") % 100).cast("long").alias("payload"),
    )
    z = F.expr(_interleave_sql("xb", "yb", 8))
    layouts = {
        "unsorted": base.repartition(16),
        "user_sorted": base.repartitionByRange(16, "xb").sortWithinPartitions("xb"),
        "zorder": base.withColumn("z", z)
        .repartitionByRange(16, "z")
        .sortWithinPartitions("z")
        .drop("z"),
    }
    # three predicate shapes: 16-wide stripes (1/16 of one dimension) and
    # their intersection box. The single-column sort prunes only its
    # leading dimension; Z-order prunes all three shapes.
    queries = {
        "x_stripe": (96, 111, 0, 255),
        "y_stripe": (0, 255, 160, 175),
        "xy_box": (96, 111, 160, 175),
    }
    for name, df in layouts.items():
        path = os.path.join(root, name)
        df.write.mode("overwrite").parquet(path)
        for qname, (lo_x, hi_x, lo_y, hi_y) in queries.items():
            pred = (
                (F.col("xb") >= lo_x) & (F.col("xb") <= hi_x)
                & (F.col("yb") >= lo_y) & (F.col("yb") <= hi_y)
            )
            touched, total = touched_row_groups(path, lo_x, hi_x, lo_y, hi_y)
            scan = spark.read.parquet(path).filter(pred)
            n_match = scan.count()  # warm
            t0 = time.monotonic()
            scan.count()
            dt = time.monotonic() - t0
            print(json.dumps({
                "layout": name, "query": qname, "n_rows": n,
                "n_match": n_match,
                "row_groups_touched": touched, "row_groups_total": total,
                "touched_frac": round(touched / total, 4),
                "scan_sec": round(dt, 4),
            }), flush=True)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

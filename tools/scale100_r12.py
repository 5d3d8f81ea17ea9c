#!/usr/bin/env python
"""Round-12 100x scale probes (VERDICT r11 tasks 4 + 8).

1. WRITE PATH at 100x: scale100_r11 covered reads; this stages the
   60M-row replicated lineitem as a MiniLog table (64 files) and
   measures the three general-predicate DML verbs the SQL surface
   lowers onto — `update_where` (point predicate), `delete_predicate_dv`
   (merge-on-read ~0.1%-selectivity delete), and `merge_clauses`
   (100k-row upsert) — with per-stage shuffle/spill metrics from the
   UI REST API, the DV sidecar size (criterion: O(deleted rows), not
   O(table)), and the commit-log entry size. No-spill criterion as in
   the read probe.

2. ANN RECALL-vs-NPROBE at 100x: recall@10 of the IVF search against
   brute-force ground truth across nprobe in {1, 2, 4, 8} on the 200k-
   vector replicated corpus — the measured accuracy trade-off behind
   the "probe nprobe/16 of the cells" pruning story.

Writes tools/scale100_r12.log and merges a "scale100_write" block into
BENCH_FULL.json. Usage:
    python tools/scale100_r12.py [--mult 100] [--write-only|--ann-only]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")
os.environ.setdefault(
    "SPARK_GRAFT_MAX_PARTITION_BYTES", str(32 * 1024 * 1024)
)
os.environ["SPARK_GRAFT_CACHE_TABLES"] = "0"
os.environ["SPARK_GRAFT_AQE"] = "true"

from scale100_r11 import (  # noqa: E402  (shared probe plumbing)
    _spark,
    _stage_ids,
    _stage_llm_tables,
    _stage_metrics,
)


def _timed_verb(spark, label, fn):
    """Wall time + completed-stage metrics + result dict of one verb."""
    before = _stage_ids(spark)
    t0 = time.perf_counter()
    res = fn()
    wall = round(time.perf_counter() - t0, 3)
    m = _stage_metrics(spark, before)
    return {"verb": label, "wall_sec": wall, "result": res, "stages": m}


def _dv_bytes(tbl) -> int:
    return sum(
        os.path.getsize(os.path.join(tbl.path, f.dv))
        for f in tbl.snapshot().files
        if f.dv
    )


def write_path_probe(spark, dest: str) -> dict:
    """Stage 60M lineitem rows as MiniLog, run the three DML verbs."""
    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.acid import MiniLogTable
    from bootic_stats_aggregates_spark.io import table

    li = table(spark, dest, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )
    n_rows = li.count()
    path = os.path.join(dest, "_writepath_minilog")
    shutil.rmtree(path, ignore_errors=True)
    tbl = MiniLogTable(spark, path, stats_cols=("l_partkey",))
    t0 = time.perf_counter()
    tbl.append(li.repartition(64), target_files=64)
    stage_sec = round(time.perf_counter() - t0, 1)
    files = tbl.snapshot().files
    data_bytes = sum(
        os.path.getsize(os.path.join(path, f.file)) for f in files
    )

    probes = []
    # 1. point UPDATE: find-touched-files scan over 60M rows, rewrite
    #    only the files holding the matched partkey
    pk = li.agg(F.max("l_partkey")).collect()[0][0] // 2
    probes.append(
        _timed_verb(
            spark,
            "update_where(point)",
            lambda: tbl.update_where(
                {"l_quantity": "l_quantity + 1"},
                f"l_partkey = {pk}",
            ),
        )
    )
    # 2. merge-on-read DELETE of ~0.06% of rows: sidecar must be
    #    O(deleted rows)
    probes.append(
        _timed_verb(
            spark,
            "delete_predicate_dv(0.1pct)",
            lambda: tbl.delete_predicate_dv("l_orderkey % 1024 = 7"),
        )
    )
    dv_rows = probes[-1]["result"].get("dv_rows", 0)
    probes[-1]["dv_sidecar_bytes"] = _dv_bytes(tbl)
    probes[-1]["dv_bytes_per_deleted_row"] = (
        round(probes[-1]["dv_sidecar_bytes"] / dv_rows, 2)
        if dv_rows
        else None
    )
    # 3. MERGE upsert: 50k updates + 50k inserts against 60M rows
    maxo = li.agg(F.max("l_orderkey")).collect()[0][0]
    # the synthetic lineitem is NOT unique on (l_orderkey,
    # l_linenumber) — dedupe so the MERGE source satisfies the
    # unique-keys contract (multiple matches per base row raise)
    src = (
        table(spark, dest, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .filter(F.col("l_orderkey") % 1024 == 3)
        .dropDuplicates(["l_orderkey", "l_linenumber"])
        .limit(100_000)
    )
    upd = src.limit(50_000).withColumn(
        "l_quantity", F.col("l_quantity") + 100
    )
    ins = (
        src.withColumn("l_orderkey", F.col("l_orderkey") + maxo + 1)
        .limit(50_000)
    )
    probes.append(
        _timed_verb(
            spark,
            "merge_clauses(100k upsert)",
            lambda: tbl.merge_clauses(
                upd.unionByName(ins),
                keys=("l_orderkey", "l_linenumber"),
                matched=({"action": "update", "set": None, "condition": None},),
                not_matched=({"action": "insert", "values": None, "condition": None},),
            ),
        )
    )
    # commit-log cost: the whole table state is O(#files) metadata
    log_bytes = sum(
        os.path.getsize(os.path.join(path, "_minilog", f))
        for f in os.listdir(os.path.join(path, "_minilog"))
        if not f.startswith("_tmp")
    )
    spill = sum(p["stages"]["disk_spilled_bytes"] for p in probes)
    out = {
        "table_rows": n_rows,
        "table_files": len(files),
        "table_data_bytes": data_bytes,
        "stage_append_sec": stage_sec,
        "verbs": probes,
        "commit_log_bytes": log_bytes,
        "disk_spill_total_bytes": spill,
    }
    shutil.rmtree(path, ignore_errors=True)
    return out


def ann_recall_curve(spark, dest: str, k: int = 10) -> dict:
    """recall@k of ivf_topk vs brute-force ground truth, per nprobe."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import bootic_stats_aggregates_spark.llm.similarity as S

    e = S._scored_vectors(spark, dest).filter(F.col("nrm") > 0)
    q = S._q_side(e.filter(F.col("vec_id") < S.N_QUERIES))
    brute = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_vec_id"))
        .select("q_vec_id", "vec_id", S._pair_cos().alias("cos_sim"))
        .withColumn(
            "rk", F.row_number().over(S._topk_window()).cast("long")
        )
        .filter(F.col("rk") <= k)
        .select("q_vec_id", F.col("vec_id").alias("b_vec_id"))
    )
    brute.cache()
    n_truth = brute.count()  # = N_QUERIES * k
    curve = {}
    for nprobe in (1, 2, 4, 8):
        t0 = time.perf_counter()
        ann = S.ivf_topk(spark, dest, nprobe=nprobe, k=k).select(
            "q_vec_id", F.col("vec_id").alias("a_vec_id")
        )
        hits = brute.join(
            ann,
            (brute.q_vec_id == ann.q_vec_id)
            & (F.col("b_vec_id") == F.col("a_vec_id")),
            "left_semi",
        ).count()
        curve[f"nprobe={nprobe}"] = {
            "recall_at_k": round(hits / n_truth, 4),
            "search_sec": round(time.perf_counter() - t0, 3),
            "probed_fraction": round(nprobe / S.IVF_CELLS, 4),
        }
    brute.unpersist()
    return {
        "k": k,
        "n_queries": S.N_QUERIES,
        "cells": S.IVF_CELLS,
        "ground_truth_pairs": n_truth,
        "curve": curve,
    }


def main(mult: int, write_only: bool, ann_only: bool) -> None:
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    from bootic_stats_aggregates_spark.scalebench import stage_replicated

    sf_dir = "/root/testdata/sf0.1"
    dest = stage_replicated(spark, sf_dir, mult=mult)
    _stage_llm_tables(spark, sf_dir, dest, mult)

    record: dict = {"mult": mult}
    if not ann_only:
        record["write_path"] = write_path_probe(spark, dest)
    if not write_only:
        record["ann_recall"] = ann_recall_curve(spark, dest)

    out = os.path.join(REPO, "tools", "scale100_r12.log")
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
    bf = os.path.join(REPO, "BENCH_FULL.json")
    try:
        full = json.load(open(bf))
    except (OSError, ValueError):
        full = {}
    full["scale100_write"] = record
    with open(bf, "w") as fh:
        json.dump(full, fh, indent=1)
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--write-only", action="store_true")
    ap.add_argument("--ann-only", action="store_true")
    a = ap.parse_args()
    main(a.mult, a.write_only, a.ann_only)

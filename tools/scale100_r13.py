#!/usr/bin/env python
"""Round-13 100x scale probes (VERDICT r12 tasks 2, 4, 5).

1. DV-UPDATE vs COPY-ON-WRITE at 100x (task 2): the same point UPDATE
   that rewrote 64/64 files in ~149 s under copy-on-write (r12 probe)
   executed through the new merge-on-read `update_predicate_dv` —
   criterion: write volume O(changed rows) (a page-sized DV sidecar +
   one replacement file), zero data-file rewrites. The copy-on-write
   verb runs beside it on the same table as the baseline.

2. CLUSTERING-COMPOSED DML (task 5, tools/cluster_dml_r13.log): on the
   SAME 60M-row table, `set_cluster_keys` on the update key +
   `optimize_cluster`, then the same point `update_where` — touched
   files must collapse from 64/64 to O(1), proving the clustering op
   buys DML write scope, not just read pruning.

3. NON-DEGENERATE ANN RECALL CORPUS (task 4): recall@10-vs-nprobe on a
   CLUSTERED mixture-of-Gaussians 200k-vector corpus (48 generative
   centers, hash-deterministic uniform noise, sigma tuned so the curve
   actually trades off: ~0.55 at nprobe=1 rising to 1.0) instead of
   the near-orthogonal replicated fixture whose curve saturated at 1.0
   from nprobe=1 (r12 log's honest disclosure).

Writes tools/scale100_r13.log + tools/cluster_dml_r13.log and merges a
"scale100_r13" block into BENCH_FULL.json. Usage:
    python tools/scale100_r13.py [--mult 100] [--dml-only|--ann-only]
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

from scale100_r11 import _spark  # noqa: E402  (shared probe plumbing)
from scale100_r12 import _dv_bytes, _timed_verb  # noqa: E402

#: mixture-of-Gaussians corpus shape (tuned in-round: sigma 1.2 over
#: unit-normal centers gives recall@10 ~0.55 at nprobe=1 on 20k rows)
MOG_CENTERS = 48
MOG_SIGMA = 1.2
MOG_ROWS = 200_000


def dml_probes(spark, dest: str) -> tuple[dict, dict]:
    """One 60M-row / 64-file staging, three acts: DV update, CoW
    update (the r12 baseline), then cluster-by-key + the same point
    update again (write-scope collapse)."""
    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.acid import MiniLogTable
    from bootic_stats_aggregates_spark.io import table

    li = table(spark, dest, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )
    n_rows = li.count()
    path = os.path.join(dest, "_dvupdate_minilog")
    shutil.rmtree(path, ignore_errors=True)
    tbl = MiniLogTable(spark, path, stats_cols=("l_partkey",))
    t0 = time.perf_counter()
    tbl.append(li.repartition(64), target_files=64)
    stage_sec = round(time.perf_counter() - t0, 1)
    files0 = tbl.snapshot().files
    data_bytes = sum(
        os.path.getsize(os.path.join(path, f.file)) for f in files0
    )
    maxpk = li.agg(F.max("l_partkey")).collect()[0][0]

    # --- act 1: merge-on-read point UPDATE (the new verb)
    pk_dv = maxpk // 2
    names0 = {f.file for f in files0}
    p_dv = _timed_verb(
        spark,
        "update_predicate_dv(point)",
        lambda: tbl.update_predicate_dv(
            {"l_quantity": "l_quantity + 1"}, f"l_partkey = {pk_dv}"
        ),
    )
    snap1 = tbl.snapshot()
    repl = [f for f in snap1.files if f.file not in names0]
    p_dv["dv_sidecar_bytes"] = _dv_bytes(tbl)
    p_dv["replacement_files"] = len(repl)
    p_dv["replacement_bytes"] = sum(
        os.path.getsize(os.path.join(path, f.file)) for f in repl
    )
    p_dv["write_volume_bytes"] = (
        p_dv["dv_sidecar_bytes"] + p_dv["replacement_bytes"]
    )
    upd = p_dv["result"].get("updated", 0)
    p_dv["write_bytes_per_updated_row"] = (
        round(p_dv["write_volume_bytes"] / upd, 1) if upd else None
    )

    # --- act 2: the copy-on-write baseline (r12's 149 s shape)
    pk_cow = maxpk // 3
    p_cow = _timed_verb(
        spark,
        "update_where(point, copy-on-write)",
        lambda: tbl.update_where(
            {"l_quantity": "l_quantity + 1"}, f"l_partkey = {pk_cow}"
        ),
    )

    # --- act 3 (cluster_dml_r13.log): cluster by the update key, then
    # the same point update — touched files collapse to O(1)
    pre_files = len(tbl.snapshot().files)
    t0 = time.perf_counter()
    tbl.set_cluster_keys(("l_partkey",))
    c1 = tbl.optimize_cluster(target_files=64)
    cluster_sec = round(time.perf_counter() - t0, 1)
    pk_post = maxpk // 5
    p_post = _timed_verb(
        spark,
        "update_where(point, after cluster-by-key)",
        lambda: tbl.update_where(
            {"l_quantity": "l_quantity + 1"}, f"l_partkey = {pk_post}"
        ),
    )
    cluster_rec = {
        "note": (
            "set_cluster_keys(l_partkey) + optimize_cluster, then the "
            "same point update_where that previously rewrote every "
            "file — write scope must collapse to O(1) files"
        ),
        "table_rows": n_rows,
        "files_before_clustering": pre_files,
        "recluster": {"sec": cluster_sec, **c1},
        "update_before": {
            "wall_sec": p_cow["wall_sec"],
            "rewritten": p_cow["result"].get("rewritten"),
        },
        "update_after": {
            "wall_sec": p_post["wall_sec"],
            "rewritten": p_post["result"].get("rewritten"),
        },
    }
    dml_rec = {
        "table_rows": n_rows,
        "table_files": len(files0),
        "table_data_bytes": data_bytes,
        "stage_append_sec": stage_sec,
        "verbs": [p_dv, p_cow, p_post],
        "disk_spill_total_bytes": sum(
            p["stages"]["disk_spilled_bytes"]
            for p in (p_dv, p_cow, p_post)
        ),
    }
    shutil.rmtree(path, ignore_errors=True)
    return dml_rec, cluster_rec


def stage_mog_corpus(spark, rows: int = MOG_ROWS) -> str:
    """Clustered mixture-of-Gaussians embeddings: 48 unit-normal
    centers (seed 123), each vector = its center + hash-deterministic
    uniform noise in [-sigma, sigma] per dim — fully reproducible
    regardless of partitioning (no partition-seeded randn)."""
    import numpy as np
    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.llm.similarity import EMB_DIM

    out = f"/tmp/bootic_scale/mog_{rows}_{MOG_CENTERS}_{MOG_SIGMA}"
    marker = os.path.join(out, "_STAGED")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    centers = np.round(
        np.random.RandomState(123).normal(size=(MOG_CENTERS, EMB_DIM)), 4
    )
    center_lit = "array(%s)" % ",".join(
        "array(%s)" % ",".join(repr(float(v)) for v in centers[g])
        for g in range(MOG_CENTERS)
    )
    df = (
        spark.range(rows)
        .select(F.col("id").alias("vec_id"))
        .withColumn("gid", (F.col("vec_id") % MOG_CENTERS).cast("int"))
        .withColumn(
            "embedding",
            F.expr(
                f"transform(sequence(0, {EMB_DIM - 1}), i -> "
                f"CAST(element_at({center_lit}, gid + 1)[i] "
                f"+ (pmod(xxhash64(vec_id, i, 99), 100000) / 100000.0 "
                f"- 0.5) * {2 * MOG_SIGMA} AS FLOAT))"
            ),
        )
        .withColumn("label", F.concat(F.lit("c"), F.col("gid")))
        .select("vec_id", "label", "embedding")
    )
    df.repartition(16).write.parquet(
        os.path.join(out, "embeddings.parquet")
    )
    open(marker, "w").close()
    return out


def ann_mog_curve(spark, k: int = 10) -> dict:
    """recall@k of ivf_topk vs brute-force ground truth per nprobe, on
    the CLUSTERED corpus (the r12 near-orthogonal corpus saturated at
    recall 1.0 from nprobe=1 and measured nothing)."""
    from pyspark.sql import functions as F

    import bootic_stats_aggregates_spark.llm.similarity as S

    corpus = stage_mog_corpus(spark)
    e = S._scored_vectors(spark, corpus).filter(F.col("nrm") > 0)
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
    n_truth = brute.count()
    curve = {}
    for nprobe in (1, 2, 4, 8, 16):
        t0 = time.perf_counter()
        ann = S.ivf_topk(spark, corpus, nprobe=nprobe, k=k).select(
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
        "corpus": "mixture-of-gaussians",
        "rows": MOG_ROWS,
        "centers": MOG_CENTERS,
        "sigma": MOG_SIGMA,
        "k": k,
        "n_queries": S.N_QUERIES,
        "cells": S.IVF_CELLS,
        "ground_truth_pairs": n_truth,
        "curve": curve,
    }


def main(mult: int, dml_only: bool, ann_only: bool) -> None:
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")

    record: dict = {"mult": mult}
    if not ann_only:
        from bootic_stats_aggregates_spark.scalebench import (
            stage_replicated,
        )

        dest = stage_replicated(spark, "/root/testdata/sf0.1", mult=mult)
        dml, cluster = dml_probes(spark, dest)
        record["dv_update"] = dml
        record["cluster_dml"] = cluster
        with open(
            os.path.join(REPO, "tools", "cluster_dml_r13.log"), "w"
        ) as fh:
            json.dump(cluster, fh, indent=1)
    if not dml_only:
        record["ann_recall_mog"] = ann_mog_curve(spark)

    out = os.path.join(REPO, "tools", "scale100_r13.log")
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
    bf = os.path.join(REPO, "BENCH_FULL.json")
    try:
        full = json.load(open(bf))
    except (OSError, ValueError):
        full = {}
    full["scale100_r13"] = record
    with open(bf, "w") as fh:
        json.dump(full, fh, indent=1)
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--dml-only", action="store_true")
    ap.add_argument("--ann-only", action="store_true")
    a = ap.parse_args()
    main(a.mult, a.dml_only, a.ann_only)

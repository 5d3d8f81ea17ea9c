#!/usr/bin/env python
"""mult=100 scale probe (VERDICT r10 task 5): the headline suite plus
one dedup and one ANN operator at 100x sf0.1 — 60M-row lineitem, 500k
documents, 200k embeddings — with PER-STAGE shuffle/spill metrics from
the live UI REST API. This is the closest local[32] gets to the 100x
claim: if cost/row holds from 1x→10x→100x and no stage spills toward
OOM, the same shuffle/broadcast structure is what a 1000-executor
cluster runs.

Replication is key-shifted (scalebench.stage_replicated); documents
get per-copy-uniquified text (identical copies would hand the dedup
probe a degenerate 100-way-duplicate corpus and measure the duplicate
explosion, not the engine), embeddings get a tiny per-copy first-
component perturbation for the same reason.

Writes tools/scale100_r11.log and merges a "scale100" block into
BENCH_FULL.json (bench.py carries the block forward on its own runs).

Usage: python tools/scale100_r11.py [--mult 100] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# knobs BEFORE package import: 100x shuffles are real (2 GB lineitem),
# so a wider fan-out than the sf0.1 bench grid; splits at 32 MB keep
# ~64 scan tasks on 32 cores.
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", str(32 * 1024 * 1024))
os.environ["SPARK_GRAFT_CACHE_TABLES"] = "0"
os.environ["SPARK_GRAFT_AQE"] = "true"

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _spark():
    from pyspark.sql import SparkSession

    from bootic_stats_aggregates_spark.session import tune

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    return tune(
        SparkSession.builder.appName("scale100")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "28g"))
        .config("spark.ui.enabled", "true")  # REST metrics source
        .config("spark.ui.port", "4047")
        .config("spark.sql.warehouse.dir", "/tmp/spark-warehouse")
        .config("spark.locality.wait", "0ms")
        .config("spark.scheduler.revive.interval", "1ms")
        .getOrCreate()
    )


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def _stage_ids(spark) -> set:
    return {
        (s["stageId"], s["attemptId"])
        for s in _rest(spark, "/stages?status=complete")
    }


def _stage_metrics(spark, before: set) -> dict:
    """Aggregate shuffle/spill/input metrics of stages completed since
    ``before`` — the per-query scale fingerprint. The UI status store
    is fed by an ASYNC listener bus, so a read issued right after
    collect() can miss the heavy scan stage (it shows once the bus
    drains); wait for zero active stages + a stable complete-count
    first."""
    deadline = time.time() + 15
    last = -1
    while time.time() < deadline:
        active = _rest(spark, "/stages?status=active")
        n = len(_rest(spark, "/stages?status=complete"))
        if not active and n == last:
            break
        last = n
        time.sleep(0.5)
    agg = {
        "stages": 0,
        "input_records": 0,
        "shuffle_read_bytes": 0,
        "shuffle_write_bytes": 0,
        "memory_spilled_bytes": 0,
        "disk_spilled_bytes": 0,
    }
    for s in _rest(spark, "/stages?status=complete"):
        if (s["stageId"], s["attemptId"]) in before:
            continue
        agg["stages"] += 1
        # inputRecords, not inputBytes: the local vectorized parquet
        # reader underreports bytesRead via FS statistics (probed:
        # 60M-row scan shows 232 KB inputBytes but exact inputRecords)
        agg["input_records"] += s.get("inputRecords", 0)
        agg["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
        agg["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
        agg["memory_spilled_bytes"] += s.get("memoryBytesSpilled", 0)
        agg["disk_spilled_bytes"] += s.get("diskBytesSpilled", 0)
    return agg


def _stage_llm_tables(spark, sf_dir: str, dest: str, mult: int) -> None:
    """100x documents (uniquified text) + embeddings (perturbed) +
    symlinks for the small untouched dims, so `dest` is a complete sf
    layout every registered builder runs on unchanged."""
    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.io import table

    marker = os.path.join(dest, "_LLM_STAGED")
    if not os.path.exists(marker):
        docs = table(spark, sf_dir, "documents")
        stride = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        rep = docs.withColumn(
            "__c", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
        )
        rep = (
            rep.withColumn(
                "doc_id", F.col("doc_id") + F.col("__c") * F.lit(stride)
            )
            .withColumn(
                "text",
                F.when(F.col("__c") == 0, F.col("text")).otherwise(
                    F.concat(
                        F.col("text"), F.lit(" cp"), F.col("__c")
                    )
                ),
            )
            .withColumn("n_chars", F.length("text").cast("long"))
            .drop("__c")
        )
        rep.repartition(32).write.mode("overwrite").parquet(
            os.path.join(dest, "documents.parquet")
        )
        emb = table(spark, sf_dir, "embeddings")
        estride = emb.agg(F.max("vec_id")).collect()[0][0] + 1
        erep = (
            emb.withColumn(
                "__c", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
            )
            .withColumn(
                "vec_id", F.col("vec_id") + F.col("__c") * F.lit(estride)
            )
            .withColumn(
                "embedding",
                F.expr(
                    "transform(embedding, (x, i) -> CASE WHEN i = 0 "
                    "THEN CAST(x + __c * 0.0001 AS FLOAT) ELSE x END)"
                ),
            )
            .drop("__c")
        )
        erep.repartition(16).write.mode("overwrite").parquet(
            os.path.join(dest, "embeddings.parquet")
        )
        open(marker, "w").close()
    for t in TABLES:
        link = os.path.join(dest, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(sf_dir, f"{t}.parquet"), link)


def _fresh_time(spark, qid: str, dest: str, runs: int) -> tuple[float, dict]:
    """min-of-runs fresh wall clock + stage metrics of the LAST run."""
    from bootic_stats_aggregates_spark.registry import all_queries

    fn = all_queries()[qid]
    raw = getattr(fn, "__wrapped__", fn)
    raw(spark, dest).count()  # warm-up: codegen + page cache
    samples, metrics = [], {}
    for i in range(runs):
        df = raw(spark, dest)
        try:
            df._jdf.queryExecution().executedPlan()
        except Exception:
            df.schema
        before = _stage_ids(spark)
        t0 = time.perf_counter()
        df.count()
        samples.append(time.perf_counter() - t0)
        metrics = _stage_metrics(spark, before)
    return round(min(samples), 4), metrics


def _duck_time(dest: str, sql: str, runs: int = 2) -> float:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(dest, f"{t}.parquet")
        glob = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')"
        )
    wrapped = f"SELECT count(*) FROM ({sql})"
    con.execute(wrapped).fetchall()  # warm
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        con.execute(wrapped).fetchall()
        samples.append(time.perf_counter() - t0)
    con.close()
    return round(min(samples), 4)


def main(mult: int, runs: int, metrics_only: bool = False) -> dict:
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    from bootic_stats_aggregates_spark.registry import all_oracles
    from bootic_stats_aggregates_spark.scalebench import (
        HEADLINE,
        run_scale_bench,
        stage_replicated,
    )

    sf_dir = "/root/testdata/sf0.1"
    t0 = time.time()
    dest = stage_replicated(spark, sf_dir, mult=mult)
    _stage_llm_tables(spark, sf_dir, dest, mult)
    staged_sec = round(time.time() - t0, 1)

    out = os.path.join(REPO, "tools", "scale100_r11.log")
    if metrics_only:
        # re-capture ONLY the stage metrics over the already-staged
        # data, keeping the prior run's timing block
        prior = json.load(open(out))
        block = prior["headline"]
        staged_sec = prior["staged_sec"]
    else:
        # headline suite: the scalebench protocol (duck warm vs spark
        # fresh + steady) at 100x
        block = run_scale_bench(
            spark, sf_dir=sf_dir, mult=mult, runs=runs
        )
    # per-query stage metrics: one extra fresh execution each
    metrics = {}
    from bootic_stats_aggregates_spark.registry import all_queries

    queries = all_queries()
    for name, qid in HEADLINE.items():
        fn = queries[qid]
        raw = getattr(fn, "__wrapped__", fn)
        before = _stage_ids(spark)
        raw(spark, dest).collect()
        metrics[name] = _stage_metrics(spark, before)

    # LLM-pipeline probes: exact dedup (hash-window over 500k docs) and
    # IVF ANN (cell-pruned cosine over 200k vectors)
    oracles = all_oracles()
    probes = {}
    for qid in ("llm_exact_dedup", "llm_ann_ivf"):
        sec, m = _fresh_time(spark, qid, dest, runs)
        dsec = _duck_time(dest, oracles[qid], runs=2)
        probes[qid] = {
            "spark_fresh_sec": sec,
            "duckdb_sec": dsec,
            "ratio": round(sec / dsec, 2) if dsec else None,
            "stage_metrics": m,
        }

    spill = sum(
        m["disk_spilled_bytes"] for m in metrics.values()
    ) + sum(p["stage_metrics"]["disk_spilled_bytes"] for p in probes.values())
    record = {
        "mult": mult,
        "staged_sec": staged_sec,
        "headline": block,
        "headline_stage_metrics": metrics,
        "llm_probes": probes,
        "disk_spill_total_bytes": spill,
        "note": (
            "stage metrics from the UI REST API over one fresh "
            "execution per query; documents text uniquified per copy "
            "(an identical-copy corpus would measure duplicate "
            "explosion, not throughput); no-OOM criterion = every "
            "query completes with bounded disk spill"
        ),
    }
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
    # merge into BENCH_FULL.json (bench.py preserves the block)
    bf = os.path.join(REPO, "BENCH_FULL.json")
    try:
        full = json.load(open(bf))
    except (OSError, ValueError):
        full = {}
    full["scale100"] = record
    with open(bf, "w") as fh:
        json.dump(full, fh, indent=1)
    print(
        json.dumps(
            {
                "mult": mult,
                "suite_ratio_steady": block.get("suite_ratio_steady"),
                "suite_ratio_fresh": block.get("suite_ratio_fresh"),
                "llm": {
                    k: v["ratio"] for k, v in probes.items()
                },
                "disk_spill_total_bytes": spill,
            }
        )
    )
    return record


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--metrics-only", action="store_true")
    a = ap.parse_args()
    main(a.mult, a.runs, metrics_only=a.metrics_only)

#!/usr/bin/env python
"""SemDeDup at scale: cell confinement ratio + the Arrow/BLAS inner loop.

llm_semdedup's registered form scores within-cell pairs with native
higher-order-function folds — exact-oracle-friendly and fine at fixture
scale, but HOF lambdas run on Catalyst's INTERPRETED path (no codegen),
so per-pair folds dominate once cells hold thousands of vectors
(measured here: the HOF pair scan is ~2 orders of magnitude slower than
BLAS). The production inner loop at 100 TB is the one this tool
measures: groupBy(cell).applyInPandas, numpy matrix multiply per
row-block inside the cell — same keep-lowest-id semantics, Arrow-batched,
quadratic work confined to each cell and executed at BLAS speed.

Reported per n:
- pair_frac: within-cell candidate pairs / all pairs (→ 1/K balanced);
- max_cell: the skew the second-level quantizer would split;
- manifest_sec / pairs_per_sec: full keep/drop manifest wall time via the
  applyInPandas path;
- hof_pairs_per_sec (smallest n only): the registered HOF form's rate,
  for the comparison that justifies the Arrow path.

Usage: python tools/semdedup_scale.py [n ...]   (default 50000 200000)
One JSON line per n.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOCK = 1024


def _cell_dedup(pdf):
    import numpy as np
    import pandas as pd

    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    E = np.stack(pdf["emb"].to_numpy()).astype("float64")
    nrm = np.sqrt((E * E).sum(axis=1))
    dropped = np.zeros(len(pdf), dtype=bool)
    # block-triangular scan: rows i score only against LOWER-id rows
    for s in range(0, len(pdf), BLOCK):
        e = min(s + BLOCK, len(pdf))
        if s > 0:
            sims = (E[s:e] @ E[:s].T) / np.outer(nrm[s:e], nrm[:s])
            dropped[s:e] |= (np.round(sims, 6) >= _TH).any(axis=1)
        intra = (E[s:e] @ E[s:e].T) / np.outer(nrm[s:e], nrm[s:e])
        tril = np.tril(np.round(intra, 6) >= _TH, k=-1)
        dropped[s:e] |= tril.any(axis=1)
    return pd.DataFrame(
        {"vec_id": pdf["vec_id"], "kept": ~dropped}
    )


_TH = None  # set in main() from the registered op's threshold


def main() -> None:
    global _TH
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 200_000]

    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.llm.similarity import (
        _cell_dots,
        _dot,
    )
    from bootic_stats_aggregates_spark.session import get_spark

    # production-realistic threshold: the registered op's 0.4 suits the
    # clustered FIXTURE embeddings; on uniform synthetic vectors it sits
    # ~3 sigma out and drops half the corpus, burying the planted clones.
    # 0.9 (the SemDeDup paper's regime) isolates them: expected drops ~n/97.
    _TH = 0.9
    spark = get_spark("semdedup-scale")

    for idx, n in enumerate(sizes):
        base = spark.range(n).select(F.col("id").alias("vec_id"))
        # xxhash64-seeded pseudo-random elements (an LCG first cut made
        # every vector near-collinear); ids ending in 99 clone their
        # immediate neighbor (whose seed is itself), planting ~1% true
        # semantic duplicates — a "clone a clone's shifted seed" chain
        # variant planted exactly one dup, hence the explicit non-clone
        # target
        seed = F.when(
            F.col("vec_id") % 100 == 99, F.col("vec_id") - 1
        ).otherwise(F.col("vec_id"))
        emb = F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: (F.xxhash64(seed, j) % 10007) / 5003.5,
        )
        e = base.select("vec_id", emb.alias("emb"))
        assigned = e.withColumn("ds", _cell_dots(F.transform(F.col("emb"), lambda x: x))).select(
            "vec_id",
            "emb",
            (F.array_position("ds", F.array_max("ds")) - 1)
            .cast("int")
            .alias("cell"),
        ).persist()
        counts = assigned.groupBy("cell").count().collect()
        cand_pairs = sum(r["count"] * (r["count"] - 1) // 2 for r in counts)
        all_pairs = n * (n - 1) // 2
        max_cell = max(r["count"] for r in counts)

        t0 = time.monotonic()
        manifest = assigned.groupBy("cell").applyInPandas(
            _cell_dedup, "vec_id long, kept boolean"
        )
        n_dropped = manifest.filter(~F.col("kept")).count()
        dt = time.monotonic() - t0

        row = {
            "n": n, "cells": len(counts), "max_cell": max_cell,
            "cand_pairs": cand_pairs, "all_pairs": all_pairs,
            "pair_frac": round(cand_pairs / all_pairs, 4),
            "n_dropped": n_dropped,
            "manifest_sec": round(dt, 2),
            "pairs_per_sec": int(cand_pairs / dt) if dt > 0 else None,
        }
        if idx == 0:
            # HOF comparison at the smallest size only (interpreted-path
            # folds; this is the measurement that motivates the Arrow loop)
            nrm = F.sqrt(_dot(F.col("emb"), F.col("emb")))
            scored = assigned.withColumn("nrm", nrm)
            lower = scored.select(
                F.col("vec_id").alias("q_vec_id"),
                F.col("emb").alias("q_emb"),
                F.col("nrm").alias("q_nrm"),
                "cell",
            )
            cos = F.round(
                _dot(F.col("q_emb"), F.col("emb"))
                / (F.col("q_nrm") * F.col("nrm")),
                6,
            )
            t0 = time.monotonic()
            hof_dropped = (
                scored.join(lower, "cell")
                .filter(F.col("q_vec_id") < F.col("vec_id"))
                .filter(cos >= _TH)
                .select("vec_id")
                .distinct()
                .count()
            )
            hof_dt = time.monotonic() - t0
            row["hof_sec"] = round(hof_dt, 2)
            row["hof_pairs_per_sec"] = int(cand_pairs / hof_dt)
            row["hof_agrees"] = hof_dropped == n_dropped
        print(json.dumps(row), flush=True)
        assigned.unpersist()


if __name__ == "__main__":
    main()

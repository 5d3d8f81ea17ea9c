"""Persisted, incrementally-maintained ANN index (VERDICT r7 task 2).

llm_ann_ivfpq trains and searches in one query; at 100 TB nobody
re-encodes the corpus per query — the IVF-PQ index is a TABLE with its
own lifecycle. This module materializes the index as MiniLog tables
(codes + frozen codebooks) and maintains it purely from the vector
table's CHANGE FEED: inserts encode only the new vectors (O(churn)
appends), deletes become deletion-vector masks on the code table
(O(deleted rows), zero code bytes rewritten) — the tx_mview_incremental
pattern applied to the ANN index, composed from this repo's own pieces
(MiniLog CDF + DV deletes + the llm_ivf_train / llm_pq_train Lloyd
machinery).

Scale story: the vector table churns; the index table follows it one
O(churn) feed at a time. Codebooks stay frozen between rebuilds (the
production IVF-PQ recipe — retraining is an index REBUILD, a rare
offline event), so maintenance is map-only encoding of the feed's
insert rows + a DV commit for its delete rows. A fresh rebuild from the
live vector table must reproduce the maintained index bit-for-bit,
which is exactly what the registered op asserts every call.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..acid import MiniLogTable
from ..io import table
from ..registry import query
from .similarity import (
    IVFPQ_CELLS,
    KMEANS_ITERS,
    PQ_M,
    PQ_SUBDIM,
    _dbl,
    _dot,
    _kmeans_assign,
    _kmeans_sql_ctes,
    _pq_assign,
    _pq_sql_ctes,
    _pq_subvectors,
    _train_pq,
    _train_quantizer,
)

#: the staged churn scenario, constant across scale factors (every
#: fixture has vec_id 0..N-1 with N >= 500): the index is built on the
#: BASE snapshot (everything except the insert band), then maintained
#: through an insert feed and a DV-delete feed.
INS_LO, INS_HI = 360, 399  # 40 vectors appended AFTER the index build
DEL_LO, DEL_HI = 100, 129  # 30 vectors DV-deleted after the inserts

_RECIPE = "ann-index-v2"


def _fingerprint(sf_dir: str) -> str:
    """Recipe + embeddings-fixture fingerprint (staging must invalidate
    when the SOURCE fixture changes, not only the recipe — the acid_ops
    staging lesson from the r6 NULL-ts sweep)."""
    src = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(src)
        sig = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        sig = "missing"
    return f"{_RECIPE}|{sig}"


def _tables(
    spark: SparkSession, sf_dir: str
) -> tuple[MiniLogTable, MiniLogTable, MiniLogTable, MiniLogTable, bool]:
    """(vectors, coarse codebook, pq codebook, index, already_built)
    under one staging root keyed by (sf tag, fingerprint marker)."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(
        tempfile.gettempdir(), "bootic_minilog", tag, "ann_index"
    )
    marker = os.path.join(root, "_READY")
    ready = False
    if os.path.exists(marker):
        with open(marker) as fh:
            ready = fh.read().strip() == _fingerprint(sf_dir)
    def _make() -> "tuple[MiniLogTable, MiniLogTable, MiniLogTable, MiniLogTable]":
        return (
            MiniLogTable(
                spark, os.path.join(root, "vectors"), stats_cols=("vec_id",)
            ),
            MiniLogTable(
                spark, os.path.join(root, "codebook_coarse"), stats_cols=("cid",)
            ),
            MiniLogTable(
                spark, os.path.join(root, "codebook_pq"), stats_cols=("sub",)
            ),
            MiniLogTable(
                spark, os.path.join(root, "index"), stats_cols=("vec_id",)
            ),
        )

    tables = _make()
    # the marker shares the root with sibling table dirs a partial
    # teardown can remove independently: trust it only if every staged
    # table actually exists (marker-without-table found r12) — and flip
    # BEFORE the teardown decision so the stale partial state is wiped
    # rather than rebuilt over (``version`` probes the log live).
    if ready and any(t.version < 0 for t in tables):
        ready = False
    if not ready:
        if os.path.exists(root):
            shutil.rmtree(root)
        os.makedirs(root, exist_ok=True)
        tables = _make()  # re-create the _minilog log dirs rmtree removed
    vec, cbc, cbp, idx = tables
    return vec, cbc, cbp, idx, ready


def _encode(e: DataFrame, cents: DataFrame, pq_cents: DataFrame) -> DataFrame:
    """(vec_id, cell, code, nrm) for every vector of ``e`` under FROZEN
    codebooks: coarse argmin cell, the PQ code as a csv of {PQ_M}
    nibble ids (sub order), and the exact norm rounded to 6 — pure
    map-side broadcast joins, the O(churn) unit of index maintenance."""
    cell = _kmeans_assign(e, cents).select(
        "vec_id", F.col("cid").alias("cell")
    )
    code = (
        _pq_assign(_pq_subvectors(e), pq_cents)
        .groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "cid"))).alias("sc"))
        .select(
            "vec_id",
            F.concat_ws(
                ",", F.transform("sc", lambda s: s["cid"].cast("string"))
            ).alias("code"),
        )
    )
    nrm = e.select(
        "vec_id", F.round(F.sqrt(_dot(F.col("emb"), F.col("emb"))), 6).alias("nrm")
    )
    return (
        cell.join(code, "vec_id")
        .join(nrm, "vec_id")
        .select("vec_id", "cell", "code", "nrm")
    )


def _stage(spark: SparkSession, sf_dir: str) -> tuple[
    MiniLogTable, MiniLogTable, MiniLogTable, MiniLogTable
]:
    vec, cbc, cbp, idx, ready = _tables(spark, sf_dir)
    if ready:
        return vec, cbc, cbp, idx
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", _dbl(F.col("embedding")).alias("emb")
    )
    base = emb.filter(~F.col("vec_id").between(INS_LO, INS_HI))
    vec.append(base)  # v0: the index's base snapshot
    # train BOTH quantizers on the v0 snapshot read back through the
    # log (what an index builder of a real table would see), then
    # freeze them as tables of their own
    e0 = vec.read()
    cents, _ = _train_quantizer(e0, IVFPQ_CELLS, KMEANS_ITERS)
    pq_cents, _ = _train_pq(e0, KMEANS_ITERS)
    cbc.append(cents.select("cid", "cvec"))
    cbp.append(pq_cents.select("sub", "cid", "c"))
    idx.append(_encode(e0, cents, pq_cents))  # index v0: full build
    # --- churn on the vector table ---
    vec.append(emb.filter(F.col("vec_id").between(INS_LO, INS_HI)))
    vec.delete_where_dv("vec_id", DEL_LO, DEL_HI)
    # --- maintenance: fold the vector table's change feed ---
    for v in range(1, vec.version + 1):
        feed = vec.changes(v - 1, v)
        ins = feed.filter(F.col("_change_type") == "insert").drop(
            "_change_type"
        )
        if not ins.isEmpty():
            idx.append(_encode(ins, cents, pq_cents))
        dels = feed.filter(F.col("_change_type") == "delete")
        rng = dels.agg(
            F.min("vec_id").alias("lo"),
            F.max("vec_id").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        if rng["n"]:
            # MiniLog's DV granularity is a key range; the staged delete
            # IS one contiguous run (asserted), and an arbitrary key set
            # would map to one DV commit per contiguous run
            assert rng["n"] == rng["hi"] - rng["lo"] + 1
            idx.delete_where_dv("vec_id", rng["lo"], rng["hi"])
    # COMPACTION composed into the maintenance loop (VERDICT r8 task 6):
    # maintenance accretes one code file per churn batch; OPTIMIZE
    # bin-packs them back and PURGES the DV-masked rows in one atomic
    # remove+add commit — the code table's file count stays flat however
    # long the feed runs (tools/ann_index_scale.py pins the curve), and
    # the maintained == fresh-rebuild bit-equality below is asserted on
    # the POST-compaction table
    idx.optimize(target_rows=10_000_000)
    with open(os.path.join(os.path.dirname(vec.path), "_READY"), "w") as fh:
        fh.write(_fingerprint(sf_dir))
    return vec, cbc, cbp, idx


def _rebuild_oracle(checks: str) -> str:
    """The shared fresh-rebuild replay (train on base, encode live),
    parameterized by the op-specific check columns — the batch and
    stream maintenance ops must equal the SAME independent rebuild."""
    base_where = f"vec_id NOT BETWEEN {INS_LO} AND {INS_HI}"
    body, _final_a, final_c = _kmeans_sql_ctes(
        IVFPQ_CELLS, KMEANS_ITERS, where=base_where
    )
    pq_body = _pq_sql_ctes(KMEANS_ITERS)
    sd, k = PQ_SUBDIM, KMEANS_ITERS
    return f"""
    -- the MAINTAINED index == a fresh rebuild from the live vector set:
    -- train coarse + PQ codebooks on the BASE snapshot (vec_id outside
    -- the insert band — training never saw the inserts), then encode
    -- the LIVE set (everything minus the DV-deleted band). The Spark
    -- side reads the maintained MiniLog code table and asserts it
    -- equals its own fresh rebuild; this SQL replays that rebuild.
    WITH {body},
    {pq_body},
    lv AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings
           WHERE vec_id NOT BETWEEN {DEL_LO} AND {DEL_HI}),
    lcell AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT l.vec_id, c.cid,
               row_number() OVER (PARTITION BY l.vec_id ORDER BY
                 list_sum(list_transform(list_zip(l.v, c.c),
                          p -> (p[1]-p[2])*(p[1]-p[2]))), c.cid) AS rn
        FROM lv l CROSS JOIN {final_c} c) WHERE rn = 1),
    lvs AS (SELECT vec_id, t.sub AS sub,
                   list_slice(v, t.sub * {sd} + 1, t.sub * {sd} + {sd}) AS v8
            FROM lv, unnest(range({PQ_M})) AS t(sub)),
    lcode AS (
      SELECT vec_id, string_agg(CAST(cid AS VARCHAR), ',' ORDER BY sub)
               AS code
      FROM (
        SELECT s.vec_id, s.sub, c.cid,
               row_number() OVER (PARTITION BY s.vec_id, s.sub ORDER BY
                 list_sum(list_transform(list_zip(s.v8, c.c),
                          p -> (p[1]-p[2])*(p[1]-p[2]))), c.cid) AS rn
        FROM lvs s JOIN pc{k} c ON c.sub = s.sub) WHERE rn = 1
      GROUP BY vec_id)
    SELECT l.vec_id, CAST(lcell.cell AS INT) AS cell, lcode.code,
           round(sqrt(list_sum(list_transform(l.v, x -> x*x))), 6) AS nrm,
           {checks}
    FROM lv l
    JOIN lcell ON lcell.vec_id = l.vec_id
    JOIN lcode ON lcode.vec_id = l.vec_id
    """


def _maintain_oracle() -> str:
    return _rebuild_oracle(
        f"""true AS maintain_ok,
           CAST({INS_HI - INS_LO + 1} AS BIGINT) AS n_incr_encoded,
           true AS incr_ok,
           true AS compacted_ok"""
    )


def _stream_stage(
    spark: SparkSession, sf_dir: str
) -> tuple[MiniLogTable, MiniLogTable]:
    """The STREAMING maintenance leg: a second index table built and
    maintained ONLY from the vector table's streaming change feed
    (readChangeFeed=true on the native source) — bootstrap inserts
    encode the base, churn inserts encode O(churn), churn deletes
    DV-mask. Returns (stream index, batch index) for the equivalence
    assertion. Idempotent per fixture via a marker; each micro-batch's
    appends carry txn=(app, commit_version) so a replayed batch commits
    nothing (the stream_minilog_sink exactly-once recipe)."""
    from ..sources.minilog_source import register
    from ..streaming.runner import run_foreach_batch

    vec, cbc, cbp, idx = _stage(spark, sf_dir)
    root = os.path.dirname(vec.path)
    sroot = os.path.join(root, "index_stream")
    marker = os.path.join(root, "_READY_STREAM")
    ready = False
    if os.path.exists(marker):
        with open(marker) as fh:
            ready = fh.read().strip() == _fingerprint(sf_dir)
    if ready:
        sidx = MiniLogTable(spark, sroot, stats_cols=("vec_id",))
        if sidx.version >= 0:  # marker-without-table guard (r12)
            return sidx, idx
        ready = False
    if os.path.exists(sroot):
        shutil.rmtree(sroot)
    if os.path.exists(marker):
        os.unlink(marker)
    sidx = MiniLogTable(spark, sroot, stats_cols=("vec_id",))
    register(spark)
    cents = cbc.read().select("cid", "cvec")
    pq_cents = cbp.read().select("sub", "cid", "c")

    def fold(bdf: DataFrame, _bid: int) -> None:
        # one AvailableNow batch may span several commits: apply them in
        # commit order so a delete never precedes the insert it masks
        versions = sorted(
            r["_commit_version"]
            for r in bdf.select("_commit_version").distinct().collect()
        )
        for v in versions:
            cdf = bdf.filter(F.col("_commit_version") == v)
            ins = cdf.filter(F.col("_change_type") == "insert").select(
                "vec_id", "emb"
            )
            if not ins.isEmpty():
                sidx.append(
                    _encode(ins, cents, pq_cents),
                    txn={"app": "ann-index-stream", "version": int(v)},
                )
            rng = (
                cdf.filter(F.col("_change_type") == "delete")
                .agg(
                    F.min("vec_id").alias("lo"),
                    F.max("vec_id").alias("hi"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()[0]
            )
            if rng["n"]:
                assert rng["n"] == rng["hi"] - rng["lo"] + 1
                sidx.delete_where_dv("vec_id", rng["lo"], rng["hi"])

    run_foreach_batch(
        spark.readStream.format("minilog")
        .option("readChangeFeed", "true")
        .load(vec.path),
        fold,
        mode="append",
    )
    with open(marker, "w") as fh:
        fh.write(_fingerprint(sf_dir))
    return sidx, idx


def _stream_maintain_oracle() -> str:
    """Same independent rebuild, stream-named check columns
    (n_encoded_stream counts EVERY vector exactly once: the feed's
    bootstrap encodes the base, churn encodes churn, deletes re-encode
    nothing — so it is the embeddings row count)."""
    return _rebuild_oracle(
        """true AS stream_ok,
           CAST((SELECT count(*) FROM embeddings) AS BIGINT)
             AS n_encoded_stream,
           true AS matches_batch"""
    )


@query("stream_ann_index_maintain", oracle=_stream_maintain_oracle())
def stream_ann_index_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ANN-INDEX MAINTENANCE — the round's pieces composed:
    the persisted IVF-PQ index (llm_ann_index_maintain) kept current by
    a STRUCTURED STREAMING job tailing the vector table's change-data
    feed (stream_cdf_feed's readChangeFeed source) through foreachBatch.
    The stream index is born from the feed itself (the bootstrap batch
    encodes the base snapshot), every churn insert encodes exactly once
    (micro-batch appends carry txn=(app, commit_version), so replays
    commit nothing), and churn deletes land as deletion-vector masks.
    This is the always-on shape of index maintenance at 100 TB: no
    rebuild cron, the index follows the table one O(churn) trigger at a
    time.

    Checks recomputed live per call: stream_ok pins stream-maintained
    == fresh rebuild under the frozen codebooks (both exceptAll
    directions); matches_batch pins stream-maintained == the BATCH
    change-feed-maintained index bit-for-bit (two independent
    maintenance paths, one truth); n_encoded_stream counts rows across
    the stream table's append commits — exactly one encode per vector
    ever inserted, nothing re-encoded by deletes. The oracle replays
    the full independent rebuild in DuckDB."""
    sidx, idx = _stream_stage(spark, sf_dir)
    vec, cbc, cbp, _ = _stage(spark, sf_dir)
    cents = cbc.read().select("cid", "cvec")
    pq_cents = cbp.read().select("sub", "cid", "c")
    maintained = sidx.read()
    fresh = _encode(vec.read(), cents, pq_cents)
    batch = idx.read()
    stream_ok = (
        maintained.exceptAll(fresh).isEmpty()
        and fresh.exceptAll(maintained).isEmpty()
    )
    matches_batch = (
        maintained.exceptAll(batch).isEmpty()
        and batch.exceptAll(maintained).isEmpty()
    )
    n_enc = 0
    for v in range(sidx.version + 1):
        e = sidx._read_entry(v)
        if e["operation"] == "append":
            n_enc += sum(
                a["rows"] for a in e["actions"] if a["type"] == "add"
            )
    return maintained.select(
        "vec_id",
        "cell",
        "code",
        "nrm",
        F.lit(bool(stream_ok)).alias("stream_ok"),
        F.lit(n_enc).cast("long").alias("n_encoded_stream"),
        F.lit(bool(matches_batch)).alias("matches_batch"),
    )


@query("llm_ann_index_maintain", oracle=_maintain_oracle())
def llm_ann_index_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED, INCREMENTALLY-MAINTAINED ANN INDEX — the missing
    lifecycle leg of llm_ann_ivfpq (VERDICT r7 task 2): IVF-PQ codes +
    frozen codebooks live as MiniLog tables, and the code table is
    maintained purely from the vector table's change feed. The staged
    history: index built on the base snapshot (v0), then 40 vectors
    appended (the feed's inserts are THE ONLY vectors ever re-encoded
    — O(churn), pinned by n_incr_encoded and the index table's own CDF)
    and 30 vectors DV-deleted (the index delete writes a deletion-vector
    mask — kilobytes, zero code bytes rewritten).

    Returned rows are the MAINTAINED code table read back through the
    log (vec_id, coarse cell, {PQ_M}-nibble PQ code, norm), with three
    invariants recomputed live every call: maintain_ok pins maintained
    == a fresh rebuild of the index from the live vector table under
    the SAME frozen codebooks (bit-for-bit, both exceptAll directions);
    incr_ok pins the O(churn) maintenance evidence (the index table's
    own change feed since its build shows exactly the 40 insert-band
    encodes and 30 masked deletes, and the final snapshot carries a
    live DV); n_incr_encoded surfaces the churn size next to the
    ~order-of-magnitude-larger live count. Search recall is unchanged
    by maintenance BY CONSTRUCTION (the maintained and fresh-built
    indexes are equal, so any search over them is identical —
    recall-level evidence pinned in tests/test_properties.py).

    The DuckDB oracle replays the fresh rebuild: codebooks trained on
    the base set, the live set encoded under them — so the driver is
    checking the maintained table against an independent end-to-end
    re-derivation, not against Spark's own rebuild."""
    vec, cbc, cbp, idx = _stage(spark, sf_dir)
    cents = cbc.read().select("cid", "cvec")
    pq_cents = cbp.read().select("sub", "cid", "c")
    maintained = idx.read()
    fresh = _encode(vec.read(), cents, pq_cents)
    maintain_ok = (
        maintained.exceptAll(fresh).isEmpty()
        and fresh.exceptAll(maintained).isEmpty()
    )
    feed = idx.changes(0, idx.version)
    n_ins = feed.filter(F.col("_change_type") == "insert").count()
    n_del = feed.filter(F.col("_change_type") == "delete").count()
    hist = idx.history()
    opt_vs = [h["version"] for h in hist if h["operation"] == "optimize"]
    incr_ok = (
        n_ins == INS_HI - INS_LO + 1
        and n_del == DEL_HI - DEL_LO + 1
        # the DV existed right up to the compaction commit...
        and bool(opt_vs)
        and any(f.dv for f in idx.snapshot(opt_vs[0] - 1).files)
    )
    # ...and the compaction PURGED it: fewer files, zero DVs, and the
    # change feed across the optimize span nets NOTHING (bit-equality
    # of the rows themselves is maintain_ok, computed post-compaction)
    post = idx.snapshot(opt_vs[0]) if opt_vs else None
    compacted_ok = bool(
        opt_vs
        and post is not None
        and len(post.files) < len(idx.snapshot(opt_vs[0] - 1).files)
        and not any(f.dv for f in post.files)
        and idx.changes(opt_vs[0] - 1, opt_vs[0]).isEmpty()
    )
    return maintained.select(
        "vec_id",
        "cell",
        "code",
        "nrm",
        F.lit(bool(maintain_ok)).alias("maintain_ok"),
        F.lit(n_ins).cast("long").alias("n_incr_encoded"),
        F.lit(bool(incr_ok)).alias("incr_ok"),
        F.lit(compacted_ok).alias("compacted_ok"),
    )

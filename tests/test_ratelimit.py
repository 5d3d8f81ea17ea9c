"""Round-11 streaming admission control on the MiniLog native source
(VERDICT r10 task 2): maxFilesPerTrigger / maxBytesPerTrigger with
(version, file-index) composite offsets.

The restart-safety design rests on an empirically probed 4.1 behavior
(see _MiniLogStreamReader._frontier): a restarted query replans the
last batch via partitions(checkpoint_start, checkpoint_end) BEFORE its
first latestOffset call, so the reader always learns the checkpoint
frontier first — and the engine does NOT guard against a source
returning an offset behind the checkpoint, so the reader's own
max-key tracking is what prevents offset regression. The restart test
below is the canary for both facts.
"""

from __future__ import annotations

import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from bootic_stats_aggregates_spark.acid import MiniLogTable
from bootic_stats_aggregates_spark.sources.minilog_source import (
    _MiniLogStreamReader,
    register,
)


def _mk_table(spark, path, commits=5, files_per=2):
    t = MiniLogTable(spark, path, stats_cols=("k",))
    for c in range(commits):
        rows = [(c * files_per + i,) for i in range(files_per)]
        t.append(
            spark.createDataFrame(rows, "k INT").repartition(files_per),
            target_files=files_per,
        )
    return t


def _drain(spark, path, sink, ck, opts, expect, timeout=180):
    """Run a capped stream with a real processingTime trigger until the
    parquet sink holds ``expect`` rows; returns (rows, progress)."""
    rd = spark.readStream.format("minilog")
    for k, v in opts.items():
        rd = rd.option(k, v)
    q = (
        rd.load(path)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(processingTime="50 milliseconds")
        .outputMode("append")
        .start()
    )

    def count():
        try:
            return spark.read.parquet(sink).count()
        except Exception:
            return 0

    deadline = time.time() + timeout
    while time.time() < deadline and count() < expect:
        time.sleep(0.3)
    prog = list(q.recentProgress)
    q.stop()
    q.awaitTermination()
    return spark.read.parquet(sink), prog


def test_max_files_per_trigger_splits_commits(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), commits=5, files_per=2)
    register(spark)
    feed, prog = _drain(
        spark,
        t.path,
        str(tmp_path / "sink"),
        str(tmp_path / "ck"),
        {"maxFilesPerTrigger": "1"},
        expect=10,
    )
    ks = [r["k"] for r in feed.collect()]
    assert sorted(ks) == list(range(10))  # exactly-once union
    sizes = [p["numInputRows"] for p in prog if p["numInputRows"] > 0]
    assert max(sizes) == 1  # one file (= one row here) per batch
    assert len(sizes) == 10  # >= N batches: the whole point


def test_cap_spans_commit_boundaries(spark, tmp_path):
    # 3-file cap over 2-file commits: batches MUST cut mid-commit,
    # exercising the composite (version, file-index) offset
    t = _mk_table(spark, str(tmp_path / "t"), commits=4, files_per=2)
    register(spark)
    feed, prog = _drain(
        spark,
        t.path,
        str(tmp_path / "sink"),
        str(tmp_path / "ck"),
        {"maxFilesPerTrigger": "3"},
        expect=8,
    )
    assert sorted(r["k"] for r in feed.collect()) == list(range(8))
    sizes = [p["numInputRows"] for p in prog if p["numInputRows"] > 0]
    assert max(sizes) <= 3 and len(sizes) >= 3


def test_restart_resumes_capped_exactly_once(spark, tmp_path):
    """Kill a capped stream mid-backlog, restart on the same
    checkpoint: no duplicates, no gaps, caps still enforced."""
    t = _mk_table(spark, str(tmp_path / "t"), commits=6, files_per=2)
    register(spark)
    sink, ck = str(tmp_path / "sink"), str(tmp_path / "ck")

    def start():
        return (
            spark.readStream.format("minilog")
            .option("maxFilesPerTrigger", "2")
            .load(t.path)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(processingTime="50 milliseconds")
            .outputMode("append")
            .start()
        )

    def count():
        try:
            return spark.read.parquet(sink).count()
        except Exception:
            return 0

    q = start()
    deadline = time.time() + 120
    while time.time() < deadline and count() < 4:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    assert 0 < count() < 12  # genuinely mid-backlog
    q = start()
    deadline = time.time() + 120
    while time.time() < deadline and count() < 12:
        time.sleep(0.3)
    prog = list(q.recentProgress)
    q.stop()
    q.awaitTermination()
    ks = [r["k"] for r in spark.read.parquet(sink).collect()]
    assert sorted(ks) == list(range(12))
    assert len(set(ks)) == 12
    assert max(
        (p["numInputRows"] for p in prog), default=0
    ) <= 2  # cap held across the restart


def test_bootstrap_batch_splits_under_cap(spark, tmp_path):
    """A vacuum-truncated table's snapshot bootstrap spans multiple
    capped batches instead of arriving as one unbounded batch."""
    t = _mk_table(spark, str(tmp_path / "t"), commits=4, files_per=2)
    t.vacuum(retain_last=1, min_age_seconds=0)
    assert t._versions()[0] > 0  # truncated: bootstrap path armed
    register(spark)
    feed, prog = _drain(
        spark,
        t.path,
        str(tmp_path / "sink"),
        str(tmp_path / "ck"),
        {"maxFilesPerTrigger": "3"},
        expect=8,
    )
    assert sorted(r["k"] for r in feed.collect()) == list(range(8))
    sizes = [p["numInputRows"] for p in prog if p["numInputRows"] > 0]
    assert max(sizes) <= 3 and len(sizes) >= 3


def test_max_bytes_admits_at_least_one_file(spark, tmp_path):
    """A file larger than maxBytesPerTrigger must still be admitted
    (alone) — the cap is a soft minimum-one, else the stream stalls."""
    t = MiniLogTable(spark, str(tmp_path / "t"))
    t.append(
        spark.range(0, 2000).select(F.col("id").cast("int").alias("k")),
        target_files=1,
    )
    t.append(spark.createDataFrame([(9999,)], "k INT"), target_files=1)
    register(spark)
    feed, prog = _drain(
        spark,
        t.path,
        str(tmp_path / "sink"),
        str(tmp_path / "ck"),
        {"maxBytesPerTrigger": "10"},  # smaller than any file
        expect=2001,
    )
    assert feed.count() == 2001
    sizes = [p["numInputRows"] for p in prog if p["numInputRows"] > 0]
    assert len(sizes) == 2  # one file per batch, both admitted


def test_cdf_caps_are_commit_granular(spark, tmp_path):
    """readChangeFeed under a 1-file cap: a commit's diff is atomic
    (the bag difference needs both whole file sets), so batches land
    per COMMIT — never a partial commit — while the all-inserts
    bootstrap may split."""
    t = MiniLogTable(spark, str(tmp_path / "t"), stats_cols=("k",))
    t.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(6)], "k INT, v STRING"
        )
    )
    t.merge(
        spark.createDataFrame([(2, "B"), (9, "i")], "k INT, v STRING"),
        keys=("k",),
    )
    t.delete_where_dv("k", 3, 3)
    register(spark)
    sink, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
    q = (
        spark.readStream.format("minilog")
        .option("readChangeFeed", "true")
        .option("maxFilesPerTrigger", "1")
        .load(t.path)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(processingTime="50 milliseconds")
        .outputMode("append")
        .start()
    )

    def count():
        try:
            return spark.read.parquet(sink).count()
        except Exception:
            return 0

    # expected feed: 6 inserts + (delete+insert for k=2, insert k=9)
    # + delete k=3 = 10 rows
    deadline = time.time() + 120
    while time.time() < deadline and count() < 10:
        time.sleep(0.3)
    prog = list(q.recentProgress)
    q.stop()
    q.awaitTermination()
    feed = spark.read.parquet(sink)
    assert feed.count() == 10
    by_ver = {
        r["_commit_version"]: r["c"]
        for r in feed.groupBy("_commit_version")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert by_ver == {0: 6, 1: 3, 2: 1}  # whole commits, none split
    # and the capped run still took multiple row-bearing batches
    assert sum(1 for p in prog if p["numInputRows"] > 0) >= 3


def test_invalid_cap_option_raises(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), commits=1)
    register(spark)
    q = (
        spark.readStream.format("minilog")
        .option("maxFilesPerTrigger", "0")
        .load(t.path)
        .writeStream.format("noop")
        .start()
    )
    # .start() is async — the reader is constructed in the stream
    # thread, so the rejection surfaces through the query's failure
    with pytest.raises(Exception, match="positive integer"):
        q.awaitTermination(120)
        raise AssertionError(q.exception() or "query did not fail")


def test_offset_encoding_roundtrip():
    """Unit pin of the composite-offset algebra: encode normalizes
    boundary positions to the plain pre-r11 form (checkpoint
    back-compat) and _off_key totally orders mixed forms."""
    from bootic_stats_aggregates_spark.sources.minilog_source import (
        _off_key,
    )

    enc = _MiniLogStreamReader._encode
    assert enc(3, 5, 5, None) == {"version": 3}  # full -> plain
    assert enc(3, 0, 5, None) == {"version": 2}  # nothing -> prior full
    assert enc(3, 2, 5, None) == {"version": 3, "file": 2}
    assert enc(3, 2, 5, 3) == {"version": 3, "file": 2, "bootstrap": 3}
    assert enc(3, 5, 5, 3) == {"version": 3}  # bootstrap done: flag off
    ordered = [
        {"version": 2},
        {"version": 3, "file": 1},
        {"version": 3, "file": 4},
        {"version": 3},
        {"version": 4, "file": 1},
    ]
    keys = [_off_key(o) for o in ordered]
    assert keys == sorted(keys)


# ------------------------------------------------------ round 12 additions


def test_backward_batch_range_fails_loudly(spark, tmp_path):
    """ADVICE r11: partitions() learns the checkpoint frontier from its
    ``start`` argument and REFUSES a backward-ordered range. Without
    this, the failure mode if a future engine revision called
    latestOffset() before the restart replan would be a silent offset
    rewind + replay of already-delivered rows; with it, the failure is
    loud and names the contract to re-probe."""
    t = _mk_table(spark, str(tmp_path / "t"), commits=6, files_per=1)
    rdr = _MiniLogStreamReader(t.path, {"maxfilespertrigger": "1"})
    with pytest.raises(RuntimeError, match="BACKWARD"):
        rdr.partitions({"version": 3}, {"version": 1})
    # the frontier learned from the rejected plan still seeds the
    # admission walk: the next capped offset orders PAST it, never
    # behind it
    from bootic_stats_aggregates_spark.sources.minilog_source import (
        _off_key,
    )

    nxt = rdr.latestOffset()
    assert _off_key(nxt) > _off_key({"version": 3})


def test_cdf_backward_batch_range_fails_loudly(spark, tmp_path):
    from bootic_stats_aggregates_spark.sources.minilog_source import (
        _MiniLogCDFStreamReader,
    )

    t = _mk_table(spark, str(tmp_path / "t"), commits=4, files_per=1)
    rdr = _MiniLogCDFStreamReader(t.path, {})
    with pytest.raises(RuntimeError, match="BACKWARD"):
        rdr.partitions({"version": 2}, {"version": 0})


def test_parquet_and_minilog_caps_chunk_equally(spark, tmp_path):
    """VERDICT r11 task 5: admission-control EQUIVALENCE between the
    native MiniLog source and Spark's own parquet file-stream source —
    the same 6-file backlog under maxFilesPerTrigger=2 drains as the
    SAME number of non-empty triggers (3) with identical final sinks,
    and the parquet leg additionally survives a kill-and-resume
    exactly-once (the MiniLog leg's restart is pinned above in
    test_restart_resumes_capped_exactly_once)."""
    t = _mk_table(spark, str(tmp_path / "ml"), commits=6, files_per=1)
    pq_dir = str(tmp_path / "pq")
    for i in range(6):
        spark.createDataFrame([(i,)], "k INT").coalesce(1).write.mode(
            "append"
        ).parquet(pq_dir)
    register(spark)

    ml_feed, ml_prog = _drain(
        spark,
        t.path,
        str(tmp_path / "ml_sink"),
        str(tmp_path / "ml_ck"),
        {"maxFilesPerTrigger": "2"},
        expect=6,
    )
    q = (
        spark.readStream.schema("k INT")
        .option("maxFilesPerTrigger", "2")
        .parquet(pq_dir)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "pq_sink"))
        .option("checkpointLocation", str(tmp_path / "pq_ck"))
        .trigger(processingTime="50 milliseconds")
        .outputMode("append")
        .start()
    )
    deadline = time.time() + 120
    def pq_count():
        try:
            return spark.read.parquet(str(tmp_path / "pq_sink")).count()
        except Exception:
            return 0
    while time.time() < deadline and pq_count() < 6:
        time.sleep(0.3)
    pq_prog = list(q.recentProgress)
    q.stop()
    q.awaitTermination()

    ml_batches = [
        p["numInputRows"] for p in ml_prog if p["numInputRows"] > 0
    ]
    pq_batches = [
        p["numInputRows"] for p in pq_prog if p["numInputRows"] > 0
    ]
    # same chunking: ceil(6 files / cap 2) = 3 non-empty triggers each
    assert len(ml_batches) == len(pq_batches) == 3, (
        ml_batches,
        pq_batches,
    )
    assert max(ml_batches) <= 2 and max(pq_batches) <= 2
    # identical final contents
    assert sorted(r["k"] for r in ml_feed.collect()) == list(range(6))
    assert sorted(
        r["k"]
        for r in spark.read.parquet(str(tmp_path / "pq_sink")).collect()
    ) == list(range(6))


def test_parquet_cap_restart_resumes_exactly_once(spark, tmp_path):
    """The parquet-ingest twin of the MiniLog kill-and-resume canary:
    Spark's own file source under maxFilesPerTrigger, stopped
    mid-backlog and resumed on the same checkpoint, delivers the
    backlog exactly-once with the cap held across the restart."""
    pq_dir = str(tmp_path / "pq")
    for i in range(6):
        spark.createDataFrame([(i,)], "k INT").coalesce(1).write.mode(
            "append"
        ).parquet(pq_dir)
    sink, ck = str(tmp_path / "sink"), str(tmp_path / "ck")

    def start():
        return (
            spark.readStream.schema("k INT")
            .option("maxFilesPerTrigger", "1")
            .parquet(pq_dir)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(processingTime="50 milliseconds")
            .outputMode("append")
            .start()
        )

    def count():
        try:
            return spark.read.parquet(sink).count()
        except Exception:
            return 0

    q = start()
    deadline = time.time() + 120
    while time.time() < deadline and count() < 2:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    assert 0 < count() < 6  # genuinely mid-backlog
    q = start()
    deadline = time.time() + 120
    while time.time() < deadline and count() < 6:
        time.sleep(0.3)
    prog = list(q.recentProgress)
    q.stop()
    q.awaitTermination()
    ks = [r["k"] for r in spark.read.parquet(sink).collect()]
    assert sorted(ks) == list(range(6))
    assert max(
        (p["numInputRows"] for p in prog), default=0
    ) <= 1  # cap held across the restart

"""Round-10 MiniLog surface: the full MERGE clause model (Delta's
public WHEN MATCHED / NOT MATCHED / NOT MATCHED BY SOURCE contract),
MERGE schema evolution, in-commit timestamps + timestamp time travel,
incremental (liquid-style) clustering, and the keyed incremental view
folded from row-tracked change feeds.

These are the conflict-matrix / property tests backing the registered
queries tx_merge_clauses, tx_merge_evolve, tx_time_travel_ts,
tx_cluster_incremental and tx_apply_changes_keyed — thread
interleavings and clause matrices aren't SQL-expressible, so they live
here rather than in the driver gate.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from bootic_stats_aggregates_spark.acid import (
    MiniLogTable,
    NoSuchVersion,
    SchemaMismatch,
    apply_changes,
)


@pytest.fixture
def tbl(spark, tmp_path):
    t = MiniLogTable(spark, str(tmp_path / "t"), stats_cols=("k",))
    t.append(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
            "k INT, v STRING, n INT",
        )
    )
    return t


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ------------------------------------------------- MERGE clause matrix


def test_merge_clauses_cdc_batch_atomic(spark, tbl):
    """The CDC apply-changes shape in ONE commit: upsert + tombstone +
    conditional insert + not-matched-by-source delete, with the op
    marker riding as source payload (never written)."""
    src = spark.createDataFrame(
        [
            (2, "B", 200, "u"),   # upsert existing
            (3, None, 0, "d"),    # tombstone
            (5, "e", 50, "u"),    # new key -> insert
            (6, "f", 60, "d"),    # delete of a non-existent key: no-op
        ],
        "k INT, v STRING, n INT, op STRING",
    )
    v0 = tbl.version
    info = tbl.merge_clauses(
        src,
        keys=("k",),
        matched=(
            {"action": "delete", "condition": "source.op = 'd'"},
            {"action": "update", "set": None},
        ),
        not_matched=(
            {"action": "insert", "values": None,
             "condition": "source.op = 'u'"},
        ),
    )
    assert info["version"] == v0 + 1  # ONE atomic commit
    assert _rows(tbl.read()) == [
        (1, "a", 10),
        (2, "B", 200),
        (4, "d", 40),
        (5, "e", 50),
    ]
    # the op marker is source payload, not a table column
    assert "op" not in [c.name for c in tbl.read().schema.fields]


def test_merge_clauses_first_match_wins_and_subset_update(spark, tbl):
    """Clause order is the tiebreak (Delta's contract): a row matching
    two clauses fires only the FIRST; subset updates leave unnamed
    columns untouched."""
    src = spark.createDataFrame(
        [(1, "X", 111), (2, "Y", 222)], "k INT, v STRING, n INT"
    )
    tbl.merge_clauses(
        src,
        keys=("k",),
        matched=(
            # k=1 satisfies both conditions -> only the subset-update
            # of n fires (v stays 'a')
            {"action": "update", "set": {"n": "source.n"},
             "condition": "target.k = 1"},
            {"action": "update", "set": {"v": "source.v"}},
        ),
    )
    assert _rows(tbl.read()) == [
        (1, "a", 111),   # first clause: n only
        (2, "Y", 20),    # second clause: v only
        (3, "c", 30),
        (4, "d", 40),
    ]


def test_merge_clauses_not_matched_by_source(spark, tbl):
    """NOT MATCHED BY SOURCE update/delete sweep base rows absent from
    the source — the retention/cleanup leg; rows no clause accepts
    survive unchanged."""
    src = spark.createDataFrame([(1, "a2", 11)], "k INT, v STRING, n INT")
    tbl.merge_clauses(
        src,
        keys=("k",),
        matched=({"action": "update", "set": None},),
        not_matched_by_source=(
            {"action": "delete", "condition": "target.n >= 40"},
            {"action": "update", "set": {"v": "'stale'"},
             "condition": "target.k = 2"},
        ),
    )
    assert _rows(tbl.read()) == [
        (1, "a2", 11),
        (2, "stale", 20),
        (3, "c", 30),  # accepted by no NMBS clause: unchanged
    ]


def test_merge_clauses_duplicate_source_keys_fail_fast(spark, tbl):
    src = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 2)], "k INT, v STRING, n INT"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        tbl.merge_clauses(
            src, keys=("k",), matched=({"action": "update", "set": None},)
        )


def test_merge_clauses_null_safe_keys(spark, tmp_path):
    """NULL keys match NULL keys (eqNullSafe), like merge()."""
    t = MiniLogTable(spark, str(tmp_path / "nk"), stats_cols=("n",))
    t.append(
        spark.createDataFrame(
            [(None, "null-row", 1), (1, "one", 2)], "k INT, v STRING, n INT"
        )
    )
    src = spark.createDataFrame(
        [(None, "matched-null", 9)], "k INT, v STRING, n INT"
    )
    t.merge_clauses(
        src, keys=("k",), matched=({"action": "update", "set": None},)
    )
    got = {tuple(r) for r in t.read().collect()}
    assert got == {(1, "one", 2), (None, "matched-null", 9)}


def test_merge_clauses_row_id_linked_cdf(spark, tbl):
    """Across the merge commit the row-tracked change feed emits
    update-LINKED pre/post images (same stable id), deletes for
    tombstones/NMBS rows, inserts with FRESH ids for new keys."""
    ids0 = {r["k"]: r["_row_id"] for r in tbl.read_with_row_ids().collect()}
    src = spark.createDataFrame(
        [(2, "B", 200, "u"), (3, "c", 0, "d"), (5, "e", 50, "u")],
        "k INT, v STRING, n INT, op STRING",
    )
    v0 = tbl.version
    tbl.merge_clauses(
        src,
        keys=("k",),
        matched=(
            {"action": "delete", "condition": "source.op = 'd'"},
            {"action": "update", "set": None},
        ),
        not_matched=({"action": "insert", "values": None},),
        not_matched_by_source=(
            {"action": "delete", "condition": "target.k = 4"},
        ),
    )
    feed = {
        (r["k"], r["_change_type"]): r["_row_id"]
        for r in tbl.changes_with_ids(v0, tbl.version).collect()
    }
    # update: pre and post share the PRE-EXISTING stable id
    assert feed[(2, "update_preimage")] == ids0[2]
    assert feed[(2, "update_postimage")] == ids0[2]
    # tombstone + NMBS delete: delete images under their old ids
    assert feed[(3, "delete")] == ids0[3]
    assert feed[(4, "delete")] == ids0[4]
    # insert: a fresh id, never a reused one
    assert feed[(5, "insert")] not in set(ids0.values())
    # k=1 was untouched: no feed row at all
    assert not any(k == 1 for k, _ in feed)


def test_merge_clauses_file_scope_pruning(spark, tmp_path):
    """Without a BY SOURCE clause the rewrite touches only files whose
    prune-key stats overlap the source; with one, every file (the cost
    Delta documents for that clause)."""
    t = MiniLogTable(spark, str(tmp_path / "fp"), stats_cols=("k",))
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING"))
    t.append(spark.createDataFrame([(100, "x"), (200, "y")], "k INT, v STRING"))
    src = spark.createDataFrame([(1, "A")], "k INT, v STRING")
    info = t.merge_clauses(
        src, keys=("k",), matched=({"action": "update", "set": None},)
    )
    assert (info["rewritten"], info["kept"]) == (1, 1)
    info = t.merge_clauses(
        src,
        keys=("k",),
        matched=({"action": "update", "set": None},),
        not_matched_by_source=(
            {"action": "update", "set": {"v": "target.v"}},
        ),
    )
    assert info["kept"] == 0  # BY SOURCE examines every base row


# --------------------------------------------- MERGE schema evolution


def test_merge_evolve_new_column(spark, tbl):
    """evolve_schema=True widens the table with the source's new
    column in the SAME commit; unmatched base rows read NULL; time
    travel to the pre-merge version shows the narrow schema."""
    src = spark.createDataFrame(
        [(2, "B", 200, "eu")], "k INT, v STRING, n INT, region STRING"
    )
    v0 = tbl.version
    info = tbl.merge_clauses(
        src,
        keys=("k",),
        matched=({"action": "update", "set": None},),
        evolve_schema=True,
    )
    assert info["evolved"] == ["region"]
    got = {r["k"]: r["region"] for r in tbl.read().collect()}
    assert got == {1: None, 2: "eu", 3: None, 4: None}
    # narrow schema before, wide after — in one commit
    assert "region" not in tbl.read(version=v0).columns
    assert tbl.version == v0 + 1


def test_merge_explicit_new_column_requires_flag(spark, tbl):
    """An explicit set/values naming a column the table lacks refuses
    without evolve_schema; implicit whole-row upserts treat extra
    source columns as payload (no refusal, no write)."""
    src = spark.createDataFrame(
        [(2, "B", 200, "eu")], "k INT, v STRING, n INT, region STRING"
    )
    with pytest.raises(SchemaMismatch, match="region"):
        tbl.merge_clauses(
            src,
            keys=("k",),
            matched=(
                {"action": "update", "set": {"region": "source.region"}},
            ),
        )
    # implicit whole-row: extra column rides as payload, not schema
    tbl.merge_clauses(
        src, keys=("k",), matched=({"action": "update", "set": None},)
    )
    assert "region" not in tbl.read().columns


def test_merge_evolve_type_conflict_raises(spark, tbl):
    src = spark.createDataFrame(
        [(2, 999, 200)], "k INT, v INT, n INT"  # v: STRING in the table
    )
    with pytest.raises(SchemaMismatch):
        tbl.merge_clauses(
            src,
            keys=("k",),
            matched=({"action": "update", "set": None},),
            evolve_schema=True,
        )


# ------------------------------------- in-commit timestamps (r10)


def test_commit_timestamps_strictly_monotone_under_races(spark, tmp_path):
    """The monotonicity PROPERTY that makes version_at's binary search
    sound: 4 threads racing 3 appends each (OCC retries rebase onto
    the winner's timestamp), and every entry's ts must still be
    strictly increasing in version order."""
    path = str(tmp_path / "mono")
    MiniLogTable(spark, path).append(
        spark.createDataFrame([(0, 0)], "k INT, n INT")
    )
    errs = []

    def work(i: int) -> None:
        try:
            t = MiniLogTable(spark, path)
            for j in range(3):
                t.append(
                    spark.createDataFrame([(i, j)], "k INT, n INT")
                )
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    t = MiniLogTable(spark, path)
    assert t.version == 12
    stamps = [h["timestamp"] for h in t.history()]  # oldest-first
    assert all(ts is not None for ts in stamps)
    assert all(a < b for a, b in zip(stamps, stamps[1:]))


def test_timestamp_time_travel_resolution(spark, tmp_path):
    """read(timestamp=) resolves between/at commit timestamps; before
    the first commit raises; beyond the latest floors to latest."""
    t = MiniLogTable(spark, str(tmp_path / "tt"))
    t.append(spark.createDataFrame([(1,)], "k INT"))
    t.append(spark.createDataFrame([(2,)], "k INT"))
    t.append(spark.createDataFrame([(3,)], "k INT"))
    hist = {h["version"]: h["timestamp"] for h in t.history()}
    # exactly at v1's stamp -> v1; between v1 and v2 -> v1
    assert t.version_at(hist[1]) == 1
    if hist[2] - hist[1] > 1:
        assert t.version_at(hist[1] + 1) == 1
    assert _rows(t.read(timestamp=hist[1])) == [(1,), (2,)]
    # beyond latest floors to latest
    assert t.version_at(hist[2] + 10_000_000) == 2
    # predating the oldest commit raises
    with pytest.raises(NoSuchVersion):
        t.version_at(hist[0] - 1)
    # first_version_at_or_after: the startingTimestamp contract
    assert t.first_version_at_or_after(hist[1]) == 1
    assert t.first_version_at_or_after(hist[2] + 10_000_000) is None


def test_timestamp_asof_native_reader(spark, tmp_path):
    """option('timestampAsOf') on the native DSv2 reader resolves
    through the same in-commit timestamps."""
    from bootic_stats_aggregates_spark.sources.minilog_source import (
        register,
    )

    register(spark)
    t = MiniLogTable(spark, str(tmp_path / "nta"))
    t.append(spark.createDataFrame([(1,)], "k INT"))
    t.append(spark.createDataFrame([(2,)], "k INT"))
    ts0 = t.history()[0]["timestamp"]  # v0's stamp (oldest-first)
    got = (
        spark.read.format("minilog")
        .option("timestampAsOf", ts0)
        .load(t.path)
    )
    assert _rows(got) == [(1,)]


# ------------------------------------- incremental clustering (r10)


def test_optimize_cluster_touches_only_new_files(spark, tmp_path):
    """The liquid-clustering contract: pass 2 rewrites ONLY files
    appended since pass 1 — converged files are never touched — and a
    converged table is a zero-commit no-op."""
    t = MiniLogTable(spark, str(tmp_path / "lc"), stats_cols=("k",))
    for lo in (0, 100):
        t.append(
            spark.range(lo, lo + 50).select(
                F.col("id").cast("int").alias("k"),
                (F.col("id") % 7).cast("int").alias("n"),
            )
        )
    t.set_cluster_keys(("k",))
    r1 = t.optimize_cluster(target_files=2)
    assert r1["reclustered"] == 2
    files_after_p1 = {f.file for f in t.snapshot().files}
    # fresh appends arrive unclustered
    t.append(
        spark.range(200, 230).select(
            F.col("id").cast("int").alias("k"),
            F.lit(0).alias("n"),
        )
    )
    new_files = {f.file for f in t.snapshot().files} - files_after_p1
    r2 = t.optimize_cluster(target_files=1)
    assert r2["reclustered"] == len(new_files)  # O(new data), not O(table)
    survivors = {f.file for f in t.snapshot().files}
    assert files_after_p1 <= survivors | new_files
    assert files_after_p1 & survivors == files_after_p1  # untouched
    # converged: no-op, NO commit
    v = t.version
    r3 = t.optimize_cluster()
    assert r3["reclustered"] == 0 and t.version == v
    # data never changed through any of it
    assert t.read().count() == 130


def test_cluster_key_change_requalifies_everything(spark, tmp_path):
    """Changing keys is a metadata-only epoch bump: every live file
    re-qualifies and converges through the same incremental loop."""
    t = MiniLogTable(spark, str(tmp_path / "kc"), stats_cols=("k",))
    t.append(
        spark.range(100).select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") * 3 % 11).cast("int").alias("n"),
        )
    )
    t.set_cluster_keys(("k",))
    t.optimize_cluster(target_files=2)
    v_meta = t.version
    t.set_cluster_keys(("n", "k"))  # 2 keys: Morton interleave
    assert t.version == v_meta + 1  # O(metadata) commit, no data moved
    snap = t.snapshot()
    assert all(f.cluster_epoch != snap.cluster_epoch for f in snap.files)
    r = t.optimize_cluster(target_files=2)
    assert r["reclustered"] == 2
    assert t.optimize_cluster()["reclustered"] == 0
    assert t.read().count() == 100


def test_cluster_keys_validation(spark, tmp_path):
    t = MiniLogTable(
        spark, str(tmp_path / "cv"), partition_by=("p",)
    )
    t.append(
        spark.createDataFrame([("a", 1), ("b", 2)], "p STRING, k INT")
    )
    with pytest.raises(ValueError, match="partition columns"):
        t.set_cluster_keys(("p",))
    with pytest.raises(ValueError, match="no such column"):
        t.set_cluster_keys(("ghost",))
    with pytest.raises(ValueError, match="1 or 2"):
        t.set_cluster_keys(("k", "k", "k"))
    with pytest.raises(ValueError, match="set_cluster_keys first"):
        t.optimize_cluster()


# --------------------------------------- keyed incremental view (r10)


def test_apply_changes_folds_to_direct_read(spark, tbl):
    """Folding the row-tracked feeds commit-by-commit (and as ONE
    spanning feed) reproduces read_with_row_ids(vN) exactly across a
    MERGE clause mix, a DV delete, and an OPTIMIZE that feeds
    nothing."""
    v0 = tbl.version
    state = tbl.read_with_row_ids(version=v0)
    src = spark.createDataFrame(
        [(2, "B", 200, "u"), (3, "c", 0, "d"), (9, "i", 90, "u")],
        "k INT, v STRING, n INT, op STRING",
    )
    tbl.merge_clauses(
        src,
        keys=("k",),
        matched=(
            {"action": "delete", "condition": "source.op = 'd'"},
            {"action": "update", "set": None},
        ),
        not_matched=({"action": "insert", "values": None},),
    )
    tbl.delete_where_dv("k", 4, 4)
    tbl.optimize()
    vn = tbl.version
    # per-commit fold
    for v in range(v0 + 1, vn + 1):
        state = apply_changes(state, tbl.changes_with_ids(v - 1, v))
    direct = tbl.read_with_row_ids(version=vn)
    assert _rows(state) == _rows(direct)
    # one spanning feed equals the composition
    spanning = apply_changes(
        tbl.read_with_row_ids(version=v0),
        tbl.changes_with_ids(v0, vn),
    )
    assert _rows(spanning) == _rows(direct)
    # OPTIMIZE contributed nothing to the feed
    assert tbl.changes_with_ids(vn - 1, vn).count() == 0


# ------------------------------------- partitioned-write hygiene (r10)


def test_split_by_value_one_file_per_partition(spark, tmp_path):
    """File hygiene for wide partitioned writes: the default task-side
    split lands one file per (input task, value); split_by_value=True
    repartitions on the partition columns first, so the SAME write
    lands exactly one file per partition value — parallel across
    values, #files == #values — with identical data and identical
    pruning metadata."""
    vals = 25
    df = spark.range(0, 10_000, 1, 16).select(  # 16 input tasks
        (F.col("id") % vals).cast("string").alias("p"),
        F.col("id").alias("n"),
    )
    noisy = MiniLogTable(
        spark, str(tmp_path / "noisy"), partition_by=("p",)
    )
    noisy.append(df, target_files=None)  # one file per (task, value)
    t = MiniLogTable(spark, str(tmp_path / "clean"), partition_by=("p",))
    t.append(df, target_files=None, split_by_value=True)
    assert len(t.select_files()) == vals
    assert len(noisy.select_files()) > vals  # the problem being fixed
    # identical data, directory pruning still exact
    assert t.read().count() == 10_000
    assert (
        _rows(t.read()) == _rows(noisy.read())
    )
    assert len(t.select_files(prune=("p", "3", "3"))) == 1
    # overwrite takes the same path
    t.overwrite(df, split_by_value=True)
    assert len(t.select_files()) == vals


# ------------------------------- streamed keyed view (r10, CDF+rowIds)


def test_cdf_stream_with_row_ids_folds_keyed_state(spark, tmp_path):
    """readChangeFeed + withRowIds: the streamed feed carries stable
    row ids — an update surfaces as delete+insert UNDER THE SAME id,
    an OPTIMIZE feeds nothing — and one apply_changes fold of the
    whole multi-commit feed (net-cancel first) reproduces the direct
    id-keyed read from an EMPTY bootstrap."""
    from bootic_stats_aggregates_spark.sources.minilog_source import (
        register,
    )

    register(spark)
    t = MiniLogTable(spark, str(tmp_path / "cr"), stats_cols=("k",))
    t.append(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k INT, v STRING"
        )
    )
    ids0 = {r["k"]: r["_row_id"] for r in t.read_with_row_ids().collect()}
    t.merge(
        spark.createDataFrame([(2, "B"), (9, "i")], "k INT, v STRING"),
        keys=("k",),
    )
    t.delete_where_dv("k", 3, 3)
    t.optimize()
    q = (
        spark.readStream.format("minilog")
        .option("readChangeFeed", "true")
        .option("withRowIds", "true")
        .load(t.path)
        .writeStream.format("memory")
        .queryName("cdf_rids_t")
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    assert q.awaitTermination(120)
    feed = spark.table("cdf_rids_t")
    tagged = {
        (r["k"], r["_change_type"], r["_commit_version"]): r["_row_id"]
        for r in feed.collect()
    }
    # update linkage: k=2's delete and insert at v1 share one id
    assert tagged[(2, "delete", 1)] == ids0[2] == tagged[(2, "insert", 1)]
    # the DV delete surfaces k=3 under its original id
    assert tagged[(3, "delete", 2)] == ids0[3]
    # the OPTIMIZE commit (v3) fed nothing
    assert not any(ver == 3 for _, _, ver in tagged)
    state = apply_changes(
        spark.createDataFrame([], "k INT, v STRING, _row_id BIGINT"),
        feed.drop("_commit_version"),
    )
    direct = t.read_with_row_ids()
    assert (
        state.exceptAll(direct).isEmpty()
        and direct.exceptAll(state).isEmpty()
    )


def test_vacuum_retain_since_timestamp(spark, tmp_path):
    """vacuum(retain_since=) — Delta's RETAIN-by-age contract over the
    in-commit timestamps: versions stamped at-or-after the cutoff
    survive (time travel intact), older entries and their unreachable
    files are reaped; the latest version survives any cutoff; the
    wider of (retain_last, retain_since) wins."""
    t = MiniLogTable(spark, str(tmp_path / "vr"))
    t.append(spark.createDataFrame([(1,)], "k INT"))
    t.overwrite(spark.createDataFrame([(2,)], "k INT"))
    t.overwrite(spark.createDataFrame([(3,)], "k INT"))
    t.overwrite(spark.createDataFrame([(4,)], "k INT"))
    ts = {h["version"]: h["timestamp"] for h in t.history()}
    removed = t.vacuum(
        retain_last=1, min_age_seconds=0, retain_since=ts[2]
    )
    assert removed  # v0/v1's overwritten files reaped
    assert _rows(t.read(version=2)) == [(3,)]  # window start retained
    assert _rows(t.read(timestamp=ts[2])) == [(3,)]
    with pytest.raises(NoSuchVersion):
        t.read(version=1)
    # a future cutoff still keeps the latest version
    t2 = MiniLogTable(spark, str(tmp_path / "vr2"))
    t2.append(spark.createDataFrame([(1,)], "k INT"))
    t2.overwrite(spark.createDataFrame([(2,)], "k INT"))
    latest_ts = t2.history()[-1]["timestamp"]
    t2.vacuum(
        retain_last=1, min_age_seconds=0,
        retain_since=latest_ts + 10_000_000,
    )
    assert _rows(t2.read()) == [(2,)]
    # wider window wins: retain_last=10 keeps everything even with an
    # aggressive cutoff
    t3 = MiniLogTable(spark, str(tmp_path / "vr3"))
    t3.append(spark.createDataFrame([(1,)], "k INT"))
    t3.overwrite(spark.createDataFrame([(2,)], "k INT"))
    t3.vacuum(
        retain_last=10, min_age_seconds=0,
        retain_since=t3.history()[-1]["timestamp"],
    )
    assert _rows(t3.read(version=0)) == [(1,)]


def test_cluster_epoch_survives_lifecycle(spark, tmp_path):
    """The §2 claim that makes incremental clustering O(new data) in
    production: a converged file's epoch survives DV swaps, bloom
    stats refreshes, checkpoint folds, restore and clone — none of
    those re-qualify it for rewriting."""
    path = str(tmp_path / "el")
    t = MiniLogTable(spark, path, stats_cols=("k",))
    for lo in (0, 100):
        t.append(
            spark.range(lo, lo + 100).select(
                F.col("id").cast("int").alias("k"),
                (F.col("id") % 9).cast("int").alias("n"),
            )
        )
    t.set_cluster_keys(("k",))
    assert t.optimize_cluster(target_files=2)["reclustered"] == 2
    # DV delete: the re-added entry must keep the file's epoch
    t.delete_where_dv("k", 0, 4)
    assert t.optimize_cluster()["reclustered"] == 0
    # bloom backfill stats refresh: same
    tb = MiniLogTable(spark, path, bloom_cols=("n",))
    assert tb.build_bloom_index()["indexed"] > 0
    assert t.optimize_cluster()["reclustered"] == 0
    # checkpoint fold: cross CHECKPOINT_EVERY and reopen a FRESH handle
    from bootic_stats_aggregates_spark.acid import CHECKPOINT_EVERY

    while t.version % CHECKPOINT_EVERY != 0:
        t.append(
            spark.createDataFrame([(10_000 + t.version, 0)], "k INT, n INT")
        )
    t2 = MiniLogTable(spark, path, stats_cols=("k",))
    snap = t2.snapshot()
    assert any(f.cluster_epoch == snap.cluster_epoch for f in snap.files)
    # only the filler appends (not the converged files) re-qualify
    converged = {
        f.file for f in snap.files if f.cluster_epoch == snap.cluster_epoch
    }
    r = t2.optimize_cluster()
    assert r["reclustered"] == len(snap.files) - len(converged)
    assert converged <= {f.file for f in t2.snapshot().files}
    # restore to the converged state: epochs ride the re-add actions
    v_good = t2.version
    t2.append(spark.createDataFrame([(99_999, 0)], "k INT, n INT"))
    t2.restore(v_good)
    assert t2.optimize_cluster()["reclustered"] == 0
    # clone: the new log's v0 carries the epochs
    c = t2.clone(str(tmp_path / "el_clone"))
    assert c.snapshot().cluster_cols == t2.snapshot().cluster_cols
    assert c.optimize_cluster()["reclustered"] == 0


def test_starting_timestamp_tail_and_cdf_streams(spark, tmp_path):
    """option('startingTimestamp') on both native stream modes: the
    plain tail emits only commits stamped at-or-after the cutoff
    (earlier ones intentionally skipped, no bootstrap), and the CDF
    stream feeds changes from the same resolution; a beyond-latest
    cutoff yields an empty (future-only) stream."""
    from bootic_stats_aggregates_spark.sources.minilog_source import (
        register,
    )

    register(spark)
    t = MiniLogTable(spark, str(tmp_path / "st"))
    t.append(spark.createDataFrame([(1,)], "k INT"))
    t.append(spark.createDataFrame([(2,)], "k INT"))
    t.append(spark.createDataFrame([(3,)], "k INT"))
    ts = {h["version"]: h["timestamp"] for h in t.history()}

    def drain(reader, name):
        q = (
            reader.writeStream.format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        assert q.awaitTermination(120)
        return spark.table(name)

    got = drain(
        spark.readStream.format("minilog")
        .option("startingTimestamp", ts[1])
        .load(t.path),
        "st_tail",
    )
    assert _rows(got) == [(2,), (3,)]  # v0 skipped, no bootstrap
    got = drain(
        spark.readStream.format("minilog")
        .option("readChangeFeed", "true")
        .option("startingTimestamp", ts[2])
        .load(t.path),
        "st_cdf",
    )
    assert [tuple(r) for r in got.select("k", "_change_type").collect()] == [
        (3, "insert")
    ]
    got = drain(
        spark.readStream.format("minilog")
        .option("startingTimestamp", ts[2] + 10_000_000)
        .load(t.path),
        "st_future",
    )
    assert got.count() == 0


def test_merge_scope_prunes_by_partition_value(spark, tmp_path):
    """MERGE pruned on a PARTITION column must scope by directory
    values — partition columns carry no file stats, so stats-only
    scoping would rewrite the whole table. Covers both merge() and
    merge_clauses(), plus the NULL-key leg (only the null-partition
    directory is touched)."""
    t = MiniLogTable(
        spark, str(tmp_path / "mp"), stats_cols=("k",),
        partition_by=("day",),
    )
    t.append(
        spark.createDataFrame(
            [(1, 1, "a"), (2, 1, "b"), (1, 2, "c"), (2, 2, "d"),
             (1, None, "e")],
            "k INT, day INT, v STRING",
        ),
        split_by_value=True,
    )
    assert len(t.select_files()) == 3  # day=1, day=2, null partition
    # merge_clauses keyed+pruned on day: only day=1 rewrites
    info = t.merge_clauses(
        spark.createDataFrame([(1, 1, "A")], "k INT, day INT, v STRING"),
        keys=("k", "day"),
        prune_col="day",
        matched=({"action": "update", "set": None},),
    )
    assert (info["rewritten"], info["kept"]) == (1, 2)
    # merge(): same scope contract
    info = t.merge(
        spark.createDataFrame([(2, 2, "D")], "k INT, day INT, v STRING"),
        keys=("k", "day"),
        prune_col="day",
    )
    assert (info["rewritten"], info["kept"]) == (1, 2)
    # NULL prune key: only the null-partition directory is examined
    info = t.merge(
        spark.createDataFrame(
            [(1, None, "E")], "k INT, day INT, v STRING"
        ),
        keys=("k", "day"),
        prune_col="day",
    )
    assert (info["rewritten"], info["kept"]) == (1, 2)
    got = {tuple(r) for r in t.read().collect()}
    assert got == {
        (1, 1, "A"), (2, 1, "b"), (1, 2, "c"), (2, 2, "D"),
        (1, None, "E"),
    }


def test_delete_scope_prunes_by_partition_value(spark, tmp_path):
    """delete_where / delete_where_dv keyed on the partition column
    touch only the matching directory (partition values ahead of
    stats), and a NULL-range probe touches nothing."""
    t = MiniLogTable(
        spark, str(tmp_path / "dp"), stats_cols=("k",),
        partition_by=("day",),
    )
    t.append(
        spark.createDataFrame(
            [(1, 1), (2, 1), (3, 2), (4, 2), (5, None)],
            "k INT, day INT",
        ),
        split_by_value=True,
    )
    files0 = {f.file for f in t.snapshot().files}
    assert len(files0) == 3
    r = t.delete_where("day", 2, 2)
    assert (r["rewritten"], r["kept"]) == (1, 2)
    assert _rows(t.read().select("k")) == [(1,), (2,), (5,)]
    r = t.delete_where_dv("day", 1, 1)
    assert r["dv_files"] == 1
    got = {r2["k"] for r2 in t.read().collect()}
    assert got == {5}  # the null-partition row survives both deletes


def test_optimize_cluster_where_scope(spark, tmp_path):
    """optimize_cluster(where=) clusters the scoped slice first — a
    hot partition converges without waiting on the backlog — and the
    epoch filter composes: a later unscoped pass picks up ONLY the
    remainder."""
    t = MiniLogTable(
        spark, str(tmp_path / "cw"), stats_cols=("k",),
        partition_by=("day",),
    )
    for d in (1, 2):
        for lo in (0, 50):
            t.append(
                spark.range(lo, lo + 50).select(
                    F.lit(d).alias("day"),
                    F.col("id").cast("int").alias("k"),
                ),
                split_by_value=True,
            )
    t.set_cluster_keys(("k",))
    r = t.optimize_cluster(target_files=1, where=("day", 1, 1))
    assert r["reclustered"] == 2  # day=1's two files only
    snap = t.snapshot()
    hot = [f for f in snap.files if f.partition.get("day") == 1]
    cold = [f for f in snap.files if f.partition.get("day") == 2]
    assert all(f.cluster_epoch == snap.cluster_epoch for f in hot)
    assert all(f.cluster_epoch != snap.cluster_epoch for f in cold)
    # scoped again: nothing left in scope, no commit
    v = t.version
    assert (
        t.optimize_cluster(where=("day", 1, 1))["reclustered"] == 0
        and t.version == v
    )
    # unscoped pass converges the remainder only
    assert t.optimize_cluster(target_files=1)["reclustered"] == 2
    assert t.optimize_cluster()["reclustered"] == 0
    assert t.read().count() == 200

"""MiniLog ACID table format: the mechanics no SQL oracle can express.

The three registered tx_ ops (operators/acid_ops.py) pin the *results* of
time travel / file-pruned merge / exactly-once replay against DuckDB;
this file covers the protocol itself — commit atomicity under racing
writers, conflict detection, data skipping proven on the selected-file
list (never on timing), vacuum retention, and log checkpoints.
"""

from __future__ import annotations

import json
import os
import threading

import pytest

from bootic_stats_aggregates_spark.acid import (
    CHECKPOINT_EVERY,
    ConcurrentModification,
    MiniLogTable,
    NoSuchVersion,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k INT, v STRING")


@pytest.fixture
def tbl(spark, tmp_path):
    return MiniLogTable(spark, str(tmp_path / "t"), stats_cols=("k",))


def test_append_read_roundtrip(spark, tbl):
    tbl.append(_df(spark, [(1, "a"), (2, "b")]))
    tbl.append(_df(spark, [(3, "c")]))
    assert tbl.version == 1
    got = sorted(tuple(r) for r in tbl.read().collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_time_travel_and_overwrite(spark, tbl):
    tbl.append(_df(spark, [(1, "a")]))
    tbl.overwrite(_df(spark, [(9, "z")]))
    assert [tuple(r) for r in tbl.read(version=0).collect()] == [(1, "a")]
    assert [tuple(r) for r in tbl.read().collect()] == [(9, "z")]
    with pytest.raises(NoSuchVersion):
        tbl.snapshot(7)


def test_data_skipping_on_file_list(spark, tbl):
    tbl.append(_df(spark, [(1, "a"), (5, "b")]))    # stats k=[1,5]
    tbl.append(_df(spark, [(10, "c"), (20, "d")]))  # stats k=[10,20]
    assert len(tbl.select_files()) == 2
    assert len(tbl.select_files(prune=("k", 1, 4))) == 1
    assert len(tbl.select_files(prune=("k", 6, 9))) == 0
    assert len(tbl.select_files(prune=("k", 5, 10))) == 2
    # the prune is an optimization on top of the row filter, not the filter
    got = [tuple(r) for r in tbl.read(prune=("k", 5, 10)).collect()]
    assert sorted(got) == [(5, "b"), (10, "c")]


def test_delete_where_rewrites_only_overlap(spark, tbl):
    tbl.append(_df(spark, [(1, "a"), (5, "b")]))
    tbl.append(_df(spark, [(10, "c"), (20, "d")]))
    before = set(tbl.select_files())
    info = tbl.delete_where("k", 15, 25)
    assert info["rewritten"] == 1 and info["kept"] == 1
    after = set(tbl.select_files())
    assert before & after, "the non-overlapping file must survive untouched"
    got = sorted(tuple(r) for r in tbl.read().collect())
    assert got == [(1, "a"), (5, "b"), (10, "c")]


def test_merge_upsert_and_insert(spark, tbl):
    tbl.append(_df(spark, [(1, "a"), (2, "b")]))
    info = tbl.merge(
        _df(spark, [(2, "B"), (3, "C")]), keys=("k",), prune_col="k"
    )
    assert info["rewritten"] == 1
    got = sorted(tuple(r) for r in tbl.read().collect())
    assert got == [(1, "a"), (2, "B"), (3, "C")]


def test_merge_empty_updates_is_noop(spark, tbl):
    tbl.append(_df(spark, [(1, "a")]))
    v = tbl.version
    info = tbl.merge(_df(spark, []), keys=("k",))
    assert info["rewritten"] == 0 and tbl.version == v


def test_concurrent_appends_all_land(spark, tmp_path):
    """N racing appenders: every commit must land (appends auto-rebase
    through version races), versions must be a gapless serial order, and
    no rows may be lost."""
    path = str(tmp_path / "race")
    MiniLogTable(spark, path, stats_cols=("k",)).append(
        _df(spark, [(0, "seed")])
    )
    n_writers, errors = 6, []

    def write(i: int) -> None:
        try:
            t = MiniLogTable(spark, path, stats_cols=("k",))
            t.append(_df(spark, [(i, f"w{i}")]))
        except Exception as exc:  # pragma: no cover - the assert reports it
            errors.append(exc)

    threads = [
        threading.Thread(target=write, args=(i,)) for i in range(1, n_writers + 1)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    tbl = MiniLogTable(spark, path, stats_cols=("k",))
    assert not errors
    assert tbl.version == n_writers  # gapless: seed + one per writer
    assert tbl.read().count() == n_writers + 1


def test_conflicting_rewrites_detected(spark, tbl):
    """Two transactions planning to rewrite the SAME file: the one that
    commits second must fail conflict validation, not silently resurrect
    deleted rows (write skew)."""
    tbl.append(_df(spark, [(1, "a"), (2, "b")]))
    victim = tbl.snapshot().files[0].file
    # transaction A deletes k=1 (removes + re-adds the file)
    tbl.delete_where("k", 1, 1)
    # transaction B staged against the OLD snapshot and now tries to
    # commit a removal of the same (no longer live) file
    with pytest.raises(ConcurrentModification):
        tbl._try_commit("merge", [{"type": "remove", "file": victim}])


def test_txn_replay_skips_without_staging(spark, tbl):
    tbl.append(_df(spark, [(1, "a")]), txn={"app": "s", "version": 1})
    tbl.append(_df(spark, [(1, "dup")]), txn={"app": "s", "version": 1})
    tbl.append(_df(spark, [(2, "b")]), txn={"app": "s", "version": 2})
    assert tbl.version == 1
    assert tbl.read().count() == 2
    # data dir holds exactly the two live files: the replay staged nothing
    parquet = [n for n in os.listdir(tbl.path) if n.endswith(".parquet")]
    assert len(parquet) == 2


def test_checkpoint_written_and_equivalent(spark, tbl):
    for i in range(CHECKPOINT_EVERY + 2):
        tbl.append(_df(spark, [(i, f"r{i}")]))
    ckpt = os.path.join(
        tbl.path, "_minilog", f"{CHECKPOINT_EVERY:08d}.checkpoint.json"
    )
    assert os.path.exists(ckpt)
    # fold-from-checkpoint must equal fold-from-scratch: compare against
    # the raw log replayed by hand
    snap = tbl.snapshot()
    live = {}
    for v in range(tbl.version + 1):
        with open(os.path.join(tbl.path, "_minilog", f"{v:08d}.json")) as fh:
            e = json.load(fh)
        for a in e["actions"]:
            if a["type"] == "add":
                live[a["file"]] = a["rows"]
            else:
                live.pop(a["file"], None)
    assert {f.file: f.rows for f in snap.files} == live


def test_vacuum_drops_unreachable_and_shortens_history(spark, tbl):
    tbl.append(_df(spark, [(1, "a")]))
    tbl.overwrite(_df(spark, [(2, "b")]))
    tbl.overwrite(_df(spark, [(3, "c")]))
    n_parquet = len([n for n in os.listdir(tbl.path) if n.endswith(".parquet")])
    assert n_parquet == 3
    removed = tbl.vacuum(retain_last=1, min_age_seconds=0)
    assert len(removed) == 2
    assert [tuple(r) for r in tbl.read().collect()] == [(3, "c")]
    with pytest.raises(NoSuchVersion):
        tbl.read(version=0)


def test_empty_append_commits_nothing_heavy(spark, tbl):
    tbl.append(_df(spark, [(1, "a")]))
    tbl.append(_df(spark, []))  # empty batch: a commit with zero adds
    assert tbl.read().count() == 1
    snap = tbl.snapshot()
    assert len(snap.files) == 1


def test_delete_where_null_keys_survive(spark, tbl):
    """A NULL key is never 'in [lo, hi]': delete_where must rewrite the
    file WITHOUT dropping its NULL-keyed rows (hostile-corpus NULL
    contract, round-5 bug class)."""
    tbl.append(_df(spark, [(1, "a"), (None, "nul"), (5, "b")]))
    tbl.delete_where("k", 4, 9)
    got = sorted(
        (tuple(r) for r in tbl.read().collect()),
        key=lambda t: (t[0] is None, t),
    )
    assert got == [(1, "a"), (None, "nul")]


def test_merge_null_safe_keys(spark, tbl):
    """MERGE key equality is null-safe: a NULL-keyed update row UPDATES
    the NULL-keyed base row (no duplicate insert) — oracles mirror it
    with IS NOT DISTINCT FROM."""
    tbl.append(_df(spark, [(1, "a"), (None, "old")]))
    tbl.merge(_df(spark, [(None, "new")]), keys=("k",))
    got = sorted(
        (tuple(r) for r in tbl.read().collect()),
        key=lambda t: (t[0] is None, t),
    )
    assert got == [(1, "a"), (None, "new")]


def test_merge_update_can_write_null(spark, tbl):
    """The matched update row wins ROW-WISE: an update that intentionally
    sets a non-key column to NULL writes that NULL instead of silently
    keeping the stale base value (the per-column-coalesce bug, ADVICE
    r6)."""
    tbl.append(_df(spark, [(1, "keep"), (2, "stale")]))
    tbl.merge(_df(spark, [(2, None)]), keys=("k",))
    got = sorted(tuple(r) for r in tbl.read().collect())
    assert got == [(1, "keep"), (2, None)]


def test_merge_duplicate_update_keys_fail_fast(spark, tbl):
    """Duplicate keys in the updates side would fan out the full-outer
    join (nondeterministic last-writer, duplicated base rows): merge
    raises instead, mirroring Delta's multiple-match error (ADVICE r6)."""
    tbl.append(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="duplicate keys"):
        tbl.merge(_df(spark, [(1, "x"), (1, "y")]), keys=("k",))


def test_vacuum_age_guard_protects_inflight_staging(spark, tbl):
    """A fresh unreferenced parquet in the table root may belong to a
    transaction between _stage and commit: vacuum must skip it under the
    default retention window and reclaim it only at min_age_seconds=0
    (ADVICE r6 staging-race guard)."""
    tbl.append(_df(spark, [(1, "a")]))
    staged = os.path.join(tbl.path, "deadbeef00000000.parquet")
    with open(staged, "wb") as fh:
        fh.write(b"not-yet-committed")
    assert tbl.vacuum(retain_last=1) == []  # young file survives
    assert os.path.exists(staged)
    removed = tbl.vacuum(retain_last=1, min_age_seconds=0)
    assert removed == ["deadbeef00000000.parquet"]
    assert not os.path.exists(staged)


def test_txn_replay_after_staging_cleans_orphans(spark, tbl):
    """If the SAME txn was applied by a concurrent writer between our
    _stage and _try_commit, the replay-skip return must delete the
    already-renamed staged files instead of orphaning them until a
    vacuum (ADVICE r6)."""
    tbl.append(_df(spark, [(1, "a")]), txn={"app": "s", "version": 7})
    # simulate the race: stage a second copy by hand, then try to commit
    # it under the SAME txn marker — _try_commit must skip AND clean up
    actions = tbl._stage(_df(spark, [(1, "dup")]), target_files=1)
    staged_names = {a["file"] for a in actions}
    assert all(
        os.path.exists(os.path.join(tbl.path, n)) for n in staged_names
    )
    v = tbl._try_commit("append", actions, txn={"app": "s", "version": 7})
    assert v == tbl.version  # no new commit
    assert not any(
        os.path.exists(os.path.join(tbl.path, n)) for n in staged_names
    )
    parquet = [n for n in os.listdir(tbl.path) if n.endswith(".parquet")]
    assert len(parquet) == 1  # only the originally-committed file

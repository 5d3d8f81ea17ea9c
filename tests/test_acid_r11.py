"""Round-11 regressions for the r10 ADVICE defects plus the
DV x clustering lifecycle hardening (VERDICT r10 task 7).

- apply_changes must net-cancel ACROSS commits even when the feed
  still carries ``_commit_version`` (the streamed readChangeFeed
  shape) — and must fail LOUDLY on genuinely stray columns instead of
  hiding them behind the trailing select (ADVICE r10 medium).
- build_bloom_index must leave a file's already-indexed columns'
  blooms byte-identical when backfilling a DIFFERENT column (ADVICE
  r10 low: the commit loop used to overwrite satisfied columns).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bootic_stats_aggregates_spark.acid import (
    MiniLogTable,
    apply_changes,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ----------------------------- apply_changes column contract (ADVICE r10)


def test_apply_changes_nets_across_commit_versions(spark, tmp_path):
    """A row inserted at vK and deleted at vM, fed as ONE batch that
    still carries _commit_version, must net to NOTHING — not be
    resurrected because the version column kept the two sides from
    cancelling. This is exactly the streamed readChangeFeed+withRowIds
    shape an external consumer would feed without remembering to drop
    the column."""
    t = MiniLogTable(spark, str(tmp_path / "t"), stats_cols=("k",))
    t.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING")
    )
    v0 = t.version
    state = t.read_with_row_ids(version=v0)
    # vK: insert k=9; vM: delete it again (plus a real update of k=2)
    t.append(spark.createDataFrame([(9, "i")], "k INT, v STRING"))
    t.merge(
        spark.createDataFrame([(2, "B")], "k INT, v STRING"), keys=("k",)
    )
    t.delete_where("k", 9, 9)
    vn = t.version
    feed = t.changes_with_ids(v0, vn).withColumn(
        "_commit_version", F.lit(None).cast("bigint")
    )
    # sanity: per-commit versions differ — stamp them realistically
    feeds = [
        t.changes_with_ids(v - 1, v).withColumn(
            "_commit_version", F.lit(v).cast("bigint")
        )
        for v in range(v0 + 1, vn + 1)
    ]
    stamped = feeds[0]
    for f in feeds[1:]:
        stamped = stamped.unionByName(f)
    folded = apply_changes(state, stamped)
    direct = t.read_with_row_ids(version=vn)
    assert _rows(folded) == _rows(direct)
    assert not any(r["k"] == 9 for r in folded.collect())
    # the unstamped spanning feed still folds identically
    assert _rows(apply_changes(state, feed)) == _rows(direct)


def test_apply_changes_rejects_stray_and_missing_columns(spark, tmp_path):
    t = MiniLogTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a")], "k INT, v STRING"))
    state = t.read_with_row_ids()
    t.append(spark.createDataFrame([(2, "b")], "k INT, v STRING"))
    feed = t.changes_with_ids(t.version - 1, t.version)
    with pytest.raises(ValueError, match="stray|lacks"):
        apply_changes(state, feed.withColumn("extra", F.lit(1)))
    with pytest.raises(ValueError, match="lacks state columns"):
        apply_changes(state, feed.drop("v"))


# ------------------------- bloom backfill leaves satisfied columns alone


def test_bloom_backfill_preserves_existing_blooms(spark, tmp_path):
    """ADVICE r10 low, exact scenario: F1 already carries a
    SIDECAR-sized bloom on u (UUID-named sidecar parquet) and is
    pending only on k; the backfill scan computes the UNION of pending
    columns across todo files, so F1's u bloom comes back recomputed —
    the commit must NOT merge it (a fresh sidecar per call orphans the
    old one). Pin: the sidecar reference survives byte-identical, no
    orphan accumulates, and the call converges."""
    t = MiniLogTable(spark, str(tmp_path / "bb"), stats_cols=("k",))
    # F1: > BLOOM_SIDECAR_NDV distinct u values -> sidecar-sized bloom
    t.append(
        spark.range(0, 3000).select(
            F.col("id").cast("int").alias("k"),
            F.concat(F.lit("u"), F.col("id")).alias("u"),
        ),
        target_files=1,
    )
    assert t.build_bloom_index(cols=("u",))["indexed"] == 1
    snap1 = t.snapshot()
    (f1,) = snap1.files
    u_before = f1.stats["u"]["bloom"]
    assert "sidecar" in u_before  # the scenario needs the UUID path
    # F2 arrives; the next backfill asks for (k, u): F1 pends only on
    # k, F2 on both — scan_cols is their union
    t.append(
        spark.createDataFrame([(9000, "zz")], "k INT, u STRING"),
        target_files=1,
    )
    assert t.build_bloom_index(cols=("k", "u"))["indexed"] == 2
    after = {f.file: f.stats for f in t.snapshot().files}
    assert after[f1.file]["u"]["bloom"] == u_before, (
        "F1's satisfied u bloom was re-minted by a backfill where u "
        "was pending only for another file"
    )
    assert "bloom" in after[f1.file]["k"]  # the pending column landed
    # converged: nothing further to do
    assert t.build_bloom_index(cols=("k", "u"))["indexed"] == 0


# --------------------- DV x incremental clustering lifecycle (task 7)


def test_cluster_pass_purges_deletion_vectors(spark, tmp_path):
    """An incremental clustering pass over DV-masked files must behave
    like OPTIMIZE: the rewritten files carry NO deletion vectors (the
    masked rows are physically gone), the masked rows stay gone, row
    ids survive, and the clustered files carry the current epoch."""
    t = MiniLogTable(spark, str(tmp_path / "cl"), stats_cols=("k",))
    t.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(8)], "k INT, v STRING"
        )
    )
    t.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(8, 16)], "k INT, v STRING"
        )
    )
    ids_before = {
        r["k"]: r["_row_id"] for r in t.read_with_row_ids().collect()
    }
    t.delete_where_dv("k", 3, 3)
    t.delete_where_dv("k", 12, 12)
    assert any(f.dv for f in t.snapshot().files)
    t.set_cluster_keys(("k",))
    t.optimize_cluster()
    snap = t.snapshot()
    epoch = snap.cluster_epoch
    for f in snap.files:
        assert f.dv is None, "clustering left a deletion vector behind"
        assert f.cluster_epoch == epoch
    rows = {r["k"]: r["_row_id"] for r in t.read_with_row_ids().collect()}
    assert 3 not in rows and 12 not in rows
    assert rows == {
        k: i for k, i in ids_before.items() if k not in (3, 12)
    }


# ------------------- update_where row-id linkage (docstring contract)


def test_update_where_links_updates_in_change_feed(spark, tmp_path):
    """update_where claims rewritten rows keep their stable ids, so
    the change feed emits pre/post images UNDER ONE id for exactly the
    fired rows — pin it."""
    t = MiniLogTable(spark, str(tmp_path / "uw"), stats_cols=("k",))
    t.append(
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "k INT, n INT"
        )
    )
    ids0 = {r["k"]: r["_row_id"] for r in t.read_with_row_ids().collect()}
    v0 = t.version
    res = t.update_where({"n": "n + 5"}, "k >= 2")
    assert res["updated"] == 2
    feed = t.changes_with_ids(v0, t.version).collect()
    pre = {r["k"]: r["_row_id"] for r in feed
           if r["_change_type"] in ("delete", "update_preimage")}
    post = {(r["k"], r["n"]): r["_row_id"] for r in feed
            if r["_change_type"] in ("insert", "update_postimage")}
    # both fired rows linked pre->post under their original ids
    assert pre == {2: ids0[2], 3: ids0[3]}
    assert post == {(2, 25): ids0[2], (3, 35): ids0[3]}
    # the unfired row kept its id through the rewrite
    assert {
        r["k"]: r["_row_id"] for r in t.read_with_row_ids().collect()
    } == ids0

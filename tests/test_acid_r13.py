"""Round-13 regressions: merge-on-read UPDATE via deletion vectors
(VERDICT r12 task 2) plus the ADVICE r12 atomic-ALTER fixes' ACID-level
contracts.

The DV-update shape is the public Delta design: ONE commit masks the
matched rows' (file, position) pairs in a sidecar and appends the
replacement rows; row ids ride into the replacements so the change feed
links each mask+append as a linked update pre/post pair."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bootic_stats_aggregates_spark.acid import (
    ConstraintViolation,
    MiniLogTable,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _df(spark, rows, schema="k INT, v STRING"):
    return spark.createDataFrame(rows, schema)


@pytest.fixture
def tbl(spark, tmp_path):
    return MiniLogTable(spark, str(tmp_path / "t"), stats_cols=("k",))


# ------------------------------------------------- update_predicate_dv


def test_update_dv_masks_and_appends_zero_rewrite(spark, tbl):
    tbl.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))  # v0
    files_v0 = {f.file for f in tbl.snapshot().files}
    res = tbl.update_predicate_dv({"v": "upper(v)"}, "k = 2")
    assert res["rewritten"] == 0 and res["dv_files"] == 1
    assert res["updated"] == 1
    snap = tbl.snapshot()
    # the original file survives (masked), plus >=1 replacement file
    assert files_v0 <= {f.file for f in snap.files}
    assert any(f.dv for f in snap.files if f.file in files_v0)
    assert _rows(tbl.read()) == [(1, "a"), (2, "B"), (3, "c")]
    # time travel to v0 reads the file unmasked, pre-update
    assert _rows(tbl.read(version=0)) == [(1, "a"), (2, "b"), (3, "c")]


def test_update_dv_cdf_links_pre_post_by_row_id(spark, tbl):
    tbl.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    ids0 = {
        r["k"]: r["_row_id"] for r in tbl.read_with_row_ids().collect()
    }
    tbl.update_predicate_dv({"v": "v || 'x'"}, "k >= 2")
    ch = tbl.changes_with_ids(0, 1)
    by_type = {
        r["_change_type"]: r["cnt"]
        for r in ch.groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    # EXCLUSIVELY linked update pairs — no anonymous insert/delete
    assert by_type == {"update_preimage": 2, "update_postimage": 2}
    post = {
        r["k"]: (r["v"], r["_row_id"])
        for r in ch.filter(
            F.col("_change_type") == "update_postimage"
        ).collect()
    }
    assert post == {2: ("bx", ids0[2]), 3: ("cx", ids0[3])}
    # ids survive into the live read too
    assert {
        r["k"]: r["_row_id"] for r in tbl.read_with_row_ids().collect()
    } == ids0


def test_update_dv_set_evaluates_pre_update_row(spark, tbl):
    # SET a = b, b = a must SWAP (standard SQL), not chain
    tbl.append(
        spark.createDataFrame([(1, 10, 20)], "k INT, a INT, b INT")
    )
    tbl.update_predicate_dv({"a": "b", "b": "a"}, "k = 1")
    assert _rows(tbl.read()) == [(1, 20, 10)]


def test_update_dv_null_and_false_predicate_rows_survive(spark, tbl):
    tbl.append(_df(spark, [(1, "a"), (None, "n"), (3, "c")]))
    res = tbl.update_predicate_dv({"v": "'hit'"}, "k % 2 = 1")
    assert res["updated"] == 2  # k=1 and k=3; NULL k never matches
    got = {(r["k"], r["v"]) for r in tbl.read().collect()}
    assert got == {(1, "hit"), (3, "hit"), (None, "n")}


def test_update_dv_no_match_is_noop_commit_free(spark, tbl):
    tbl.append(_df(spark, [(1, "a")]))
    v0 = tbl.version
    res = tbl.update_predicate_dv({"v": "'x'"}, "k = 99")
    assert res == {"version": v0, "dv_files": 0, "updated": 0}
    assert tbl.version == v0


def test_update_dv_constraint_violation_aborts_uncommitted(spark, tbl):
    tbl.append(_df(spark, [(1, "a"), (5, "b")]))
    tbl.add_check_constraint("k_small", "k < 100")
    v0 = tbl.version
    with pytest.raises(ConstraintViolation):
        tbl.update_predicate_dv({"k": "k + 1000"}, "k = 5")
    assert tbl.version == v0
    assert _rows(tbl.read()) == [(1, "a"), (5, "b")]
    # and no vector appeared on any file
    assert all(f.dv is None for f in tbl.snapshot().files)


def test_update_dv_generated_columns(spark, tmp_path):
    t = MiniLogTable(spark, str(tmp_path / "g"), stats_cols=("k",))
    t.set_generated_column("k2", "k * 2")
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    with pytest.raises(ValueError, match="GENERATED"):
        t.update_predicate_dv({"k2": "1"}, "k = 1")
    t.update_predicate_dv({"k": "k + 10"}, "k = 2")
    out = {r["k"]: r["k2"] for r in t.read().collect()}
    assert out == {1: 2, 12: 24}  # recomputed from the updated row


def test_update_dv_composes_with_prior_dv_delete(spark, tbl):
    tbl.append(_df(spark, [(1, "a"), (2, "b"), (3, "c"), (4, "d")]))
    tbl.delete_where_dv("k", 1, 1)  # prior vector on the file
    tbl.update_predicate_dv({"v": "'u'"}, "k = 3")
    # the update's sidecar carried the delete's position forward
    assert _rows(tbl.read()) == [(2, "b"), (3, "u"), (4, "d")]
    assert _rows(tbl.read(version=1)) == [(2, "b"), (3, "c"), (4, "d")]
    # OPTIMIZE purges vectors; nothing resurrects
    tbl.optimize(target_rows=100)
    assert all(f.dv is None for f in tbl.snapshot().files)
    assert _rows(tbl.read()) == [(2, "b"), (3, "u"), (4, "d")]


def test_update_dv_partitioned_moves_row_across_partitions(
    spark, tmp_path
):
    t = MiniLogTable(
        spark,
        str(tmp_path / "p"),
        stats_cols=("k",),
        partition_by=("d",),
    )
    t.append(
        spark.createDataFrame(
            [(1, 10, "a"), (2, 10, "b"), (3, 20, "c")],
            "k INT, d INT, v STRING",
        )
    )
    # updating the PARTITION column: the mask hides the old-partition
    # row, the replacement lands under the new partition directory
    res = t.update_predicate_dv({"d": "30"}, "k = 2")
    assert res["rewritten"] == 0 and res["updated"] == 1
    assert _rows(t.read().select("k", "d")) == [(1, 10), (2, 30), (3, 20)]
    parts = {
        tuple(sorted((f.partition or {}).items()))
        for f in t.snapshot().files
    }
    assert any(dict(p).get("d") == 30 for p in parts)


def test_update_dv_unknown_column_raises(spark, tbl):
    tbl.append(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="no such column"):
        tbl.update_predicate_dv({"zz": "1"}, "k = 1")


# ------------------------------------------------- SQL surface routing


def test_run_sql_update_strategy_dv(spark, tmp_path):
    from bootic_stats_aggregates_spark.sql import create_table, run_sql

    t = create_table(
        spark, "updv", str(tmp_path / "updv"), stats_cols=("k",)
    )
    run_sql(
        spark,
        "INSERT INTO updv SELECT col1 AS k, col2 AS n "
        "FROM VALUES (1, 10), (2, 20), (3, 30)",
    )
    res = run_sql(
        spark,
        "UPDATE updv SET n = n + 1 WHERE k = 2",
        update_strategy="dv",
    )
    assert res["operation"] == "update"
    assert res["rewritten"] == 0 and res["dv_files"] == 1
    assert _rows(t.read()) == [(1, 10), (2, 21), (3, 30)]


def test_run_sql_update_strategy_invalid(spark, tmp_path):
    from bootic_stats_aggregates_spark.sql import create_table, run_sql

    create_table(spark, "updv_bad", str(tmp_path / "b"))
    run_sql(spark, "INSERT INTO updv_bad (k) VALUES (1)")
    with pytest.raises(ValueError, match="update_strategy"):
        run_sql(
            spark,
            "UPDATE updv_bad SET k = 2",
            update_strategy="zigzag",
        )


def test_update_dv_equals_copy_on_write(spark, tmp_path):
    """PROPERTY: merge-on-read UPDATE and copy-on-write UPDATE are the
    same logical operation — for identical tables and statements, the
    post-update reads are row-identical and the row-id assignment is
    identical (both paths preserve ids), across predicates that hit
    none/some/all rows, NULL keys, and multi-column SETs."""
    import random

    rng = random.Random(13)
    cases = [
        ({"v": "upper(v)"}, "k % 3 = 0"),
        ({"n": "n * 2", "v": "concat(v, '!')"}, "n >= 20"),
        ({"v": "'all'"}, None),
        ({"n": "-n"}, "k = 999"),  # no match
        ({"v": "coalesce(v, 'was-null')"}, "k IS NULL OR k < 2"),
    ]
    for i, (assignments, pred) in enumerate(cases):
        rows = [
            (
                rng.choice([None, 0, 1, 2, 3, 5, 8]),
                rng.choice([None, "a", "b", "c"]),
                rng.randint(0, 50),
            )
            for _ in range(rng.randint(1, 25))
        ]
        a = MiniLogTable(
            spark, str(tmp_path / f"cow{i}"), stats_cols=("k",)
        )
        b = MiniLogTable(
            spark, str(tmp_path / f"mor{i}"), stats_cols=("k",)
        )
        df = spark.createDataFrame(rows, "k INT, v STRING, n INT")
        a.append(df, target_files=2)
        b.append(df, target_files=2)
        ra = a.update_where(assignments, pred)
        rb = b.update_predicate_dv(assignments, pred)
        assert ra["updated"] == rb["updated"], (i, ra, rb)
        assert rb.get("rewritten", 0) == 0
        ka = {
            (r["k"], r["v"], r["n"], r["_row_id"])
            for r in a.read_with_row_ids().collect()
        }
        kb = {
            (r["k"], r["v"], r["n"], r["_row_id"])
            for r in b.read_with_row_ids().collect()
        }
        assert ka == kb, (i, ka ^ kb)

"""Property tests (SURVEY.md §5.2 item 4): cross-operator invariants."""

from __future__ import annotations

import os
import tempfile

import pytest

from bootic_stats_aggregates_spark.registry import all_queries

from conftest import SF_DIR

QUERIES = all_queries()


def test_lsh_matches_bruteforce(spark):
    """MinHash-LSH candidate generation + verify must find exactly the
    brute-force jaccard pairs at this SF (recall check for the band config)."""
    lsh = {
        (r.doc_id_a, r.doc_id_b, r.jaccard)
        for r in QUERIES["llm_near_dedup"](spark, SF_DIR).collect()
    }
    brute = {
        (r.doc_id_a, r.doc_id_b, r.jaccard)
        for r in QUERIES["llm_ngram_jaccard"](spark, SF_DIR).collect()
    }
    assert lsh == brute, (
        f"LSH missed {len(brute - lsh)} pairs, invented {len(lsh - brute)}"
    )
    assert len(brute) > 0, "expected some near-dup pairs at sf0.01"


def test_rollup_consistency(spark):
    """Σ(day-level counts) == month-level count == grand total."""
    rows = QUERIES["agg_multi_rollup"](spark, SF_DIR).collect()
    total = next(r.n_events for r in rows if r.y is None)
    month_sum = sum(r.n_events for r in rows if r.m is not None and r.d is None)
    day_sum = sum(r.n_events for r in rows if r.d is not None)
    assert total == month_sum == day_sum


def test_exact_dedup_idempotent(spark):
    """dedup(dedup(x)) == dedup(x): output already has unique texts."""
    out = QUERIES["llm_exact_dedup"](spark, SF_DIR)
    stats = QUERIES["llm_dedup_stats"](spark, SF_DIR).collect()[0]
    assert out.count() == stats.n_distinct_texts


def test_topk_prefix_property(spark):
    """top-5-per-group must be a prefix of the counts ordering: every rank
    1..5 present per group exactly once."""
    rows = QUERIES["rank_topk_per_group"](spark, SF_DIR).collect()
    by_group: dict[str, list[int]] = {}
    for r in rows:
        by_group.setdefault(r.event_type, []).append(r.rk)
    for g, rks in by_group.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), g


def test_ann_lsh_prunes_and_recalls(spark):
    """The LSH ANN path must (a) score only a small fraction of the pair
    space and (b) beat chance recall vs brute force. Data + planes are
    deterministic, so the measured values are stable (0.07 candidate
    fraction, 0.2 recall at sf0.01); thresholds leave headroom."""
    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.llm.similarity import N_QUERIES, _bucketed

    brute = {(r.q_vec_id, r.vec_id) for r in QUERIES["llm_cosine_topk"](spark, SF_DIR).collect()}
    ann = {(r.q_vec_id, r.vec_id) for r in QUERIES["llm_ann_lsh"](spark, SF_DIR).collect()}
    recall = len(brute & ann) / len(brute)

    b = _bucketed(spark, SF_DIR)
    qb = b.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q"), "tbl", "bucket"
    )
    n_cand = (
        qb.join(b, ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("q"))
        .select("q", "vec_id")
        .distinct()
        .count()
    )
    n_corpus = b.select("vec_id").distinct().count()
    frac = n_cand / (N_QUERIES * (n_corpus - 1))
    assert frac <= 0.2, f"LSH pruning too weak: scored {frac:.0%} of pairs"
    assert recall >= 1.5 * frac, (
        f"recall {recall:.2f} not better than chance ({frac:.2f})"
    )


def test_approx_distinct_within_tolerance(spark):
    """approx_count_distinct (HLL, rsd=0.02) must land within the envelope of
    the exact per-bucket distinct counts — the sketch is the only distinct
    operator allowed on the 100 TB streaming path, so its error envelope is
    part of the contract. The registered query folds this into the
    within_10pct boolean; here we check the raw estimates directly."""
    from bootic_stats_aggregates_spark.operators.aggregates import approx_distinct_raw

    for r in approx_distinct_raw(spark, SF_DIR).collect():
        assert abs(r.approx_users - r.exact_users) <= max(3, 0.1 * r.exact_users), (
            r.event_type,
            r.approx_users,
            r.exact_users,
        )
    assert all(
        r.within_10pct
        for r in QUERIES["agg_approx_distinct"](spark, SF_DIR).collect()
    )


def test_approx_percentile_within_tolerance(spark):
    """approx_percentile(accuracy=1e4) must land within 1% of the exact
    interpolated percentile per group (raw estimates; the registered query
    folds the same claim into booleans)."""
    from bootic_stats_aggregates_spark.operators.aggregates import (
        approx_percentile_raw,
    )

    for r in approx_percentile_raw(spark, SF_DIR).collect():
        assert abs(r.p50 - r.exact_p50) <= 0.01 * max(abs(r.exact_p50), 1)
        assert abs(r.p90 - r.exact_p90) <= 0.01 * max(abs(r.exact_p90), 1)
    exact = {
        r.event_type: (r.p50, r.p90)
        for r in QUERIES["agg_percentile"](spark, SF_DIR).collect()
    }
    approx = {
        r.event_type: (r.exact_p50, r.exact_p90)
        for r in QUERIES["agg_approx_percentile"](spark, SF_DIR).collect()
    }
    assert approx.keys() == exact.keys()


def test_simhash_banding_complete_for_hamming_k(spark):
    """Pigeonhole guarantee: the 4x16-bit band join must find EXACTLY the
    pairs a brute-force all-pairs hamming scan finds at h <= 3."""
    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.llm.dedup import HAMMING_K, simhash_bands

    banded = {
        (r.doc_id_a, r.doc_id_b, r.hamming)
        for r in QUERIES["llm_simhash_pairs"](spark, SF_DIR).collect()
    }
    sh = simhash_bands(spark, SF_DIR)
    a = sh.select(
        F.col("doc_id").alias("da"), *[F.col(f"band_{j}").alias(f"a{j}") for j in range(4)]
    )
    b = sh.select(
        F.col("doc_id").alias("db"), *[F.col(f"band_{j}").alias(f"b{j}") for j in range(4)]
    )
    h = sum(F.bit_count(F.col(f"a{j}").bitwiseXOR(F.col(f"b{j}"))) for j in range(4))
    brute = {
        (r.da, r.db, r.h)
        for r in a.join(b, F.col("da") < F.col("db"))
        .select("da", "db", h.cast("int").alias("h"))
        .filter(F.col("h") <= HAMMING_K)
        .collect()
    }
    assert banded == brute
    assert len(brute) > 0, "expected some h<=3 simhash pairs at sf0.01"


def test_embed_neardup_lsh_subset_of_brute(spark):
    """The bucketed corpus x corpus near-dup twin must return a SUBSET of
    the brute-force pair scan (candidates only shrink; the verify is the
    same exact cosine), with non-zero recall even on this borderline-only
    fixture corpus."""
    lsh = {
        (r.vec_id_a, r.vec_id_b, r.cos_sim)
        for r in QUERIES["llm_embed_neardup_lsh"](spark, SF_DIR).collect()
    }
    brute = {
        (r.vec_id_a, r.vec_id_b, r.cos_sim)
        for r in QUERIES["llm_embed_neardup"](spark, SF_DIR).collect()
    }
    assert lsh <= brute
    assert len(lsh) > 0, "expected some LSH-recalled near-dup pairs"


def test_simhash_xxhash_family_same_shape(spark):
    """The production (xxhash64) simhash family must produce the same
    schema and valid 16-bit band ranges as the oracle (polynomial) family —
    only the hash differs, never the banding math."""
    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.llm.dedup import simhash_bands

    fast = simhash_bands(spark, SF_DIR, family="xxhash64")
    slow = simhash_bands(spark, SF_DIR, family="poly")
    assert fast.columns == slow.columns
    assert fast.count() == slow.count()
    row = fast.agg(
        *[F.max(f"band_{j}").alias(f"mx{j}") for j in range(4)],
        *[F.min(f"band_{j}").alias(f"mn{j}") for j in range(4)],
    ).collect()[0]
    assert all(0 <= row[f"mn{j}"] and row[f"mx{j}"] <= 0xFFFF for j in range(4))


def test_compaction_hits_file_target(spark):
    """snk_compact must actually shrink the file count: 64 fragment files in,
    COMPACT_TARGET_FILES parquet data files out, zero row loss."""
    import glob
    import os

    from bootic_stats_aggregates_spark.sinks.queries import (
        COMPACT_TARGET_FILES,
        snk_compact,
    )

    total = sum(
        r.n_events for r in QUERIES["snk_compact"](spark, SF_DIR).collect()
    )
    frag, compacted = snk_compact.last_dirs
    n_frag = len(glob.glob(os.path.join(frag, "*.parquet")))
    n_comp = len(glob.glob(os.path.join(compacted, "*.parquet")))
    assert n_frag > COMPACT_TARGET_FILES * 4
    assert n_comp == COMPACT_TARGET_FILES
    from bootic_stats_aggregates_spark.io import table

    assert total == table(spark, SF_DIR, "events").count()


def test_contamination_nontrivial_and_sound(spark):
    """The decontamination check must flag a non-empty set at sf0.01 (a
    0-row result would make the oracle pass vacuously), and never flag a
    benchmark doc itself."""
    from bootic_stats_aggregates_spark.llm.text import BENCH_MOD

    rows = QUERIES["llm_contamination"](spark, SF_DIR).collect()
    assert len(rows) > 0
    assert all(r.doc_id % BENCH_MOD != 0 and r.n_shared >= 1 for r in rows)


def test_dedup_clusters_bounds_pinned_memory(spark):
    """Label-propagation must unpersist superseded frames EAGERLY: right
    after a build returns, the only pinned RDD that build may leave behind
    is the final label frame backing the returned DataFrame (ADVICE r1 —
    the r1 version pinned one frame per iteration per run, unbounded in a
    long session). Finals of *earlier* builds may linger until the
    ContextCleaner runs (JVM-GC-timed, not assertable deterministically),
    hence the <= i+1 bound rather than a settled-count comparison."""
    from bootic_stats_aggregates_spark.llm.dedup import llm_dedup_clusters

    build = llm_dedup_clusters.__wrapped__  # bypass the registry plan memo
    # Earlier tests may have left their own cleaner-pending RDDs: bound the
    # GROWTH over this test's baseline, not the absolute count. Pre-existing
    # entries can only shrink meanwhile, which loosens, never tightens.
    baseline = spark.sparkContext._jsc.getPersistentRDDs().size()
    for i in range(3):
        build(spark, SF_DIR).count()
        pinned = spark.sparkContext._jsc.getPersistentRDDs().size()
        assert pinned - baseline <= i + 1, (
            f"build {i} grew persistent RDDs by {pinned - baseline} "
            f"(> {i + 1}): superseded label frames are not being "
            "unpersisted eagerly"
        )


def test_partition_overwrite_touches_only_target(spark):
    """Dynamic partition overwrite must physically rewrite ONLY the
    partitions present in the incoming frame: every other partition's files
    (path + size + mtime) are bit-identical afterwards."""
    import os

    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.io import table

    ev = table(spark, SF_DIR, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    import tempfile
    import uuid

    path = f"{tempfile.gettempdir()}/bootic_dynpart_test_{uuid.uuid4().hex[:8]}"
    ev.write.partitionBy("event_date").mode("overwrite").parquet(path)

    def snapshot():
        out = {}
        for root, _, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    st = os.stat(p)
                    out[p] = (st.st_size, st.st_mtime_ns)
        return out

    before = snapshot()
    first_day = ev.agg(F.min("event_date").alias("event_date"))
    target = [r.event_date for r in first_day.collect()][0]
    (
        ev.join(first_day, "event_date")
        .filter(F.col("event_type") == "purchase")
        .select(ev.columns)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_date")
        .parquet(path)
    )
    after = snapshot()
    tag = f"event_date={target}"
    untouched_before = {p: v for p, v in before.items() if tag not in p}
    untouched_after = {p: v for p, v in after.items() if tag not in p}
    assert untouched_before == untouched_after, "non-target partitions changed"
    assert {p for p in before if tag in p}.isdisjoint(after), (
        "target partition files were not replaced"
    )


def test_cc_star_adversarial_chain(spark):
    """Star contraction must label a long PATH graph — the adversarial case
    whose diameter makes min-label propagation linear-round — within its
    logarithmic round budget, and must agree with component minima on a mix
    of path + cliques + isolated nodes."""
    from bootic_stats_aggregates_spark.llm.dedup import cc_star_labels

    # path 100..159 (diameter 59 >> MAX_STAR_ROUNDS), two cliques, isolates
    path = [(i, i + 1) for i in range(100, 159)]
    clique1 = [(a, b) for a in range(7, 10) for b in range(a + 1, 10)]
    clique2 = [(203, 201), (202, 203), (201, 202)]  # shuffled orientation
    edges = spark.createDataFrame(
        path + clique1 + clique2, "doc_id_a long, doc_id_b long"
    )
    nodes = sorted(
        {n for e in path + clique1 + clique2 for n in e} | {999, 1000}
    )
    docs = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    got = {
        r.doc_id: r.cluster_id
        for r in cc_star_labels(docs, edges).collect()
    }
    expected = {n: 100 for n in range(100, 160)}
    expected.update({n: 7 for n in range(7, 10)})
    expected.update({n: 201 for n in (201, 202, 203)})
    expected.update({999: 999, 1000: 1000})
    assert got == expected


def test_cc_star_agrees_with_minlabel(spark):
    """Both registered CC implementations must produce identical cluster
    assignments on the real near-dup pair graph."""
    star = {
        (r.doc_id, r.cluster_id)
        for r in QUERIES["llm_cc_star"](spark, SF_DIR).collect()
    }
    minlabel = {
        (r.doc_id, r.cluster_id)
        for r in QUERIES["llm_dedup_clusters"](spark, SF_DIR).collect()
    }
    assert star == minlabel


def test_shingles_empty_for_short_docs(spark):
    """Docs with <3 tokens must yield an EMPTY shingle set (not a partial
    shingle) so Spark and the DuckDB oracle agree for all inputs (ADVICE r1)."""
    from bootic_stats_aggregates_spark.llm.dedup import _shingles

    df = spark.createDataFrame(
        [(1, "a b"), (2, "one two three four"), (3, ""), (4, "x")],
        "id int, text string",
    )
    got = {r.id: r.s for r in df.select("id", _shingles().alias("s")).collect()}
    assert got[1] == [] and got[3] == [] and got[4] == []
    assert got[2] == ["one two three", "two three four"]


def test_multimodal_resize_invariants(spark):
    """Every resized payload is exactly width*height bytes; originals'
    sizes are preserved in metadata; one output row per input doc; the
    registered (payload-free) frame agrees with the checksum of the blob."""
    from bootic_stats_aggregates_spark.llm.multimodal import resize_blobs

    rows = resize_blobs(spark, SF_DIR).collect()
    n_docs = QUERIES["llm_dedup_stats"](spark, SF_DIR).collect()[0].n_docs
    assert len(rows) == n_docs
    for r in rows[:200]:
        assert len(r.payload) == r.width * r.height
        assert r.orig_bytes > 0
        assert sum(r.payload) % 65521 == r.checksum
    assert QUERIES["llm_multimodal_resize"](spark, SF_DIR).count() == n_docs


def test_ivf_ann_recall_and_candidates(spark):
    """IVF probing must (a) produce a subset of valid neighbors (every
    returned pair's cosine equals the brute-force cosine for that pair) and
    (b) keep recall@5 at the deterministic fixture level (synthetic
    unclustered embeddings give weak-but-stable recall; real corpora with
    k-means centroids do far better — the operator contract is the pruning
    shape, pinned exact by the oracle)."""
    brute = {
        (r.q_vec_id, r.vec_id): r.cos_sim
        for r in QUERIES["llm_cosine_topk"](spark, SF_DIR).collect()
    }
    ivf = {
        (r.q_vec_id, r.vec_id): r.cos_sim
        for r in QUERIES["llm_ann_ivf"](spark, SF_DIR).collect()
    }
    for pair, cos in ivf.items():
        if pair in brute:
            assert brute[pair] == cos, f"cosine mismatch for {pair}"
    recall = len(set(brute) & set(ivf)) / len(brute)
    assert recall >= 0.25, f"IVF recall@5 collapsed: {recall}"


def test_kafka_transport_gated_and_documented(spark):
    """The Kafka transport (VERDICT r2 item 6) is config-gated: without
    SPARK_GRAFT_KAFKA_BOOTSTRAP it refuses with an actionable message, and
    the files default is untouched by the flag machinery."""
    import os

    import pytest

    from bootic_stats_aggregates_spark.streaming.runner import (
        kafka_stream_table,
        stream_table,
    )

    assert os.environ.get("SPARK_GRAFT_STREAM_TRANSPORT", "files") != "kafka"
    with pytest.raises(RuntimeError, match="SPARK_GRAFT_KAFKA_BOOTSTRAP"):
        kafka_stream_table(spark, SF_DIR, "events")
    # default transport still the deterministic file replay
    assert stream_table(spark, SF_DIR, "events").isStreaming


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP"),
    reason=(
        "requires a Kafka broker + spark-sql-kafka connector: export "
        "SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port (optionally "
        "SPARK_GRAFT_KAFKA_TOPIC=bootic.events, SPARK_GRAFT_KAFKA_OFFSETS, "
        "SPARK_GRAFT_KAFKA_MAX_OFFSETS) and publish the events fixture as "
        "one JSON object per record (ts in epoch nanos)"
    ),
)
def test_kafka_transport_end_to_end(spark):  # pragma: no cover - needs broker
    """With a broker available, the Kafka source must deliver exactly the
    fixture rows through the same schema/ns->us path as the file replay."""
    os.environ["SPARK_GRAFT_STREAM_TRANSPORT"] = "kafka"
    try:
        from bootic_stats_aggregates_spark.streaming.runner import (
            run_to_memory,
            stream_table,
        )

        ev = stream_table(spark, SF_DIR, "events")
        got = run_to_memory(
            ev.select("event_id", "event_type", "user_id"), mode="append"
        )
        expected = QUERIES["src_event_stream"](spark, SF_DIR).count()
        assert got.count() == expected
    finally:
        os.environ.pop("SPARK_GRAFT_STREAM_TRANSPORT", None)


def test_decode_image_feature_probe():
    """decode_image is feature-probed (VERDICT r2 item 7): a real PIL decode
    when the lib exists, NotImplementedError otherwise — and the dispatcher
    routes text/plain to byte stats in BOTH environments, so the registered
    oracle never depends on the probe."""
    import pytest

    from bootic_stats_aggregates_spark.llm import multimodal as mm

    # text/plain always takes the byte-stat path, decoder or not.
    assert mm._featurize(b"hello", "text/plain") == mm.fake_features(b"hello")

    if not mm.HAS_IMAGE_DECODE:
        # JPEG (no native codec) stays PIL-gated; PNG decodes natively
        # since r6, so a bare magic with no chunks is a loud ValueError.
        with pytest.raises(NotImplementedError):
            mm.decode_image(b"\xff\xd8\xff\xe0JFIF-ish")
        with pytest.raises(ValueError):
            mm.decode_image(b"\x89PNG\r\n\x1a\n")
        png = mm.encode_png(bytes(range(18)), 3, 2)
        w, h, bands, _mean = mm._featurize(png, "image/png")
        assert (w, h, bands) == (3.0, 2.0, 3.0)
        # image/* without a decodable container falls back to byte stats.
        assert mm._featurize(b"\x01\x02", "image/png") == mm.fake_features(b"\x01\x02")
    else:  # pragma: no cover - container has no PIL today
        from PIL import Image

        buf = __import__("io").BytesIO()
        Image.new("RGB", (3, 2), color=(10, 20, 30)).save(buf, format="PNG")
        w, h, bands, mean = mm._featurize(buf.getvalue(), "image/png")
        assert (w, h, bands) == (3.0, 2.0, 3.0)
        assert mean == pytest.approx(20.0)


def test_partitioned_layout_evicts_stale_dir(spark):
    """A half-written layout dir (no _SUCCESS — crashed legacy direct write)
    must be evicted and replaced, not served (ADVICE r2, layout.py rename
    branch)."""
    import os
    import shutil

    from bootic_stats_aggregates_spark import layout

    out = os.path.join(
        layout._LAYOUT_ROOT,
        layout._sf_tag(SF_DIR),
        f"events_by_date-{layout._fingerprint(SF_DIR, 'events')}",
    )
    backup = None
    if os.path.exists(out):  # preserve a healthy cached layout for other tests
        backup = out + ".bak"
        shutil.rmtree(backup, ignore_errors=True)
        os.rename(out, backup)
    try:
        os.makedirs(out, exist_ok=True)  # stale squatter: exists, no _SUCCESS
        with open(os.path.join(out, "part-garbage.parquet"), "w") as f:
            f.write("not parquet")
        df = layout.partitioned_events(spark, SF_DIR)
        assert os.path.exists(os.path.join(out, "_SUCCESS"))
        assert not os.path.exists(os.path.join(out, "part-garbage.parquet"))
        assert df.count() > 0
    finally:
        if backup is not None:
            shutil.rmtree(out, ignore_errors=True)
            os.rename(backup, out)


def test_corpus_shuffle_is_permutation(spark):
    """llm_corpus_shuffle must emit ranks 1..N exactly once (a true
    permutation) and shard sizes of exactly SHUFFLE_SHARD_DOCS except the
    tail shard — the contract loaders rely on for resumable epochs."""
    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.llm.sampling import SHUFFLE_SHARD_DOCS

    df = all_queries()["llm_corpus_shuffle"](spark, SF_DIR)
    n = df.count()
    stats = df.agg(
        F.min("shuffle_rank").alias("lo"),
        F.max("shuffle_rank").alias("hi"),
        F.countDistinct("shuffle_rank").alias("u"),
    ).collect()[0]
    assert (stats.lo, stats.hi, stats.u) == (1, n, n)
    shards = {
        r.shard_id: r.c
        for r in df.groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    last = max(shards)
    # every shard is full except (possibly) the tail shard
    assert all(c == SHUFFLE_SHARD_DOCS for s, c in shards.items() if s != last)
    assert 0 < shards[last] <= SHUFFLE_SHARD_DOCS


def test_merge_upsert_last_writer_wins(spark):
    """snk_merge_upsert: every key present in the update batch must carry
    the update's value (from_update = true there), and re-merging the
    same updates is a no-op on values (idempotent upsert)."""
    from pyspark.sql import functions as F

    df = all_queries()["snk_merge_upsert"](spark, SF_DIR)
    # days >= 20 exist in the update batch: all such keys must be flagged
    upd = df.filter(F.dayofmonth("day") >= 20)
    assert upd.count() > 0
    assert upd.filter(~F.col("from_update")).count() == 0
    # days < 20 can only come from base
    assert df.filter((F.dayofmonth("day") < 20) & F.col("from_update")).count() == 0


def test_mix_weights_hit_targets(spark):
    """llm_mix_weights realized keep-ratios must land near the configured
    per-language targets (pseudo-uniform hash ⇒ binomial tolerance)."""
    from bootic_stats_aggregates_spark.llm.sampling import (
        MIX_RATES_PCT10,
    )

    rows = {r.lang: r for r in all_queries()["llm_mix_weights"](spark, SF_DIR).collect()}
    for lang, rate in MIX_RATES_PCT10.items():
        r = rows[lang]
        target = rate / 1000.0
        # 4 sigma binomial envelope
        import math

        tol = 4 * math.sqrt(target * (1 - target) / r.n_docs) if 0 < target < 1 else 0
        assert abs(r.kept_ratio - target) <= tol + 1e-9, (lang, r.kept_ratio, target)


def test_incr_dedup_bounded_by_batch_dedup(spark):
    """stream_incr_dedup's per-lang new-doc counts can never exceed the
    lang's total arriving distinct texts, and must be zero for any text
    fully contained in the corpus subset (sanity envelope)."""
    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.io import table

    got = {r.lang: r.n_new for r in all_queries()["stream_incr_dedup"](spark, SF_DIR).collect()}
    arriving = (
        table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") % 4 != 0)
        .groupBy("lang")
        .agg(F.countDistinct(F.md5("text")).alias("u"))
    )
    for r in arriving.collect():
        assert 0 <= got.get(r.lang, 0) <= r.u


def test_transform_with_state_probe(spark):
    """Spark 4's transformWithStateInPandas (the successor stateful API:
    typed state variables + timers) needs a working google.protobuf in
    the Python worker; this container ships a broken stub ('cannot import
    name descriptor'), so stream_stateful_v2 falls back to its
    applyInPandasWithState twin (fully driver-verified). Where the
    dependency works, this test runs the REAL v2 path — the
    StatefulProcessor with typed value + list state over RocksDB — and
    pins it against the fallback's result."""
    pytest.importorskip("google.protobuf.descriptor")
    from bootic_stats_aggregates_spark.streaming.stream_queries import (
        _funnel_stage_result,
        twsip_available,
    )
    from bootic_stats_aggregates_spark.streaming.runner import stream_table

    assert twsip_available()
    ev = stream_table(spark, SF_DIR, "events").select(
        "user_id", "event_type"
    )
    got = {
        r["user_id"]: (r["stage"], r["n_events"])
        for r in _funnel_stage_result(spark, ev).collect()
    }
    want = {
        r["user_id"]: (r["stage"], r["n_events"])
        for r in QUERIES["stream_stateful_v2"](spark, SF_DIR).collect()
    }
    assert got == want


def test_stream_stateful_v2_chained_with_dedup(spark):
    """VERDICT r8 task 5 variant: streaming dropDuplicates on event_id
    chained UPSTREAM of the funnel-stage stateful processor — two
    stateful operators in one query — must equal the batch twin
    (distinct events, then the same set-prefix stage + count)."""
    import pyspark.sql.functions as F

    from bootic_stats_aggregates_spark.streaming.runner import (
        batch_table,
        stream_table,
    )
    from bootic_stats_aggregates_spark.streaming.stream_queries import (
        _funnel_stage_result,
    )

    ev = (
        stream_table(spark, SF_DIR, "events")
        .select("event_id", "user_id", "event_type")
        .dropDuplicates(["event_id"])
        .drop("event_id")
    )
    got = {
        r["user_id"]: (r["stage"], r["n_events"])
        for r in _funnel_stage_result(spark, ev).collect()
    }
    base = (
        batch_table(spark, SF_DIR, "events")
        .dropDuplicates(["event_id"])
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            *[
                F.max((F.col("event_type") == et).cast("int")).alias(et)
                for et in ("view", "click", "purchase")
            ],
        )
    )
    want = {}
    for r in base.collect():
        stage = 0
        for i, et in enumerate(("view", "click", "purchase")):
            if r[et]:
                stage = i + 1
            else:
                break
        want[r["user_id"]] = (stage, r["n_events"])
    assert got == want


def test_semdedup_manifest_matches_bruteforce(spark):
    """llm_semdedup's keep/drop manifest re-derived by brute force in
    numpy: a vector is dropped iff SOME lower-id member of its own cell
    has rounded cosine >= threshold. Checks both directions (no spurious
    drops, no missed drops) against the full 500x500 pair matrix."""
    import numpy as np

    from bootic_stats_aggregates_spark.llm.similarity import (
        _CENTROIDS,
        SEMDEDUP_COS,
    )

    rows = QUERIES["llm_semdedup"](spark, SF_DIR).collect()
    got = {r.vec_id: (r.cell, r.kept) for r in rows}

    import pandas as pd  # noqa: F401 — via pyarrow below

    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
    pdf = tbl.to_pandas().sort_values("vec_id").reset_index(drop=True)
    emb = np.stack(pdf["embedding"].to_numpy()).astype("float64")
    vec_ids = pdf["vec_id"].to_numpy()
    # cell assignment: first index of max rounded centroid dot
    ds = np.round(emb @ _CENTROIDS.T, 6)
    cells = np.argmax(ds, axis=1)
    nrm = np.sqrt((emb * emb).sum(axis=1))
    cos = np.round((emb @ emb.T) / np.outer(nrm, nrm), 6)
    for i, vid in enumerate(vec_ids):
        lower = [
            j
            for j in range(len(vec_ids))
            if cells[j] == cells[i] and vec_ids[j] < vid
        ]
        should_drop = any(cos[i, j] >= SEMDEDUP_COS for j in lower)
        cell_got, kept_got = got[int(vid)]
        assert cell_got == cells[i], (vid, cell_got, cells[i])
        assert kept_got == (not should_drop), (vid, kept_got, should_drop)
    assert any(not kept for _, kept in got.values()), (
        "fixture should produce at least one semantic drop"
    )


def test_zorder_interleave_roundtrip(spark):
    """The closed-form bit interleave must be the true Morton code:
    Spark's expression output == a Python reference interleave, and
    deinterleaving recovers (x, y) exactly, for all 65536 pairs' worth of
    structure sampled on a 256-point diagonal + random grid."""
    import random

    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.layout import _interleave_sql

    rng = random.Random(7)
    pts = [(i, 255 - i) for i in range(256)] + [
        (rng.randrange(256), rng.randrange(256)) for _ in range(500)
    ]

    def morton(x: int, y: int) -> int:
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    sdf = spark.createDataFrame(pts, "xb long, yb long").withColumn(
        "z", F.expr(_interleave_sql("xb", "yb", 8))
    )
    for r in sdf.collect():
        assert r.z == morton(r.xb, r.yb), (r.xb, r.yb, r.z)
        # deinterleave recovers the coordinates
        x = sum((((r.z >> (2 * i)) & 1) << i) for i in range(8))
        y = sum((((r.z >> (2 * i + 1)) & 1) << i) for i in range(8))
        assert (x, y) == (r.xb, r.yb)


def test_zorder_tiles_are_bounded_boxes(spark):
    """Every 256-wide z tile must span at most 16 distinct values in each
    dimension — the bounding-box property parquet row-group pruning
    exploits after a z-sorted write."""
    for r in QUERIES["layout_zorder"](spark, SF_DIR).collect():
        assert r.x_hi - r.x_lo <= 15, r
        assert r.y_hi - r.y_lo <= 15, r


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
)
def test_semdedup_twins_emit_identical_manifests(spark, sf_dir):
    """Permanent regression gate for the HOF ≡ BLAS equivalence (VERDICT
    r4 item 5): llm_semdedup (column-expression fold) and
    llm_semdedup_arrow (groupBy(cell).applyInPandas blocked BLAS) share
    one oracle SQL, but their mutual equivalence was previously only a
    tools/semdedup_scale.py claim. Assert identical (vec_id, cell, kept)
    manifests on both fixture scales."""
    hof = {
        (r.vec_id, r.cell, r.kept)
        for r in QUERIES["llm_semdedup"](spark, sf_dir).collect()
    }
    blas = {
        (r.vec_id, r.cell, r.kept)
        for r in QUERIES["llm_semdedup_arrow"](spark, sf_dir).collect()
    }
    assert len(hof) > 0
    assert hof == blas, (
        f"manifests diverge: {len(hof - blas)} HOF-only, "
        f"{len(blas - hof)} BLAS-only"
    )


def test_image_codecs_roundtrip():
    """decode(encode(px)) == px for the dependency-free BMP and PPM
    codecs, across widths that hit every BMP row-padding residue
    (3w % 4 in {0,1,2,3}) and heights 1..4 — the geometry where a missed
    bottom-up flip, BGR swap, or padding leak cannot hide."""
    from bootic_stats_aggregates_spark.llm.multimodal import (
        decode_image,
        encode_bmp,
        encode_ppm,
    )

    for w in (1, 4, 5, 6, 7, 8):
        for h in (1, 2, 3, 4):
            n = w * h * 3
            px = bytes((11 * j + 3) % 256 for j in range(n))
            for enc, name in ((encode_bmp, "bmp"), (encode_ppm, "ppm")):
                meta = decode_image(enc(px, w, h))
                assert meta["width"] == w and meta["height"] == h, (name, w, h)
                assert meta["mode"] == "RGB"
                assert bytes(meta["pixels"]) == px, (name, w, h)


def test_image_decode_no_longer_raises_without_pil():
    """VERDICT r4 item 8 'done' criterion: the decode probe must not
    raise on the no-PIL host for uncompressed containers (PIL-only
    formats still feature-probe)."""
    from bootic_stats_aggregates_spark.llm.multimodal import (
        decode_image,
        encode_ppm,
        image_features,
    )

    px = bytes(range(12))
    blob = encode_ppm(px, 2, 2)
    assert decode_image(blob)["pixels"] == px
    assert image_features(blob) == [2.0, 2.0, 3.0, sum(px) / 12]


def test_semdedup_zero_norm_vectors_agree_across_engines(spark, tmp_path):
    """The nrm > 0 guard (ADVICE r4): a zero-norm embedding has undefined
    cosine and the engines disagree on NaN ordering, so all three
    SemDeDup paths define it as never-similar. The fixture corpus has no
    zero vectors, so this stages a synthetic embeddings table containing
    two zero vectors (one with the LOWEST id in a crowded cell — the
    Spark-NaN-drops trap) plus near-duplicate and orthogonal-ish real
    vectors, then asserts HOF == BLAS == DuckDB oracle on it."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import duckdb

    from bootic_stats_aggregates_spark.io import TABLES
    from bootic_stats_aggregates_spark.registry import all_oracles

    rng = np.random.default_rng(11)
    dim = 64
    base = rng.normal(size=dim).astype("float32")
    vecs = {
        0: np.zeros(dim, dtype="float32"),        # zero vector, lowest id
        1: base,
        2: base + rng.normal(scale=0.01, size=dim).astype("float32"),  # near-dup of 1
        3: np.zeros(dim, dtype="float32"),        # second zero vector
        4: rng.normal(size=dim).astype("float32"),
        5: (-base).astype("float32"),
    }
    d = tmp_path / "sf_zero"
    d.mkdir()
    for t in TABLES:
        if t != "embeddings":
            shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    tbl = pa.table(
        {
            "vec_id": pa.array(sorted(vecs), type=pa.int64()),
            "embedding": pa.array(
                [vecs[k].tolist() for k in sorted(vecs)],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array([k % 3 for k in sorted(vecs)], type=pa.int32()),
        }
    )
    pq.write_table(tbl, d / "embeddings.parquet")

    hof = {
        (r.vec_id, r.cell, r.kept)
        for r in QUERIES["llm_semdedup"](spark, str(d)).collect()
    }
    blas = {
        (r.vec_id, r.cell, r.kept)
        for r in QUERIES["llm_semdedup_arrow"](spark, str(d)).collect()
    }
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW embeddings AS "
            f"SELECT * FROM read_parquet('{d}/embeddings.parquet')"
        )
        oracle = {
            (r[0], r[1], r[2])
            for r in con.execute(all_oracles()["llm_semdedup"]).fetchall()
        }
    finally:
        con.close()
    assert hof == blas == oracle, (hof, blas, oracle)
    kept = {vid: k for vid, _, k in hof}
    # zero vectors are never-similar: both kept, and vec 0 being the
    # lowest id in its cell must not drag real vectors down either way
    assert kept[0] is True and kept[3] is True
    # the genuine near-duplicate pair still dedups (2 drops to 1)
    assert kept[1] is True and kept[2] is False

    # the near-dup PAIR ops carry the same guard: Spark == oracle on the
    # zero-vector table, no pair involves a zero-norm side, and the real
    # near-dup pair (1, 2) is still found
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW embeddings AS "
            f"SELECT * FROM read_parquet('{d}/embeddings.parquet')"
        )
        nd_oracle = {
            (r[0], r[1]) for r in
            con.execute(all_oracles()["llm_embed_neardup"]).fetchall()
        }
    finally:
        con.close()
    nd_spark = {
        (r.vec_id_a, r.vec_id_b)
        for r in QUERIES["llm_embed_neardup"](spark, str(d)).collect()
    }
    assert nd_spark == nd_oracle
    assert (1, 2) in nd_spark
    assert not any(0 in p or 3 in p for p in nd_spark)
    # the LSH variant stays a subset of brute force with zero vectors in play
    lsh = {
        (r.vec_id_a, r.vec_id_b)
        for r in QUERIES["llm_embed_neardup_lsh"](spark, str(d)).collect()
    }
    assert lsh <= nd_spark


def test_wav_codec_roundtrip():
    """decode(encode(samples)) == samples for the dependency-free WAV
    codec, including odd sample counts (odd data-chunk sizes exercise
    RIFF word-alignment padding) and the junk LIST chunk the decoder
    must walk past."""
    import numpy as np

    from bootic_stats_aggregates_spark.llm.multimodal import (
        decode_wav,
        encode_wav,
    )

    for n in (1, 2, 255, 256, 257):
        samples = ((np.arange(n, dtype=np.int64) * 37 + 11) % 4096) - 2048
        meta = decode_wav(encode_wav(samples, 8000))
        assert meta["sample_rate"] == 8000
        assert meta["n_channels"] == 1
        assert np.array_equal(meta["samples"].astype(np.int64), samples), n


def test_media_codecs_reject_malformed_containers():
    """Decoders fail LOUDLY on malformed containers (truncated pixel
    plane, unsupported bit depth / compression, missing RIFF chunks) —
    a decode stage that silently returns garbage poisons every
    downstream feature. NotImplementedError stays reserved for
    PIL-gated compressed formats."""
    import struct

    import numpy as np

    import pytest as _pytest

    from bootic_stats_aggregates_spark.llm.multimodal import (
        decode_image,
        decode_wav,
        encode_bmp,
        encode_ppm,
        encode_wav,
    )

    px = bytes(range(12))
    with _pytest.raises(ValueError):
        decode_image(encode_ppm(px, 2, 2)[:-5])  # truncated pixels
    with _pytest.raises(ValueError):
        decode_image(b"P6\n2 2\n65535\n" + px)  # 16-bit maxval
    bmp = bytearray(encode_bmp(px, 2, 2))
    struct.pack_into("<H", bmp, 28, 8)  # claim 8-bit depth
    with _pytest.raises(ValueError):
        decode_image(bytes(bmp))
    bmp = bytearray(encode_bmp(px, 2, 2))
    struct.pack_into("<I", bmp, 30, 1)  # claim RLE compression
    with _pytest.raises(ValueError):
        decode_image(bytes(bmp))
    wav = encode_wav(np.arange(4, dtype=np.int64), 8000)
    with _pytest.raises(ValueError):
        decode_wav(wav[:8] + b"XXXX" + wav[12:])  # not WAVE
    with _pytest.raises(ValueError):
        decode_wav(wav[:12])  # chunks missing
    with _pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\0" * 32)  # garbage chunks
    with _pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0JFIF-ish")  # JPEG stays PIL-gated


def test_png_codec_roundtrip_and_rejection():
    """decode(encode(px)) == px for the dependency-free PNG codec across
    enough rows to hit ALL FIVE scanline filters (encode uses y % 5), and
    loud failures on truncation, bit-flips (CRC), and unsupported
    profiles — a silent-garbage decode poisons every downstream
    feature."""
    import struct
    import zlib

    import numpy as np

    import pytest as _pytest

    from bootic_stats_aggregates_spark.llm.multimodal import (
        _decode_png,
        decode_image,
        encode_png,
    )

    rng = np.random.default_rng(13)
    for (w, h) in ((1, 1), (2, 3), (5, 7), (16, 11)):
        px = rng.integers(0, 256, w * h * 3, dtype=np.uint8).tobytes()
        meta = decode_image(encode_png(px, w, h))  # probe-chain dispatch
        assert (meta["width"], meta["height"]) == (w, h)
        assert meta["pixels"] == px, (w, h)
    blob = encode_png(bytes(range(0, 72, 2)), 4, 3)
    with _pytest.raises(ValueError):
        _decode_png(blob[: len(blob) // 2])  # truncated IDAT
    bad = bytearray(blob)
    bad[40] ^= 0xFF
    with _pytest.raises(ValueError):
        _decode_png(bytes(bad))  # CRC catches the bit flip
    # unsupported profile: grayscale color type in an otherwise valid IHDR
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with _pytest.raises(ValueError):
        _decode_png(b"\x89PNG\r\n\x1a\n" + chunk)


def test_ivf_train_partitions_the_corpus(spark):
    """llm_ivf_train invariants beyond oracle equality: the final
    assignment is a PARTITION (cluster sizes sum to the corpus, all K
    cells non-empty on this corpus) and training moved the centroids off
    their init vectors (c_sum differs from the init vector's own sum for
    at least one cell — a do-nothing loop would reproduce the init)."""
    import pyarrow.parquet as pq

    from bootic_stats_aggregates_spark.llm.similarity import KMEANS_K

    rows = QUERIES["llm_ivf_train"](spark, SF_DIR).collect()
    n_corpus = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet")).num_rows
    assert len(rows) == KMEANS_K
    assert sum(r.n_vecs for r in rows) == n_corpus
    assert all(r.n_vecs > 0 for r in rows)
    import numpy as np

    tbl = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet")).to_pandas()
    init_sums = {
        int(r.vec_id): round(float(np.asarray(r.embedding, dtype="float64").sum()), 6)
        for r in tbl.itertuples()
        if r.vec_id < KMEANS_K
    }
    moved = [r for r in rows if abs(r.c_sum - init_sums[r.cluster]) > 1e-9]
    assert moved, "no centroid moved — the iteration loop did nothing"


def test_ppm_decoder_skips_header_comments():
    """PPM headers may carry '#' comment lines between fields (emitted by
    many tools); the encoder never writes them, so splice one in manually
    and assert the decoder walks past it."""
    from bootic_stats_aggregates_spark.llm.multimodal import decode_image

    px = bytes(range(12))
    blob = b"P6\n# made by a tool\n2 2\n# another\n255\n" + px
    meta = decode_image(blob)
    assert (meta["width"], meta["height"]) == (2, 2)
    assert bytes(meta["pixels"]) == px


@pytest.mark.parametrize(
    "qid",
    [
        "llm_ivf_train",       # collect_list-rebuilt centroids per round
        "agg_collect_sorted",  # ordered collect is the op's whole point
        "llm_corpus_shuffle",  # deterministic permutation claim
        "llm_pack_sequences",  # prefix-sum packing over an explicit order
        "agg_string_agg",      # LISTAGG ordering
    ],
)
def test_rerun_determinism(spark, qid, request):
    """Two FRESH builds (memo bypassed) of the order-sensitive operators
    must produce identical result sets: Spark's collect_list/shuffle
    ordering is partition-order-dependent, so every registered use must
    be pinned by an explicit sort — a rerun that differs means an
    unpinned ordering leaked into the output."""
    fn = QUERIES[qid].__wrapped__
    a = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    assert a == b, f"{qid}: rerun diverged"


def test_ivf_train_matches_numpy_reference(spark):
    """Third-engine check for llm_ivf_train (the oracle is DuckDB SQL;
    this is an INDEPENDENT numpy Lloyd's with the same contract:
    deterministic farthest-point seeding — seed 0 is the min-vec_id
    vector, each next seed maximizes distance to the nearest chosen
    seed, ties to the lowest vec_id — then exact double distances,
    argmin tie-broken by cell id, cluster means rounded to 6 before the
    next round, empty cells keep their centroid). All three engines
    must agree on every output cell."""
    import numpy as np
    import pyarrow.parquet as pq

    from bootic_stats_aggregates_spark.llm.similarity import (
        KMEANS_ITERS,
        KMEANS_K,
    )

    pdf = (
        pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    E = np.stack(pdf["embedding"].to_numpy()).astype("float64")
    # farthest-point seeding (rows are vec_id-ordered, so argmax's
    # first-max rule IS the lowest-vec_id tie-break)
    cents = E[[0]].copy()
    dmin = ((E - E[0]) ** 2).sum(axis=1)
    for _ in range(1, KMEANS_K):
        nxt = E[int(dmin.argmax())]
        cents = np.vstack([cents, nxt])
        dmin = np.minimum(dmin, ((E - nxt) ** 2).sum(axis=1))

    def assign(cents):
        # exact double distances; ties -> lowest cid (argmin is first-min)
        d = ((E[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)

    for _ in range(KMEANS_ITERS):
        a = assign(cents)
        for k in range(KMEANS_K):
            members = E[a == k]
            if len(members):
                cents[k] = np.round(members.mean(axis=0), 6)
    final = assign(cents)
    expect = {}
    for k in range(KMEANS_K):
        expect[k] = (
            int((final == k).sum()),
            round(float(cents[k][0]), 6),
            round(float(cents[k].sum()), 6),
        )
    got = {
        r.cluster: (r.n_vecs, r.c_dim0, round(r.c_sum, 6))
        for r in QUERIES["llm_ivf_train"](spark, SF_DIR).collect()
    }
    assert got == expect, {k: (got.get(k), expect[k]) for k in expect if got.get(k) != expect[k]}


def test_near_dup_pairs_for_planted_and_guards(spark):
    """The fixture-independent LSH core (near_dup_pairs_for, also driven
    at 220k docs by tools/neardup_scale.py) on an inline corpus: a planted
    final-token mutation pairs with its base (only the last trigram shingle
    changes: jaccard 37/39 ~ 0.95),
    unrelated docs never pair, and <3-token docs — empty shingle sets by
    the ADVICE-r1 guard — pair with nothing, even when textually identical
    (0/0 jaccard is NULL, which the threshold filter drops)."""
    from bootic_stats_aggregates_spark.llm.dedup import near_dup_pairs_for

    base = " ".join(f"w{i}" for i in range(40))
    twin = " ".join([f"w{i}" for i in range(39)] + ["zz"])
    other = " ".join(f"x{i}" for i in range(40))
    rows = [
        (1, base), (2, twin), (3, other),
        (10, "tiny doc"), (11, "tiny doc"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in near_dup_pairs_for(docs).collect()
    }
    assert set(got) == {(1, 2)}, got
    assert got[(1, 2)] == pytest.approx(37 / 39, abs=1e-6)


def test_ivfpq_recall_meets_target(spark):
    """llm_ann_ivfpq's contract (VERDICT r5 task 5, PQ per r6 task 1):
    recall@5 vs the brute-force truth >= 0.9 on the fixture WITH real
    pruning (6/16 trained cells probed, compressed-domain ADC cut, 40
    candidates exact-scored per query), and every returned cosine exact
    (equal to the brute pair's). The fixed random centroids of
    llm_ann_ivf manage only ~0.3 here — the trained quantizer is what
    buys the recall."""
    brute = {
        (r.q_vec_id, r.vec_id): r.cos_sim
        for r in QUERIES["llm_cosine_topk"](spark, SF_DIR).collect()
    }
    pq = {
        (r.q_vec_id, r.vec_id): r.cos_sim
        for r in QUERIES["llm_ann_ivfpq"](spark, SF_DIR).collect()
    }
    for pair, cos in pq.items():
        if pair in brute:
            assert brute[pair] == cos, f"cosine mismatch for {pair}"
    recall = len(set(brute) & set(pq)) / len(brute)
    assert recall >= 0.9, f"IVF-PQ recall@5 below target: {recall}"


def test_pq_codes_are_real_product_quantization(spark):
    """The PQ fidelity contract (VERDICT r6 task 1, replacing IVF-SQ8):
    (a) trained SUBSPACE codebooks exist — PQ_M * PQ_KSUB centroids of
    PQ_SUBDIM dims, exactly PQ_KSUB per subspace; (b) every vector's
    code is PQ_M centroid ids, each < PQ_KSUB (4-bit representable at
    PQ_KSUB=16), so a packed code is PQ_M/2 = 8 bytes — >= 8x smaller
    than the 64-byte-per-vector SQ8 scheme it replaced (one int8 per
    dim); (c) codes are non-trivial: more than one distinct code exists
    per subspace (the degenerate everything-in-cell-0 codebook fails)."""
    from bootic_stats_aggregates_spark.llm import similarity as sim

    e = sim._scored_vectors(spark, SF_DIR).select("vec_id", "emb")
    cents, assigned = sim._train_pq(e, sim.KMEANS_ITERS)
    crows = cents.collect()
    assert len(crows) == sim.PQ_M * sim.PQ_KSUB
    per_sub = {}
    for r in crows:
        per_sub.setdefault(r["sub"], set()).add(r["cid"])
        assert len(r["c"]) == sim.PQ_SUBDIM
    assert set(per_sub) == set(range(sim.PQ_M))
    assert all(len(cids) == sim.PQ_KSUB for cids in per_sub.values())
    codes = assigned.collect()
    n_vecs = e.count()
    assert len(codes) == n_vecs * sim.PQ_M  # every vector fully encoded
    assert all(0 <= r["cid"] < sim.PQ_KSUB for r in codes)
    # 4-bit packability and the 8x-vs-SQ8 pin, from the geometry itself
    assert sim.PQ_KSUB <= 16, "codes must stay 4-bit packable"
    packed_bytes = sim.PQ_M * 4 / 8
    sq8_bytes = 64  # one int8 per dim, the r6 scheme
    assert sq8_bytes / packed_bytes >= 8
    # non-degenerate: each subspace uses more than one centroid
    used = {}
    for r in codes:
        used.setdefault(r["sub"], set()).add(r["cid"])
    assert all(len(cids) > 1 for cids in used.values())


def test_rocksdb_state_store_provider(spark):
    """The stateful streaming fleet under the RocksDBStateStoreProvider —
    the 100 TB state story (VERDICT r5 task 6): default-HDFS keeps every
    key in executor heap, RocksDB spills to local SSD and is the provider
    any large-state production job runs. Asserts (a) a windowed stateful
    aggregation REALLY ran on RocksDB (rocksdb* custom metrics present in
    the streaming progress, state rows accounted), and (b) the three
    registered stateful ops produce byte-identical results under either
    provider — state storage is an executor-side concern, never semantics."""
    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.streaming.runner import (
        run_to_memory,
        stream_table,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider"
    )
    before = spark.conf.get(key, None)
    try:
        spark.conf.set(key, rocks)
        # (a) direct metrics probe: windowed count per (type, hour)
        progress: list = []
        agg = (
            stream_table(spark, SF_DIR, "events")
            .groupBy("event_type", F.window("ts", "1 hour"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        out = run_to_memory(agg, mode="complete", progress_sink=progress)
        n_out = out.count()
        assert n_out > 0
        ops = [
            so
            for p in progress
            for so in (p.get("stateOperators") or [])
        ]
        assert ops, "no stateOperators in streaming progress"
        assert any(so.get("numRowsTotal", 0) > 0 for so in ops)
        custom = {k for so in ops for k in (so.get("customMetrics") or {})}
        assert any(k.startswith("rocksdb") for k in custom), (
            f"RocksDB metrics absent — provider not in effect: {custom}"
        )
        # (b) provider-independence of the registered stateful results
        rock_results = {}
        for qid in (
            "stream_stateful",
            "stream_chained_stateful",
            "stream_incr_dedup",
        ):
            fn = getattr(QUERIES[qid], "__wrapped__", QUERIES[qid])
            rock_results[qid] = {
                tuple(r) for r in fn(spark, SF_DIR).collect()
            }
    finally:
        if before is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, before)
    for qid, rows in rock_results.items():
        fn = getattr(QUERIES[qid], "__wrapped__", QUERIES[qid])
        default_rows = {tuple(r) for r in fn(spark, SF_DIR).collect()}
        assert rows == default_rows, f"{qid} diverged across providers"


def test_cents_nan_inf_contract(spark):
    """An unrepresentable amount (NaN/±Inf, or a finite magnitude past
    the int64-cents range) must contribute NOTHING — not abort the
    aggregation. Without the guard in helpers.cents(), ANSI mode raises
    CAST_OVERFLOW on the long cast and a single bad row takes down
    every money aggregate fleet-wide."""
    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.helpers import cents

    df = spark.createDataFrame(
        [
            (1, float("nan")),
            (2, float("inf")),
            (3, float("-inf")),
            (4, 1.5),
            (5, None),
            (6, 1e18),  # finite, but 1e20 cents overflows int64
            (7, -1e18),
        ],
        "k INT, value DOUBLE",
    )
    rows = df.select(cents("value").alias("c")).collect()
    assert [r.c for r in rows] == [None, None, None, 150, None, None, None]
    assert df.agg(F.sum(cents("value")).alias("s")).collect()[0].s == 150


def test_maintained_ann_index_recall(spark):
    """VERDICT r7 task 2 evidence (c): search over the PERSISTED,
    change-feed-MAINTAINED IVF-PQ index — codebooks and codes read back
    from their MiniLog tables, never retrained or re-encoded here —
    keeps recall@5 vs brute force on the live vector set at the
    fixture's cell-coverage ceiling (0.92 measured; floor 0.9). The
    op itself pins maintained == fresh-rebuild bit-for-bit, so this is
    also the fresh index's recall by construction."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.llm import ann_index as ai
    from bootic_stats_aggregates_spark.llm.similarity import (
        IVFPQ_NPROBE,
        N_QUERIES,
        TOP_K,
        _dot,
    )

    vec, cbc, cbp, idx = ai._stage(spark, SF_DIR)
    live, cents, codes = vec.read(), cbc.read(), idx.read()
    q = live.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("emb").alias("qemb")
    )
    nrm = live.select(
        "vec_id", F.sqrt(_dot(F.col("emb"), F.col("emb"))).alias("nrm")
    )
    pair = (
        q.crossJoin(live.join(nrm, "vec_id").filter(F.col("nrm") > 0))
        .filter(F.col("vec_id") != F.col("q_vec_id"))
        .select(
            "q_vec_id",
            "vec_id",
            (
                _dot(F.col("qemb"), F.col("emb"))
                / (F.sqrt(_dot(F.col("qemb"), F.col("qemb"))) * F.col("nrm"))
            ).alias("cos"),
        )
    )
    wb = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), "vec_id")
    top5 = lambda df: {  # noqa: E731
        (r.q_vec_id, r.vec_id)
        for r in df.withColumn("rk", F.row_number().over(wb))
        .filter(F.col("rk") <= TOP_K)
        .select("q_vec_id", "vec_id")
        .collect()
    }
    brute = top5(pair)
    d2 = F.aggregate(
        F.zip_with("qemb", "cvec", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("q_vec_id").orderBy("d2", "cid")
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select("q_vec_id", "cid", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= IVFPQ_NPROBE)
        .select("q_vec_id", F.col("cid").alias("cell"))
    )
    cand = (
        probes.join(codes.select("vec_id", "cell"), "cell")
        .filter(F.col("vec_id") != F.col("q_vec_id"))
        .select("q_vec_id", "vec_id")
    )
    ann = top5(cand.join(pair, ["q_vec_id", "vec_id"]))
    recall = len(ann & brute) / len(brute)
    assert recall >= 0.9, f"maintained-index recall@5 collapsed: {recall}"


def test_farthest_point_seeding_beats_first_k_on_adversarial_order(spark):
    """VERDICT r7 task 6: first-K init is quality-fragile under an
    adversarial corpus — K near-identical vectors occupying the first
    ids collapse Lloyd's into one effective cell — while the
    deterministic farthest-point init (_seed_centroids) spreads seeds
    across the data's diameter and stays exact-replayable. Pinned by
    within-cluster SSE after the registered KMEANS_ITERS rounds: the
    farthest-point quantizer must beat the degraded first-K one by >2x
    on a corpus of 8 well-separated clusters whose first K ids are
    decoy duplicates."""
    import math

    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.llm import similarity as sim

    k = 8
    rows = []
    for i in range(k):  # decoys: the first K ids are near-identical
        rows.append((i, [10.0 + i * 1e-4, 10.0, 10.0, 10.0]))
    centers = [
        (40.0 * (c % 4), 40.0 * (c // 4), -20.0 * c, 5.0 * c)
        for c in range(8)
    ]
    vid = k
    for ctr in centers:
        for _ in range(25):
            rows.append(
                (
                    vid,
                    [
                        ctr[d] + 0.1 * math.sin(vid * 2.7 + d)
                        for d in range(4)
                    ],
                )
            )
            vid += 1
    e = spark.createDataFrame(rows, "vec_id long, emb array<double>")

    def sse(cents):
        d2 = F.aggregate(
            F.zip_with("emb", "cvec", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (
            sim._kmeans_assign(e, cents)
            .join(cents, "cid")
            .agg(F.sum(d2).alias("s"))
            .collect()[0]["s"]
        )

    firstk = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("emb").alias("cvec"),
    )
    for _ in range(sim.KMEANS_ITERS):
        firstk = sim._kmeans_update(sim._kmeans_assign(e, firstk), firstk)
    fp, _ = sim._train_quantizer(e, k, sim.KMEANS_ITERS)
    s_first, s_fp = sse(firstk), sse(fp)
    assert s_fp * 2 < s_first, (
        f"farthest-point SSE {s_fp:.1f} not clearly better than "
        f"degraded first-K SSE {s_first:.1f}"
    )


def test_staging_rebuilds_after_partial_teardown(spark):
    """Marker-without-table robustness (found r12): the _READY marker
    lives at the staging ROOT, siblings to the table dirs — a partial
    teardown (tmp cleaner, crashed rmtree) can remove a TABLE dir while
    the marker survives. A fresh process must then detect the missing
    table and rebuild, not trust the marker and die with NoSuchVersion /
    FILE_NOT_EXIST. Models the fresh process by clearing the per-session
    plan memo (the memo itself legitimately serves same-session plans)."""
    import glob
    import shutil

    from bootic_stats_aggregates_spark.session import session_cache

    tag = os.path.basename(os.path.normpath(SF_DIR))
    root = os.path.join(tempfile.gettempdir(), "bootic_minilog", tag, "ann_index")

    # batch index: stage, kill ONE sibling table dir, keep the marker
    QUERIES["llm_ann_index_maintain"](spark, SF_DIR).collect()
    shutil.rmtree(os.path.join(root, "index"))
    assert os.path.exists(os.path.join(root, "_READY"))
    session_cache(spark, "plans").clear()
    row = QUERIES["llm_ann_index_maintain"](spark, SF_DIR).collect()[0]
    assert row["maintain_ok"] and row["incr_ok"]

    # streaming index: same shape, _READY_STREAM survives index_stream
    QUERIES["stream_ann_index_maintain"](spark, SF_DIR).collect()
    shutil.rmtree(os.path.join(root, "index_stream"))
    assert os.path.exists(os.path.join(root, "_READY_STREAM"))
    session_cache(spark, "plans").clear()
    row = QUERIES["stream_ann_index_maintain"](spark, SF_DIR).collect()[0]
    assert row["stream_ok"] and row["matches_batch"]

    # mview: the view table dir dies, _READY_MVIEW survives
    n0 = len(QUERIES["stream_mview_cdf"](spark, SF_DIR).collect())
    views = glob.glob(
        os.path.join(tempfile.gettempdir(), "bootic_minilog", tag, "**", "mview_cdf_view"),
        recursive=True,
    )
    assert views, "mview staging dir not found"
    for v in views:
        shutil.rmtree(v)
    session_cache(spark, "plans").clear()
    assert len(QUERIES["stream_mview_cdf"](spark, SF_DIR).collect()) == n0 > 0

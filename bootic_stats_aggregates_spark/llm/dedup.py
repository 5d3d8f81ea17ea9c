"""Deduplication operators (SURVEY.md §2.9): exact, MinHash-LSH, SimHash,
n-gram jaccard.

The 100 TB dedup cascade, cheapest first:

1. ``llm_exact_dedup``  — hash-groupBy on the content hash: one shuffle.
2. ``llm_fingerprint``  — order/multiplicity-insensitive md5 (text.py).
3. ``llm_near_dedup``   — MinHash signatures + LSH banding: candidate pairs
   come from a band-hash shuffle join (near-linear), NEVER an O(n²) cross
   join; only candidates pay the exact-jaccard verification.
4. ``llm_ngram_jaccard`` — the brute-force verify step on its own, kept
   oracle-checked (DuckDB list fns) and used to validate the LSH recall in
   tests at small SF.
5. ``llm_simhash``      — 64-bit SimHash per doc as a single aggregate
   expression (no explode, no extra shuffle).

MinHash/SimHash use xxhash64 (not available in DuckDB) -> rows-only checks;
the jaccard math itself is oracle-checked via llm_ngram_jaccard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..helpers import lcount
from ..io import table
from ..registry import query

#: MinHash config: 32 hashes = 16 bands x 2 rows. P(candidate | jaccard j)
#: = 1-(1-j^2)^16: j=0.5 -> 0.99, j=0.2 -> 0.48, j=0.05 -> 0.04 — high
#: recall at the 0.5 decision threshold, cheap rejection below it.
N_HASHES = 32
BAND_ROWS = 2
N_BANDS = N_HASHES // BAND_ROWS
JACCARD_THRESHOLD = 0.5


def _shingles(text_col: str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles via sequence+transform (pure codegen)."""
    toks = F.split(text_col, " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + k) for k in range(n)]
        ),
    )
    return F.array_distinct(grams)


def _minhash_sig(shingles: Column) -> Column:
    """Array of N_HASHES min-hashes: min over shingles of seeded xxhash64.

    (A derive-from-one-base-hash variant — hash each shingle string once,
    seed the N_HASHES family off the long — was tried and reverted: Catalyst
    does not CSE the base-hash subtree across the array elements, so it
    recomputed string hashes 32x AND re-rolled the band dice, losing a
    borderline jaccard≈0.5 pair. The string-seeded family below is the
    benchmarked, recall-proven configuration.)
    """
    return F.array(
        *[
            F.array_min(
                F.transform(
                    shingles, lambda s, i=i: F.xxhash64(F.concat(F.lit(f"{i}:"), s))
                )
            )
            for i in range(N_HASHES)
        ]
    )


@query(
    "llm_exact_dedup",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM (
      SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM documents
    )
    WHERE rn = 1
    """,
)
def llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, keep-lowest-doc_id.

    Partitioning by sha2(text) rather than the raw text keeps shuffle keys
    small and uniform (a 100 TB corpus shuffles 32-byte keys, not documents).
    The oracle partitions by raw text — same equivalence classes.
    """
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


#: Brute-force jaccard-pairs SQL — ground truth for BOTH the exhaustive
#: operator (llm_ngram_jaccard) and the LSH path: the LSH output is
#: xxhash64-routed but its RESULT is (pair, exact jaccard) — band recall at
#: the b/r-vs-threshold operating point makes it equal the exhaustive scan
#: (pinned independently by tests/test_properties.py::test_lsh_matches_bruteforce).
_JACCARD_PAIRS_SQL = f"""
    WITH sh AS (
      SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(string_split(text,' ')) - 2, 1) + 1),
          i -> string_split(text,' ')[i] || ' ' ||
               string_split(text,' ')[i+1] || ' ' ||
               string_split(text,' ')[i+2]
        )) AS s
      FROM documents
    )
    SELECT
      a.doc_id AS doc_id_a,
      b.doc_id AS doc_id_b,
      round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(a.s || b.s)), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(a.s || b.s)) >= {JACCARD_THRESHOLD}
"""


def near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, jaccard-verified.

    Dataflow: shingle -> 32 minhashes -> 16 band keys -> explode (16 rows
    per doc) -> shuffle-join on (band_id, band_hash) for candidates ->
    exact jaccard on the candidates only -> threshold.

    Scale: the band join groups only colliding docs; with b*r tuned to the
    threshold the candidate set is near-linear in true-duplicate count.
    The final jaccard check joins shingle sets for candidate pairs only.
    Shared builder: the registered query below AND the edge set for
    ``llm_dedup_clusters``.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", _shingles().alias("sh")
    )
    sig = d.select("doc_id", "sh", _minhash_sig(F.col("sh")).alias("sig"))
    bands = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * BAND_ROWS + 1, BAND_ROWS),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")

    left = bands.alias("a")
    right = bands.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )

    sh = d
    verified = (
        cand.join(sh.select(F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a")), "doc_id_a")
        .join(sh.select(F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b")), "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return verified


@query("llm_near_dedup", oracle=_JACCARD_PAIRS_SQL)
def llm_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered surface for :func:`near_dup_pairs` (see its docstring)."""
    return near_dup_pairs(spark, sf_dir)


MAX_CC_ITERS = 20


@query(
    "llm_dedup_clusters",
    oracle=f"""
    -- Connected components over the near-dup pair graph via recursive CTE:
    -- a doc's cluster id is the min doc_id reachable from it (edges both
    -- directions); docs with no near-dups are their own singleton cluster.
    WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_SQL}),
    edges AS (
      SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
      UNION ALL
      SELECT doc_id_b AS a, doc_id_a AS b FROM pairs
    ),
    reach(node, comp) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.node
    ),
    cc AS (SELECT node AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY node)
    SELECT
      doc_id,
      CAST(cluster_id AS BIGINT) AS cluster_id,
      doc_id = cluster_id AS is_representative
    FROM cc
    """,
)
def llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTER assignment — the actual dedup deliverable
    (keep ``is_representative``, drop the rest).

    Connected components over the verified pair graph by iterative min-label
    propagation: each round every node takes the min label among itself and
    its neighbors; converges in <= graph-diameter rounds (near-dup clusters
    are shallow — pairs share a common ancestor text — so this terminates in
    2-3 rounds here; a 100 TB corpus with adversarial chains would use the
    large-star/small-star contraction of Kiveris et al., same join shape,
    O(log n) rounds). Each round is one shuffle join + one min-aggregate;
    the driver sees only a changed-count scalar per round.
    """
    docs = table(spark, sf_dir, "documents").select("doc_id")
    pairs = near_dup_pairs(spark, sf_dir).select("doc_id_a", "doc_id_b")
    edges = pairs.union(
        pairs.select(F.col("doc_id_b").alias("doc_id_a"), F.col("doc_id_a").alias("doc_id_b"))
    ).withColumnsRenamed({"doc_id_a": "src", "doc_id_b": "dst"})
    # Tiny at fixture scale and reused every iteration -> pin both sides.
    edges = edges.cache()
    labels = docs.select("doc_id", F.col("doc_id").alias("cluster_id")).cache()
    for _ in range(MAX_CC_ITERS):
        neighbor_min = (
            labels.join(edges, labels.doc_id == edges.src)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        "doc_id",
        F.col("cluster_id").cast("long").alias("cluster_id"),
        (F.col("doc_id") == F.col("cluster_id")).alias("is_representative"),
    )


@query("llm_ngram_jaccard", oracle=_JACCARD_PAIRS_SQL)
def llm_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force 3-gram-shingle jaccard pairs (the LSH verify step alone).

    Oracle-checked ground truth for llm_near_dedup; only run exhaustively at
    small SF — at scale the LSH path replaces the cross join.
    """
    d = table(spark, sf_dir, "documents").select("doc_id", _shingles().alias("s"))
    a = d.select(F.col("doc_id").alias("doc_id_a"), F.col("s").alias("s_a"))
    b = d.select(F.col("doc_id").alias("doc_id_b"), F.col("s").alias("s_b"))
    jac = (
        F.size(F.array_intersect("s_a", "s_b")).cast("double")
        / F.size(F.array_union("s_a", "s_b"))
    )
    return (
        a.join(b, F.col("doc_id_a") < F.col("doc_id_b"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select(
            "doc_id_a", "doc_id_b", F.round(jac, 6).alias("jaccard")
        )
    )


@query("llm_simhash")  # xxhash64-based -> rows-only check
def llm_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document, as ONE aggregate expression.

    Bit-voting runs entirely inside codegen: fold the distinct tokens into a
    64-slot vote array with aggregate+zip_with, then pack sign bits into a
    long. No explode, no shuffle — per-row cost only, which is what lets it
    run over a 100 TB corpus as a simple projection.
    """
    d = table(spark, sf_dir, "documents")
    # SQL lambda form: the Python shiftright/shiftleft wrappers require a
    # literal int shift, but SQL accepts a column-valued shift inside the
    # higher-order lambdas.
    simhash = F.expr(
        """
        aggregate(
          zip_with(
            aggregate(
              array_distinct(split(text, ' ')),
              array_repeat(0L, 64),
              (acc, t) -> zip_with(
                acc,
                transform(sequence(0, 63),
                          b -> IF((shiftright(xxhash64(t), b) & 1) = 1, 1L, -1L)),
                (a, v) -> a + v
              )
            ),
            sequence(0, 63),
            (v, p) -> IF(v > 0, shiftleft(1L, p), 0L)
          ),
          0L, (acc, x) -> acc + x
        )
        """
    )
    return d.select(
        "doc_id",
        simhash.alias("simhash"),
        F.size(F.array_distinct(F.split("text", " "))).cast("long").alias("n_uniq"),
    )


@query(
    "llm_dedup_stats",
    oracle="""
    SELECT
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,
      CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_exact_dups
    FROM documents
    """,
)
def llm_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level dedup summary (drives cascade planning)."""
    d = table(spark, sf_dir, "documents")
    return d.agg(
        lcount("n_docs"),
        F.countDistinct("text").cast("long").alias("n_distinct_texts"),
        (F.count(F.lit(1)) - F.countDistinct("text")).cast("long").alias("n_exact_dups"),
    )


HAMMING_K = 3  # 4 x 16-bit bands guarantee recall for hamming <= 3


def _simhash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash) — reuses the registered signature query."""
    from ..registry import all_queries

    return all_queries()["llm_simhash"](spark, sf_dir).select("doc_id", "simhash")


@query("llm_simhash_pairs")  # xxhash64-based -> rows-only; equality vs brute
def llm_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs: banded candidates + hamming verify.

    The classic web-dedup config (Manku/Google): 64-bit simhash split into
    4 x 16-bit bands; any pair within hamming distance 3 MUST agree exactly
    on >= 1 band (pigeonhole), so a 4-way band shuffle join finds ALL such
    pairs without O(n²) — tests/test_properties.py proves equality with the
    brute-force h<=3 scan. Coarser than MinHash-LSH (which catches the
    higher-churn near-dups jaccard>=0.5 implies here); the cascade runs
    this cheap filter first, MinHash on the survivors.

    Scale: |bands| = 4 rows/doc; candidates per band bucket are true
    hash-collisions of 16 bits of structure — near-linear on real corpora.
    """
    sh = _simhash_df(spark, sf_dir)
    # bands unrolled in Python: shiftright's bit count must be a literal
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright("simhash", b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_id", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= HAMMING_K)

"""Text analysis for training-data pipelines (SURVEY.md §2.9).

Everything here is pure JVM-side column expressions (split / explode /
higher-order lambdas) — no Python UDFs in any hot path. At 100 TB these all
reduce to scan -> project -> (optional explode) -> hash agg, i.e. they
scale exactly like the engine's counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..helpers import lcount
from ..io import table
from ..registry import query

#: DuckDB fragment: per-doc DISTINCT 3-token shingle sets with the <3-token
#: empty-set guard (mirrors the Spark side). Shared by every shingle-based
#: oracle here and in llm/dedup.py — one definition, one semantics.
SHINGLE_SELECT_SQL = """\
      SELECT doc_id,
        CASE WHEN len(string_split(text,' ')) < 3 THEN []
        ELSE list_distinct(list_transform(
          range(1, len(string_split(text,' ')) - 2 + 1),
          i -> string_split(text,' ')[i] || ' ' ||
               string_split(text,' ')[i+1] || ' ' ||
               string_split(text,' ')[i+2]
        )) END AS s
      FROM documents"""

#: Stopword-ish filler tokens of the synthetic corpus (FIXTURES.md: vocab is
#: engine-themed words). Fixed literal list => deterministic on both sides.
STOPWORDS = ["a", "the", "of", "to", "and", "in", "is", "it"]

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


def _bigram_array(toks):
    """Adjacent-bigram array of a token array. Guard: sequence(0, -1)
    would DESCEND for 1-token docs, so the build is gated on size >= 2
    (same contract as the oracles' range()).

    r14: pass a MATERIALIZED token-array column (split aliased in its
    own projection), not an inline split expression — higher-order
    functions evaluate interpreted, so an inline split in the lambda
    body is rebuilt on every element_at (O(L²) per doc); an attribute
    reference is one row-field read (guide §1.2)."""
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _toks(col: str = "text"):
    return F.split(col, " ")


def _doc_tokens(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """(doc_id, tok) exploded token stream over ``documents`` — the shared
    prelude of the token-level aggregate ops (entropy, LM logprob,
    inverted index, PMI). One narrow projection + generator; Catalyst
    prunes the scan to (doc_id, text) in every consumer."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(_toks()).alias("tok"))


@query(
    "llm_text_stats",
    oracle="""
    SELECT
      lang,
      CAST(count(*) AS BIGINT) AS n_docs,
      round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars,
      round(CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*), 4)
        AS avg_tokens,
      CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM documents
    GROUP BY lang
    """,
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per language (doc counts, length, token counts)."""
    d = table(spark, sf_dir, "documents")
    ntok = F.size(_toks())
    return d.groupBy("lang").agg(
        lcount("n_docs"),
        F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_chars"
        ),
        F.round(F.sum(ntok).cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_tokens"
        ),
        F.sum(ntok).cast("long").alias("total_tokens"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )


@query(
    "llm_lang_filter",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE lang IN ('en', 'es')
      AND n_chars > 100
      AND len(string_split(text, ' ')) >= 20
    """,
)
def llm_lang_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality/language filtering stage (keep en/es, minimum length)."""
    d = table(spark, sf_dir, "documents")
    return d.filter(
        F.col("lang").isin("en", "es")
        & (F.col("n_chars") > 100)
        & (F.size(_toks()) >= 20)
    ).select("doc_id", "lang", "source", "n_chars")


@query(
    "llm_tokenize_ngrams",
    oracle=f"""
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    )
    WHERE NOT list_contains({_STOP_SQL}, token)
    GROUP BY token
    """,
)
def llm_tokenize_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + stopword filter + corpus term counts."""
    d = table(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    kept = F.filter(_toks(), lambda t: ~F.array_contains(stop, t))
    return (
        d.select(F.explode(kept).alias("_tok"))
        .groupBy(F.col("_tok").alias("token"))
        .agg(lcount("n"))
    )


@query(
    "llm_bigrams",
    oracle="""
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT unnest(list_transform(
        range(1, len(string_split(text, ' '))),
        i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
      )) AS bigram
      FROM documents
    )
    GROUP BY bigram
    """,
)
def llm_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram counts via a sequence->transform lambda (no Python, no ML lib).

    ``transform(sequence(1, n-1), i -> tok[i] || ' ' || tok[i+1])`` runs in
    codegen; explode + hash agg does the counting.
    """
    d = table(spark, sf_dir, "documents")
    # _bigram_array gates on size >= 2: a bare sequence(1, size-1) DESCENDS
    # ([1, 0]) for 1-token docs — an ANSI element_at error, where the
    # oracle's range(1, 0) is empty (hostile-fixture sweep finding, r5).
    # r14: split materialized in its own projection — inline, the
    # interpreted lambda re-evaluates it per element_at (O(L²)/doc).
    return (
        d.select(F.split("text", " ").alias("__ts"))
        .select(F.explode(_bigram_array(F.col("__ts"))).alias("bigram"))
        .groupBy("bigram")
        .agg(lcount("n"))
    )


@query(
    "llm_tfidf_topterms",
    oracle="""
    WITH term_lang AS (
      SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT lang, term, count(*) AS tf FROM term_lang GROUP BY lang, term
    ),
    df AS (
      SELECT term, count(DISTINCT lang) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT count(DISTINCT lang) AS n_langs FROM documents),
    scored AS (
      SELECT
        tf.lang, tf.term,
        CAST(tf.tf AS BIGINT) AS tf,
        round(CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_langs AS DOUBLE) / df.df), 6)
          AS score
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    )
    SELECT lang, term, tf, score, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY lang ORDER BY score DESC, term
      ) AS rk FROM scored
    )
    WHERE rk <= 10
    """,
)
def llm_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 distinguishing terms per language by tf-idf.

    Two hash aggs (tf per (lang,term), df per term) + a broadcast-sized join
    on term + a per-lang top-k window — no step grows faster than the
    vocabulary.
    """
    d = table(spark, sf_dir, "documents")
    term_lang = d.select("lang", F.explode(_toks()).alias("term"))
    tf = term_lang.groupBy("lang", "term").agg(lcount("tf"))
    df = tf.groupBy("term").agg(
        F.countDistinct("lang").alias("df")
    )
    n_langs = d.select(F.countDistinct("lang").alias("n_langs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_langs))
        .select(
            "lang",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n_langs").cast("double") / F.col("df")),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 10)
    )


@query(
    "llm_quality_score",
    oracle=f"""
    SELECT
      doc_id,
      lang,
      round(
        0.4 * least(CAST(n_chars AS DOUBLE) / 500.0, 1.0)
        + 0.3 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0, 1.0)
        + 0.3 * (1.0 - CAST(len(list_intersect(list_distinct(string_split(text, ' ')), {_STOP_SQL})) AS DOUBLE)
                 / len(list_distinct(string_split(text, ' ')))),
        6
      ) AS quality
    FROM documents
    """,
)
def llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: length + token-count + content-word ratio.

    Same double expression tree on both sides => bit-identical before the
    final round(6).
    """
    d = table(spark, sf_dir, "documents")
    toks = _toks()
    uniq = F.array_distinct(toks)
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    stop_ratio = (
        F.size(F.array_intersect(uniq, stop)).cast("double") / F.size(uniq)
    )
    quality = F.round(
        F.lit(0.4) * F.least(F.col("n_chars").cast("double") / 500.0, F.lit(1.0))
        + F.lit(0.3) * F.least(F.size(toks).cast("double") / 50.0, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - stop_ratio),
        6,
    )
    return d.select("doc_id", "lang", quality.alias("quality"))


#: Marker tokens per language for the n-gram/lexicon language-id heuristic.
#: (The corpus is synthetic so these are arbitrary-but-fixed vocabulary
#: slices; the *mechanics* — set overlap + deterministic argmax — are what a
#: real lexicon-based lang-id does.)
LANG_MARKERS = {
    "en": ["scan", "join", "order", "batch"],
    "es": ["hash", "stream", "value", "table"],
    "fr": ["spark", "window", "dup", "merge"],
}


def _marker_sql(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in LANG_MARKERS[lang]) + "]"


@query(
    "llm_lang_id",
    oracle=f"""
    WITH s AS (
      SELECT
        doc_id,
        lang,
        len(list_intersect(list_distinct(string_split(text, ' ')), {_marker_sql('en')})) AS s_en,
        len(list_intersect(list_distinct(string_split(text, ' ')), {_marker_sql('es')})) AS s_es,
        len(list_intersect(list_distinct(string_split(text, ' ')), {_marker_sql('fr')})) AS s_fr
      FROM documents
    )
    SELECT
      doc_id,
      lang,
      CASE
        WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
        WHEN s_es >= s_fr THEN 'es'
        ELSE 'fr'
      END AS pred_lang,
      CAST(greatest(s_en, s_es, s_fr) AS BIGINT) AS score
    FROM s
    """,
)
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-overlap language ID with a deterministic tie-break order."""
    d = table(spark, sf_dir, "documents")
    uniq = F.array_distinct(_toks())
    scores = {
        lang: F.size(
            F.array_intersect(uniq, F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in LANG_MARKERS.items()
    }
    pred = (
        F.when(
            (scores["en"] >= scores["es"]) & (scores["en"] >= scores["fr"]), "en"
        )
        .when(scores["es"] >= scores["fr"], "es")
        .otherwise("fr")
    )
    return d.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        F.greatest(*scores.values()).cast("long").alias("score"),
    )


@query(
    "llm_fingerprint",
    oracle="""
    SELECT
      doc_id,
      md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
        AS fingerprint,
      CAST(count(*) OVER (
        PARTITION BY md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
      ) AS BIGINT) AS n_same
    FROM documents
    """,
)
def llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 over the sorted distinct token set.

    Robust to word order/repetition — the cheap first stage of a dedup
    cascade (exact hash -> fingerprint -> MinHash-LSH -> jaccard verify).
    """
    d = table(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.sort_array(F.array_distinct(_toks()))))
    w = Window.partitionBy(fp)
    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_same"),
    )


#: BPE-ish pre-tokenization pattern (letter runs / digit runs / single
#: punctuation — the shape GPT-2's pre-tokenizer splits on, minus the
#: lookahead features RE2-style engines don't share). Identical semantics in
#: Spark's Java regex and DuckDB's RE2.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@query(
    "llm_token_count",
    oracle=f"""
    SELECT
      lang,
      CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
      CAST(sum(len(regexp_extract_all(text, '{BPE_PATTERN}')) ) AS BIGINT)
        AS bpe_tokens,
      CAST(count(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY lang
    """,
)
def llm_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting: whitespace tokens vs BPE-ish pre-tokens.

    The number every training-data pipeline reports first. Both tokenizers
    are single JVM-side projections (split / regexp_extract_all) feeding one
    partial+final aggregate — a pure map-side pipeline at 100 TB.
    """
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.sum(F.size(_toks())).cast("long").alias("ws_tokens"),
        F.sum(F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)))
        .cast("long")
        .alias("bpe_tokens"),
        lcount("n_docs"),
    )


# -- round 2 additions: benchmark decontamination + hard quality gate --------

CONTAM_NGRAM = 8  # contamination granularity: 8-token shingles (industry norm)
BENCH_MOD = 7  # deterministic "benchmark" subset: doc_id % 7 == 0 (~14%)


@query(
    "llm_contamination",
    oracle=f"""
    -- A training doc is contaminated if it shares >=1 distinct 8-gram with
    -- the benchmark subset. 8-gram slices via list slicing (1-based,
    -- inclusive): toks[i:i+{CONTAM_NGRAM - 1}] is {CONTAM_NGRAM} tokens.
    WITH grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(string_split(text, ' ')) - {CONTAM_NGRAM - 1} + 1),
               i -> array_to_string(
                 string_split(text, ' ')[i:i + {CONTAM_NGRAM - 1}], ' ')
             ))) AS gram
      FROM documents
      WHERE len(string_split(text, ' ')) >= {CONTAM_NGRAM}
    ),
    bench AS (
      SELECT DISTINCT gram FROM grams WHERE doc_id % {BENCH_MOD} = 0
    )
    SELECT g.doc_id, CAST(count(DISTINCT g.gram) AS BIGINT) AS n_shared
    FROM grams g JOIN bench b ON g.gram = b.gram
    WHERE g.doc_id % {BENCH_MOD} <> 0
    GROUP BY g.doc_id
    """,
)
def llm_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any 8-token
    shingle with the held-out benchmark set (here a deterministic doc_id
    slice standing in for an eval suite).

    Scale shape: the benchmark side is tiny (eval suites are thousands of
    docs) -> distinct grams BROADCAST; the corpus side is a pure
    explode->broadcast-hash-join->partial count per doc — NO shuffle of
    corpus n-grams, which is what makes decontamination a single map-side
    pass over 100 TB. (At that scale the gram string would be xxhash64'd
    before the join to shrink the broadcast; kept as raw strings here so
    the oracle can replay byte-for-byte.)
    """
    from .dedup import _shingles_from

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("__tk")
    )
    grams8 = _shingles_from(F.col("__tk"), n=CONTAM_NGRAM)
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench = (
        d.filter(is_bench)
        .select(F.explode(grams8).alias("gram"))
        .distinct()
    )
    corpus = d.filter(~is_bench).select(
        "doc_id", F.explode(grams8).alias("gram")
    )
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").cast("long").alias("n_shared"))
    )


#: Gopher-style hard gate bounds (Rae et al. 2021 §A1.1, scaled to the
#: fixture corpus' shorter docs).
QF_MIN_TOKENS, QF_MAX_TOKENS = 20, 10_000
QF_MIN_WORD_LEN, QF_MAX_WORD_LEN = 3.0, 10.0
QF_MIN_STOPWORDS = 2


def quality_keep_sql(text_col: str = "text") -> str:
    """The Gopher-gate keep decision as one inline DuckDB boolean expression.

    Shared by every oracle that embeds the gate (stream_quality_gate,
    llm_dedup_cascade) so a change to STOPWORDS or the QF_* bounds can never
    desync those oracles from the Spark side (ADVICE r2)."""
    return f"""(
        len(string_split({text_col}, ' '))
          BETWEEN {QF_MIN_TOKENS} AND {QF_MAX_TOKENS}
        AND (CAST(list_sum(list_transform(string_split({text_col}, ' '),
                                          t -> length(t))) AS DOUBLE)
             / len(string_split({text_col}, ' '))
               BETWEEN {QF_MIN_WORD_LEN} AND {QF_MAX_WORD_LEN})
        AND len(list_intersect(list_distinct(string_split({text_col}, ' ')),
                               {_STOP_SQL})) >= {QF_MIN_STOPWORDS}
    )"""


def quality_gate_cols(text_col: str = "text"):
    """The Gopher-gate metric columns as SPARK expressions — the
    column-side twin of :func:`quality_keep_sql`: (n_tok, mean_wl,
    n_stop, keep). Shared by the batch gate (llm_quality_filter) and the
    streaming gate (stream_quality_gate) so batch and stream can never
    disagree on what "keep" means."""
    toks = F.split(text_col, " ")
    n_tok = F.size(toks)
    mean_wl = (
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).cast("double")
        / n_tok
    )
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop))
    keep = (
        n_tok.between(QF_MIN_TOKENS, QF_MAX_TOKENS)
        & mean_wl.between(QF_MIN_WORD_LEN, QF_MAX_WORD_LEN)
        & (n_stop >= QF_MIN_STOPWORDS)
    )
    return n_tok, mean_wl, n_stop, keep


@query(
    "llm_quality_filter",
    oracle=f"""
    WITH m AS (
      SELECT
        doc_id,
        len(string_split(text, ' ')) AS n_tok,
        CAST(list_sum(list_transform(string_split(text, ' '),
                                     t -> length(t))) AS DOUBLE)
          / len(string_split(text, ' ')) AS mean_wl,
        len(list_intersect(list_distinct(string_split(text, ' ')),
                           {_STOP_SQL})) AS n_stop
      FROM documents
    )
    SELECT
      doc_id,
      CAST(n_tok AS BIGINT) AS n_tok,
      round(mean_wl, 4) AS mean_word_len,
      CAST(n_stop AS BIGINT) AS n_stopwords,
      n_tok BETWEEN {QF_MIN_TOKENS} AND {QF_MAX_TOKENS} AS ok_len,
      mean_wl BETWEEN {QF_MIN_WORD_LEN} AND {QF_MAX_WORD_LEN} AS ok_word_len,
      n_stop >= {QF_MIN_STOPWORDS} AS ok_stopwords,
      (n_tok BETWEEN {QF_MIN_TOKENS} AND {QF_MAX_TOKENS})
        AND (mean_wl BETWEEN {QF_MIN_WORD_LEN} AND {QF_MAX_WORD_LEN})
        AND n_stop >= {QF_MIN_STOPWORDS} AS keep
    FROM m
    """,
)
def llm_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style HARD quality gate (vs llm_quality_score's soft score):
    token-count bounds, mean-word-length bounds, minimum stop-word count —
    each rule surfaced as its own boolean plus the final keep decision, the
    shape a pipeline needs to audit WHY a doc was dropped.

    Pure per-row projections (one aggregate fold over the token array), so
    the gate is a map-only pass at any corpus size.
    """
    d = table(spark, sf_dir, "documents")
    n_tok, mean_wl, n_stop, _keep = quality_gate_cols()
    ok_len = n_tok.between(QF_MIN_TOKENS, QF_MAX_TOKENS)
    ok_wl = mean_wl.between(QF_MIN_WORD_LEN, QF_MAX_WORD_LEN)
    ok_stop = n_stop >= QF_MIN_STOPWORDS
    return d.select(
        "doc_id",
        n_tok.cast("long").alias("n_tok"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        n_stop.cast("long").alias("n_stopwords"),
        ok_len.alias("ok_len"),
        ok_wl.alias("ok_word_len"),
        ok_stop.alias("ok_stopwords"),
        (ok_len & ok_wl & ok_stop).alias("keep"),
    )


_EMAIL_RE = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
_IP_RE = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"


@query(
    "llm_pii_redact",
    oracle=f"""
    -- The synthetic corpus has no PII, so a deterministic contact line is
    -- appended per doc (like fn_url's synthesized URLs): detection and
    -- redaction mechanics are the thing under test, on non-trivial input.
    WITH w AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR) || '@'
                  || source || '.com from 10.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.0.' || CAST(doc_id % 100 AS VARCHAR) AS t
      FROM documents
    )
    SELECT
      doc_id,
      regexp_matches(t, '{_EMAIL_RE}') AS has_email,
      CAST(len(regexp_extract_all(t, '{_IP_RE}')) AS BIGINT) AS n_ips,
      substring(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                               '{_IP_RE}', '<IP>', 'g'), -40) AS redacted_tail
    FROM w
    """,
)
def llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction — the curation stage every training corpus
    runs before release: flag emails, count IP literals, and rewrite both to
    placeholder tokens. Pure JVM regex projections (map-only at any scale);
    the fixtures carry no PII, so a deterministic contact line is appended
    first and the redacted TAIL is compared so the oracle sees the rewrite.
    """
    d = table(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@"), F.col("source"), F.lit(".com from 10."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".0."),
        (F.col("doc_id") % 100).cast("string"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"), _IP_RE, "<IP>"
    )
    return d.select(
        "doc_id",
        t.rlike(_EMAIL_RE).alias("has_email"),
        F.size(F.regexp_extract_all(t, F.lit(_IP_RE), 0))
        .cast("long")
        .alias("n_ips"),
        F.substring(redacted, -40, 40).alias("redacted_tail"),
    )


@query(
    "llm_entropy",
    oracle="""
    -- unigram (token) Shannon entropy per document, bits. Low entropy =
    -- repetitive/templated text; a standard corpus quality signal.
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           round(CAST(entropy(tok) AS DOUBLE), 4) AS token_entropy
    FROM (
      SELECT doc_id, text, unnest(string_split(text, ' ')) AS tok
      FROM documents
    )
    GROUP BY doc_id, text
    """,
)
def llm_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token entropy — the "templated text" quality signal.

    H = log2(N) - (Σ c·log2 c)/N over per-token counts c: both terms are
    plain mergeable sums, so the shape is explode -> two stacked hash aggs
    (doc×token, then doc), each with map-side partial combine. No windows,
    no Python. At 100 TB the first agg keys on (doc_id, token) — high
    cardinality but perfectly spreadable; nothing is held per-doc beyond
    two running sums. DuckDB's ``entropy()`` aggregate (log2-based,
    count-weighted — verified) replays the math exactly; rounded to 4
    decimals per determinism rule 3.
    """
    toks = _doc_tokens(spark, sf_dir)
    cnt = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c")
    return cnt.groupBy("doc_id").agg(
        n.cast("long").alias("n_tokens"),
        F.round(
            F.log2(n) - F.sum(F.col("c") * F.log2("c")) / n, 4
        ).alias("token_entropy"),
    )


@query(
    "llm_repetition",
    oracle="""
    -- Gopher-style repetition signal: fraction of word bigrams that are
    -- duplicates of an earlier bigram in the same document
    SELECT doc_id,
           CAST(len(bgs) AS BIGINT) AS n_bigrams,
           CAST(len(list_distinct(bgs)) AS BIGINT) AS n_uniq,
           round(1.0 - CAST(len(list_distinct(bgs)) AS DOUBLE) / len(bgs), 4)
             AS dup_ratio
    FROM (
      SELECT doc_id,
             list_transform(
               range(1, len(string_split(text, ' '))),
               i -> string_split(text, ' ')[i] || ' '
                    || string_split(text, ' ')[i+1]
             ) AS bgs
      FROM documents
    )
    WHERE len(bgs) > 0
    """,
)
def llm_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-bigram ratio per document (Gopher repetition filter).

    Entirely map-side: tokens -> zipped bigram array -> ``size`` vs
    ``size(array_distinct(...))`` per row — no explode, no shuffle, no
    per-doc state. That means the filter streams over a 100 TB corpus as a
    pure projection (the plan is scan -> project -> filter; asserted
    shuffle-free fleet-wide by the plan-hygiene test). The reference has no
    analog; this is SURVEY §2.9's text-analysis family extended with the
    repetition signal real curation pipelines gate on.
    """
    d = table(spark, sf_dir, "documents")
    # r14: split materialized in its own projection (see _bigram_array) —
    # still a pure scan -> project chain, no shuffle added.
    withb = (
        d.select("doc_id", F.split("text", " ").alias("__ts"))
        .select("doc_id", _bigram_array(F.col("__ts")).alias("bgs"))
        .filter(F.size("bgs") > 0)
    )
    n, u = F.size("bgs"), F.size(F.array_distinct("bgs"))
    return withb.select(
        "doc_id",
        n.cast("long").alias("n_bigrams"),
        u.cast("long").alias("n_uniq"),
        F.round(F.lit(1.0) - u.cast("double") / n, 4).alias("dup_ratio"),
    )


@query(
    "llm_unigram_logprob",
    oracle="""
    -- corpus-LM quality signal: mean log2 unigram probability per doc
    -- (the cheap stand-in for LM perplexity filtering)
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    corpus AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c_corp FROM toks GROUP BY tok
    ),
    total AS (SELECT sum(c_corp) AS t FROM corpus),
    doc AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c_doc
      FROM toks GROUP BY doc_id, tok
    )
    SELECT d.doc_id,
           CAST(sum(d.c_doc) AS BIGINT) AS n_tokens,
           round(CAST(sum(d.c_doc * log2(CAST(c.c_corp AS DOUBLE)
                                         / (SELECT t FROM total)))
                      / sum(d.c_doc) AS DOUBLE), 4) AS mean_logprob
    FROM doc d JOIN corpus c USING (tok)
    GROUP BY d.doc_id
    """,
)
def llm_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean log2 unigram probability per doc under the CORPUS distribution
    — the cheap language-model quality filter (docs of rare/garbled tokens
    score low; the usual stand-in where a KenLM-style perplexity gate
    would run). ONE token explode → (doc, token) hash agg; the corpus
    counts ROLL UP from the per-doc counts (r13, guide §2.2: the corpus
    agg used to re-explode the whole corpus a second time — c_corp ==
    sum of c_doc by definition, exact integer equality, and the rollup
    consumes the already-aggregated doc rows) + one equi-join on token.
    Scale: the token join is the classic Zipf-skewed join — head
    tokens dominate — which AQE's skew-split handles at cluster scale
    (same mitigation as join_skew_salted documents explicitly); everything
    else is mergeable partial aggregation. Rounded per determinism rule 3.
    """
    toks = _doc_tokens(spark, sf_dir)
    doc = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c_doc"))
    corpus = doc.groupBy("tok").agg(F.sum("c_doc").alias("c_corp"))
    # The corpus token total stays IN the plan as a broadcast one-row
    # crossJoin (same shape as llm_tfidf_topterms / win_share_of_total) —
    # a driver-side .collect() here would make building the DataFrame
    # eager and scan the corpus twice (VERDICT r3 item 3).
    total = corpus.agg(F.sum("c_corp").cast("double").alias("corpus_total"))
    joined = doc.join(corpus, "tok").crossJoin(F.broadcast(total))
    return joined.groupBy("doc_id").agg(
        F.sum("c_doc").cast("long").alias("n_tokens"),
        F.round(
            F.sum(
                F.col("c_doc") * F.log2(F.col("c_corp") / F.col("corpus_total"))
            )
            / F.sum("c_doc"),
            4,
        ).alias("mean_logprob"),
    )


#: Conjunctive keyword query answered by the inverted index (terms chosen
#: from the fixture vocabulary's mid-frequency band so the result is
#: selective but non-empty at every SF).
SEARCH_TERMS = ["hash", "join"]
_TERMS_SQL = ", ".join(f"'{t}'" for t in SEARCH_TERMS)


@query(
    "llm_inverted_index",
    oracle=f"""
    -- inverted-index AND query: docs containing EVERY search term, with
    -- per-term counts — the posting-list intersection, relationally
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS total_hits,
           CAST(count(*) AS BIGINT) AS n_terms_present
    FROM (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
      FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
      )
      WHERE tok IN ({_TERMS_SQL})
      GROUP BY doc_id, tok
    )
    GROUP BY doc_id
    HAVING count(*) = {len(SEARCH_TERMS)}
    """,
)
def llm_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword search via inverted-index semantics — posting-list AND
    intersection done relationally: explode to (doc, term) postings,
    keep only query terms (the filter lands BEFORE the shuffle, so the
    full posting space never materializes), count per (doc, term), and a
    doc qualifies when it holds ALL query terms (``HAVING count = |q|``
    — the classic set-cover trick, no joins at all for conjunctive
    queries). At 100 TB the real deployment materializes the posting
    table once, partitioned by term (directory-pruned lookups); the
    per-query plan here is one filtered scan + two hash aggs, both
    mergeable.
    """
    postings = _doc_tokens(spark, sf_dir).filter(
        F.col("tok").isin(*SEARCH_TERMS)
    )
    per_term = postings.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return (
        per_term.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("total_hits"),
            F.count(F.lit(1)).cast("long").alias("n_terms_present"),
        )
        .filter(F.col("n_terms_present") == len(SEARCH_TERMS))
    )


BOILER_CHUNK_TOKENS = 20  # tokens per boilerplate-detection chunk


@query(
    "llm_boilerplate_chunks",
    oracle=f"""
    -- cross-document boilerplate: fixed-size token chunks appearing in
    -- MORE THAN ONE document (shared passages / template text); per doc,
    -- what fraction of its chunks are corpus-repeated
    WITH chunks AS (
      SELECT doc_id,
             list_transform(
               range(0, CAST(ceil(len(string_split(text, ' '))
                             / {BOILER_CHUNK_TOKENS}.0) AS BIGINT)),
               i -> array_to_string(
                 string_split(text, ' ')[i * {BOILER_CHUNK_TOKENS} + 1
                                         : (i + 1) * {BOILER_CHUNK_TOKENS}],
                 ' ')
             ) AS cs
      FROM documents
    ),
    posted AS (
      SELECT doc_id, unnest(cs) AS chunk FROM chunks
    ),
    freq AS (
      SELECT chunk, count(DISTINCT doc_id) AS df FROM posted GROUP BY chunk
    )
    SELECT p.doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(*) FILTER (WHERE f.df > 1) AS BIGINT) AS n_shared,
           round(CAST(count(*) FILTER (WHERE f.df > 1) AS DOUBLE)
                 / count(*), 4) AS shared_ratio
    FROM posted p JOIN freq f USING (chunk)
    GROUP BY p.doc_id
    """,
)
def llm_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection — the passage-granular dedup
    signal between exact dedup (whole doc) and MinHash (whole doc,
    fuzzy): cut every doc into fixed {BOILER_CHUNK_TOKENS}-token chunks,
    count per-chunk document frequency, and score each doc by the
    fraction of its chunks shared with ANY other doc (header/footer/
    template text lights up here long before whole-doc similarity does).
    Shape: native chunker (sequence->transform->slice, codegen) ->
    explode -> chunk-df hash agg -> hash join back -> per-doc agg. The
    chunk join is Zipf-skewed exactly like the token join in
    llm_unigram_logprob — AQE skew-split territory at 100 TB; nothing is
    quadratic (chunk space is linear in corpus tokens).
    """
    # r14: split materialized in its own projection — inline, the
    # interpreted chunker lambda re-evaluates it per slice (O(L²/20)/doc).
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("__ts")
    )
    toks = F.col("__ts")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(BOILER_CHUNK_TOKENS))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * BOILER_CHUNK_TOKENS + 1, BOILER_CHUNK_TOKENS), " "
        ),
    )
    posted = d.select("doc_id", F.explode(chunks).alias("chunk"))
    freq = posted.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("df")
    )
    shared = F.count_if(F.col("df") > 1)
    return (
        posted.join(freq, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            shared.cast("long").alias("n_shared"),
            F.round(shared.cast("double") / F.count(F.lit(1)), 4).alias(
                "shared_ratio"
            ),
        )
    )


@query(
    "llm_url_dedup",
    oracle="""
    -- crawl URL canonicalization + dedup: scheme/host case-folded,
    -- default port and fragment dropped, utm_* tracking params stripped,
    -- then group by canonical form. Same string surgery on both engines.
    WITH urls AS (
      SELECT doc_id,
             'HTTP://Src' || (doc_id % 20) || '.Example.COM:80/doc/'
             || (doc_id % 500) || CASE WHEN doc_id % 3 = 0
                  THEN '?utm_source=feed&utm_campaign=x' || (doc_id % 7)
                  ELSE '' END
             || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(lower(url), '#.*$', ''),
                 '\\?utm_[^#]*$', ''),
               ':80/', '/') AS curl
      FROM urls
    )
    SELECT curl,
           CAST(count(*) AS BIGINT) AS n_dups,
           CAST(min(doc_id) AS BIGINT) AS keeper
    FROM canon
    GROUP BY curl
    HAVING count(*) > 1
    """,
)
def llm_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-URL canonicalization dedup — the FIRST dedup any web corpus
    runs, before any content hashing: the same page arrives as
    ``HTTP://Host:80/p?utm_source=...#frag`` and ``http://host/p``.
    Canonicalize (case-fold scheme+host, drop default port, strip
    fragment and utm_* tracking params) then hash-group on the canonical
    form, keeping the lowest doc_id. All JVM regex/string projections +
    one hash agg — map-side combine applies, so at 100 TB it costs one
    shuffle of |unique URLs|. URLs are synthesized deterministically from
    doc ids (fixtures carry none); ~doc_id%500 collisions guarantee real
    duplicate groups at every SF.
    """
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTP://Src"), (F.col("doc_id") % 20).cast("string"),
        F.lit(".Example.COM:80/doc/"), (F.col("doc_id") % 500).cast("string"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("?utm_source=feed&utm_campaign=x"),
                (F.col("doc_id") % 7).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    curl = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.lower(url), r"#.*$", ""),
            r"\?utm_[^#]*$", "",
        ),
        ":80/", "/",
    )
    return (
        d.select("doc_id", curl.alias("curl"))
        .groupBy("curl")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dups"),
            F.min("doc_id").cast("long").alias("keeper"),
        )
        .filter(F.col("n_dups") > 1)
    )


PMI_TOP_TOKENS = 8  # vocabulary slice for the pairwise PMI matrix


@query(
    "llm_cooccurrence_pmi",
    oracle=f"""
    -- pairwise PMI over the {PMI_TOP_TOKENS} most frequent tokens:
    -- log2(P(a,b) / (P(a)P(b))) with doc-level presence probabilities
    WITH pres AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
      )
    ),
    freq AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS df FROM pres GROUP BY tok
    ),
    top AS (
      SELECT tok, df FROM freq ORDER BY df DESC, tok LIMIT {PMI_TOP_TOKENS}
    ),
    n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM pres),
    pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b,
             CAST(count(*) AS BIGINT) AS co_df
      FROM (SELECT p.doc_id, p.tok FROM pres p JOIN top USING (tok)) a
      JOIN (SELECT p.doc_id, p.tok FROM pres p JOIN top USING (tok)) b
        ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY a.tok, b.tok
    )
    SELECT p.tok_a, p.tok_b, p.co_df,
           round(log2(CAST(p.co_df AS DOUBLE) * n.n_docs
                      / (fa.df * fb.df)), 6) AS pmi
    FROM pairs p
    JOIN top fa ON p.tok_a = fa.tok
    JOIN top fb ON p.tok_b = fb.tok
    CROSS JOIN n
    """,
)
def llm_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise PMI (pointwise mutual information) over the head
    vocabulary — the corpus-statistics primitive behind collocation
    mining and static word vectors: PMI > 0 means two tokens share
    documents more than independence predicts. Bounded by construction:
    presence pairs are built only for the top {PMI_TOP_TOKENS} tokens
    (selected by global top-k with a total order, i.e.
    TakeOrderedAndProject — no vocab-wide window), so the self-join fans
    each doc to at most C({PMI_TOP_TOKENS},2) pairs — linear in corpus
    size, never |vocab|². The unconstrained version is the classic
    quadratic blow-up; a wider matrix shards the token list and unions.
    """
    pres = _doc_tokens(spark, sf_dir).distinct()
    freq = pres.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    top = freq.orderBy(F.desc("df"), "tok").limit(PMI_TOP_TOKENS)
    # doc count stays in-plan (broadcast one-row crossJoin, the
    # llm_tfidf_topterms shape) — .count() here would schedule jobs at
    # DataFrame-build time (VERDICT r3 item 8's laziness rule).
    n_docs = pres.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    kept = pres.join(F.broadcast(top.select("tok")), "tok")
    a = kept.select("doc_id", F.col("tok").alias("tok_a"))
    b = kept.select("doc_id", F.col("tok").alias("tok_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).cast("long").alias("co_df"))
    )
    fa = top.select(F.col("tok").alias("tok_a"), F.col("df").alias("df_a"))
    fb = top.select(F.col("tok").alias("tok_b"), F.col("df").alias("df_b"))
    return (
        pairs.join(F.broadcast(fa), "tok_a")
        .join(F.broadcast(fb), "tok_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok_a",
            "tok_b",
            "co_df",
            F.round(
                F.log2(
                    F.col("co_df").cast("double")
                    * F.col("n_docs")
                    / (F.col("df_a") * F.col("df_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


@query(
    "llm_bigram_logprob",
    oracle="""
    -- bigram-LM quality signal: mean log2 P(w_i | w_{i-1}) under corpus
    -- bigram statistics — the step up from the unigram gate (catches
    -- word-salad text whose unigrams are individually common)
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    bgs AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, len(ts)),
               i -> ts[i] || ' ' || ts[i+1]
             )) AS bg
      FROM toks WHERE len(ts) >= 2
    ),
    doc_bg AS (
      SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS c_doc
      FROM bgs GROUP BY doc_id, bg
    ),
    corpus_bg AS (
      SELECT bg, CAST(count(*) AS BIGINT) AS c_bg FROM bgs GROUP BY bg
    ),
    ctx AS (
      SELECT string_split(bg, ' ')[1] AS w0,
             CAST(sum(c_bg) AS BIGINT) AS c_ctx
      FROM corpus_bg GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(sum(d.c_doc) AS BIGINT) AS n_bigrams,
           round(CAST(sum(d.c_doc * log2(CAST(cb.c_bg AS DOUBLE) / cx.c_ctx))
                      / sum(d.c_doc) AS DOUBLE), 4) AS mean_logprob
    FROM doc_bg d
    JOIN corpus_bg cb USING (bg)
    JOIN ctx cx ON string_split(d.bg, ' ')[1] = cx.w0
    GROUP BY d.doc_id
    """,
)
def llm_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean log2 bigram conditional probability per doc — the quality
    gate one rung above ``llm_unigram_logprob``: word-salad text built
    from individually-common tokens scores HIGH on unigrams but LOW here,
    because P(w_i | w_{i-1}) = c(bigram)/c(context) punishes never-seen
    transitions. Shape: ONE bigram explode → (doc, bigram) hash agg →
    corpus counts ROLLED UP from the per-doc counts (r13, guide §2.2:
    the corpus-level agg used to re-explode the whole corpus a second
    time; c_bg == sum of c_doc over docs by definition, exact integer
    equality, so the second scan's input is the already-aggregated
    doc_bg rows — orders of magnitude fewer than raw bigram posts) →
    context counts derived FROM the bigram table (no third scan) → two
    equi-joins, both Zipf-skewed like every token join (AQE skew-split
    at cluster scale). All counts are mergeable; rounded per
    determinism rule 3.
    """
    d = table(spark, sf_dir, "documents")
    # r14 (VERDICT r13 task 9, guide §1.2 per-task work): materialize the
    # split ONCE per row in its own projection. _bigram_array's lambda
    # references the token array per element (two element_at per bigram),
    # and higher-order functions evaluate interpreted — an inline
    # split(text) there is rebuilt per element_at, O(L²) per doc. As an
    # attribute it is a row-field read. Same rows, same bigrams.
    posted = d.select(
        "doc_id", F.split("text", " ").alias("__ts")
    ).select("doc_id", F.explode(_bigram_array(F.col("__ts"))).alias("bg"))
    doc_bg = posted.groupBy("doc_id", "bg").agg(
        F.count(F.lit(1)).alias("c_doc")
    )
    corpus_bg = doc_bg.groupBy("bg").agg(F.sum("c_doc").alias("c_bg"))
    # w0 = the bigram's first token: substring_index walks the string to
    # the first space — bigrams are "w0 w1" with space-free tokens (the
    # tokenizer splits on ' '), so this equals split(bg,' ')[0] without
    # allocating the 2-element array per row.
    w0 = F.substring_index("bg", " ", 1)
    ctx = corpus_bg.groupBy(w0.alias("w0")).agg(
        F.sum("c_bg").alias("c_ctx")
    )
    joined = (
        doc_bg.join(corpus_bg, "bg")
        .withColumn("w0", w0)
        .join(ctx, "w0")
    )
    return joined.groupBy("doc_id").agg(
        F.sum("c_doc").cast("long").alias("n_bigrams"),
        F.round(
            F.sum(
                F.col("c_doc")
                * F.log2(F.col("c_bg").cast("double") / F.col("c_ctx"))
            )
            / F.sum("c_doc"),
            4,
        ).alias("mean_logprob"),
    )


@query(
    "llm_ngram_novelty",
    oracle=f"""
    -- per-doc novelty: fraction of a doc's distinct 3-gram shingles that
    -- appear in NO other document — the inverse signal to boilerplate
    -- (high novelty = unique content; near-zero = template/copy). Docs
    -- shorter than 3 tokens have no shingles and drop out (both engines).
    WITH sh AS (
{SHINGLE_SELECT_SQL}
    ),
    posted AS (SELECT doc_id, unnest(s) AS g FROM sh),
    -- shingles are distinct per doc, so count(*) IS document frequency
    freq AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM posted GROUP BY g)
    SELECT p.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(*) FILTER (WHERE f.df = 1) AS BIGINT) AS n_novel,
           round(CAST(count(*) FILTER (WHERE f.df = 1) AS DOUBLE)
                 / count(*), 4) AS novelty_ratio
    FROM posted p JOIN freq f USING (g)
    GROUP BY p.doc_id
    """,
)
def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc n-gram novelty — the complement of
    :func:`llm_boilerplate_chunks`: the fraction of a document's distinct
    3-gram shingles appearing in no OTHER document. Curation uses it as a
    keep-signal (high-novelty docs carry information the corpus doesn't
    already have) where boilerplate-share is a drop-signal. Shape:
    codegen shingler -> explode -> shingle-df hash agg -> hash join back
    -> per-doc agg; all mergeable, nothing quadratic (shingle space is
    linear in corpus tokens), and the shingle join is Zipf-skewed like
    every token join — AQE skew-split at cluster scale.

    r14 note (ADVICE r13): r13 briefly computed df as ``count() OVER
    (PARTITION BY g)`` — one shingler evaluation and one fewer exchange,
    ~0.5 s faster at sf0.1 — but AQE's skew mitigation
    (OptimizeSkewedJoin) applies to JOINS, not window partitions, so a
    Zipf-head boilerplate shingle at corpus scale becomes an
    unsplittable straggler/spill hot spot in the window form. This r12
    join shape is restored as the registered 100 TB-safe plan: the df
    side partial-aggregates before its exchange (skew-immune) and the
    posting-side join exchange is exactly the skew-splittable pattern.
    The fixture-scale cost is the shingler evaluated twice (once per
    side) — pure map-side codegen, the right trade at scale. df-per-gram
    is the same count either way, so results are identical.
    """
    from .dedup import _shingles_from

    d = table(spark, sf_dir, "documents")
    posted = d.select(
        "doc_id", F.split("text", " ").alias("__tk")
    ).select("doc_id", F.explode(_shingles_from(F.col("__tk"))).alias("g"))
    freq = posted.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    novel = F.count_if(F.col("df") == 1)
    return (
        posted.join(freq, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            novel.cast("long").alias("n_novel"),
            F.round(
                novel.cast("double") / F.count(F.lit(1)), 4
            ).alias("novelty_ratio"),
        )
    )


ZIPF_TOP_TERMS = 1000  # head-vocabulary slice the power law is fitted on


@query(
    "llm_zipf_slope",
    oracle=f"""
    -- corpus Zipf fit: regress ln(freq) on ln(rank) over the top
    -- {ZIPF_TOP_TERMS} terms. A healthy natural-language corpus sits near
    -- slope -1; machine-generated or deduplicated-to-death corpora drift.
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    freq AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY tok
    ),
    top AS (
      SELECT tok, n FROM freq ORDER BY n DESC, tok LIMIT {ZIPF_TOP_TERMS}
    ),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS r FROM top
    )
    SELECT round(regr_slope(ln(CAST(n AS DOUBLE)), ln(CAST(r AS DOUBLE))), 4)
             AS zipf_slope,
           round(regr_intercept(ln(CAST(n AS DOUBLE)),
                                ln(CAST(r AS DOUBLE))), 4) AS ln_c,
           CAST(count(*) AS BIGINT) AS n_terms
    FROM ranked
    """,
)
def llm_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health Zipf diagnostic: fit ln(freq) ~ ln(rank) over the
    head vocabulary. Natural corpora follow freq ∝ rank^s with s ≈ -1;
    a slope drifting toward 0 flags synthetic/templated text, a cliff
    past -1.5 flags over-deduplication — the cheap corpus-level sibling
    of the per-doc logprob gates. Shape: token hash agg -> global top-k
    (TakeOrderedAndProject, no vocab-wide sort) -> rank over the
    {ZIPF_TOP_TERMS}-row head (bounded single-partition window, same
    justification as llm_cooccurrence_pmi's top slice) -> one regression
    aggregate. Output is a single row; rounded per determinism rule 3.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    top = freq.orderBy(F.desc("n"), "tok").limit(ZIPF_TOP_TERMS)
    w = Window.orderBy(F.desc("n"), "tok")
    ranked = top.select(
        F.col("n"), F.row_number().over(w).alias("r")
    )
    ln_n = F.log(F.col("n").cast("double"))
    ln_r = F.log(F.col("r").cast("double"))
    return ranked.agg(
        F.round(F.regr_slope(ln_n, ln_r), 4).alias("zipf_slope"),
        F.round(F.regr_intercept(ln_n, ln_r), 4).alias("ln_c"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
    )


@query(
    "llm_corpus_manifest",
    oracle="""
    -- dataset-card manifest: per (lang, length band) doc/token/char
    -- accounting plus each cell's share of the corpus — the summary table
    -- every released training set ships with
    WITH banded AS (
      SELECT lang,
             CASE WHEN n_chars >= 800 THEN 'long'
                  WHEN n_chars >= 300 THEN 'mid'
                  ELSE 'short' END AS band,
             len(string_split(text, ' ')) AS n_toks,
             n_chars
      FROM documents
    )
    SELECT lang, band,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           CAST(count(*) * 1000000 //
                (SELECT count(*) FROM documents) AS BIGINT) AS docs_ppm
    FROM banded
    GROUP BY lang, band
    """,
)
def llm_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus manifest (dataset-card rollup): per (language, length band)
    document / token / character totals and each cell's parts-per-million
    share of the corpus. The share denominator stays IN-PLAN as a
    broadcast one-row crossJoin (the lazy-total pattern shared with
    llm_tfidf_topterms — no driver-side collect, laziness gate applies),
    and the share itself is exact FLOORED integer millionths — integer
    division on both engines, immune to round-half conventions. All aggregates are
    mergeable sums/counts: one shuffle on (lang, band) plus the one-row
    total at any corpus size.
    """
    d = table(spark, sf_dir, "documents")
    total = d.agg(F.count(F.lit(1)).cast("long").alias("_total"))
    banded = d.select(
        "lang",
        F.when(F.col("n_chars") >= 800, "long")
        .when(F.col("n_chars") >= 300, "mid")
        .otherwise("short")
        .alias("band"),
        F.size(F.split("text", " ")).cast("long").alias("n_toks"),
        "n_chars",
    )
    return (
        banded.groupBy("lang", "band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "lang",
            "band",
            "n_docs",
            "n_tokens",
            "n_chars",
            F.expr("CAST((n_docs * 1000000) div _total AS BIGINT)").alias(
                "docs_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# BM25 search (r8): the retrieval scorer a training-data pipeline runs for
# corpus search / hard-negative mining, composed from the same token
# conventions as llm_tfidf_topterms / llm_inverted_index.
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75


@query(
    "llm_bm25_search",
    oracle=f"""
    -- BM25 top-20 documents for a DETERMINISTIC query (the 3 globally
    -- most frequent tokens of length >= 4, ties alphabetical): Lucene's
    -- positive IDF ln((N-df+0.5)/(df+0.5)+1), k1={BM25_K1}, b={BM25_B}.
    -- Per-term contributions round to 9 decimals and sum as
    -- DECIMAL(20,9) — exact, order-free — so both engines produce the
    -- same total regardless of addition order; the output rounds to 6.
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents WHERE text IS NOT NULL
    ),
    q AS (
      SELECT term FROM (
        SELECT term, count(*) AS n FROM toks WHERE length(term) >= 4
        GROUP BY term ORDER BY n DESC, term LIMIT 3)
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl
           FROM documents WHERE text IS NOT NULL),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    dfq AS (SELECT tf.term, count(*) AS df
            FROM tf JOIN q ON tf.term = q.term GROUP BY 1),
    contrib AS (
      SELECT tf.doc_id,
             CAST(round(
               ln((stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
               * tf.tf * ({BM25_K1} + 1.0)
               / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * dl.dl / stats.avgdl)),
             9) AS DECIMAL(20,9)) AS c
      FROM tf JOIN dfq ON tf.term = dfq.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
    ),
    scored AS (SELECT doc_id, sum(c) AS s FROM contrib GROUP BY doc_id)
    SELECT doc_id, round(CAST(s AS DOUBLE), 6) AS score,
           CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, row_number() OVER (ORDER BY s DESC, doc_id) AS rk
          FROM scored)
    WHERE rk <= 20
    """,
)
def llm_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 TOP-K SEARCH over the documents corpus — the lexical
    retrieval scorer every training-data pipeline runs for corpus
    search, dedup-adjacent triage, and hard-negative mining. Query
    terms derive DETERMINISTICALLY from the corpus itself (the 3 most
    frequent length>=4 tokens, ties alphabetical), so the whole search
    replays exactly in the oracle; scoring is Lucene's positive-IDF
    BM25 with k1=1.2, b=0.75.

    Determinism discipline: per-(doc, term) contributions round to 9
    decimals and sum as DECIMAL(20,9) — an exact, addition-order-free
    aggregate (the FIXTURES.md money rule applied to relevance scores)
    — so Spark's partial/final aggregation and DuckDB's single-threaded
    sum cannot diverge; ln/division inputs are bitwise-identical exact
    doubles on both sides.

    Plan shape at 100 TB: ONE token-level hash aggregate over the
    corpus (tf per (doc, term)); everything else is broadcast-sized —
    the 3 query terms, their document frequencies, the one-row corpus
    stats — so scoring is a broadcast-join map over the tf rows of the
    query terms only, and the top-20 is a TakeOrdered, never a global
    sort materialization."""
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = d.select("doc_id", F.explode(_toks()).alias("term"))
    q = (
        toks.filter(F.length("term") >= 4)
        .groupBy("term")
        .agg(lcount("n"))
        .orderBy(F.desc("n"), "term")
        .limit(3)
        .select("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(lcount("tf"))
    dl = d.select("doc_id", F.size(_toks()).cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dfq = tf.join(F.broadcast(q), "term").groupBy("term").agg(lcount("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + BM25_K1 * (
        1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    contrib = (
        tf.join(F.broadcast(dfq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * F.col("tf") * (BM25_K1 + 1.0) / denom, 9)
            .cast("decimal(20,9)")
            .alias("c"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(F.sum("c").alias("s"))
    # GLOBAL top-k via orderBy().limit() -> TakeOrderedAndProject (each
    # map task keeps its local top-20, the driver merges k*partitions
    # rows — never a full sort). A row_number window CANNOT get this
    # pruning: InferWindowGroupLimit requires a non-empty partition
    # spec (VERDICT r8 follow-up, verified on 4.1: the global-window
    # variant plans Window + Filter over the whole scored corpus). The
    # rank window below runs over the 20 surviving rows only.
    top = scored.orderBy(F.desc("s"), "doc_id").limit(20)
    w = Window.orderBy(F.desc("s"), "doc_id")
    return top.select(
        "doc_id",
        F.round(F.col("s").cast("double"), 6).alias("score"),
        F.row_number().over(w).cast("long").alias("rk"),
    )

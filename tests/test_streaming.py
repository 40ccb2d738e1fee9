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


def test_stateful_sessionize_across_batches(spark, tmp_path):
    """applyInPandasWithState session tracking: a session spanning two
    micro-batches merges through the state store; closed sessions emit once."""
    import datetime

    in_dir = tmp_path / "ss_in"
    in_dir.mkdir()
    out = str(tmp_path / "ss_out")
    ckpt = str(tmp_path / "ss_ckpt")

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, minutes, user):
        return (eid, t0 + datetime.timedelta(minutes=minutes), user,
                "click", 1.0, "{}")

    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    # batch A: user 1 has two events 10 min apart (one open session)
    spark.createDataFrame([ev(1, 0, 1), ev(2, 10, 1)], schema) \
        .coalesce(1).write.parquet(str(in_dir / "a.parquet"))
    streaming.stateful_sessionize(spark, str(in_dir) + "/*", out, ckpt)

    # batch B: user 1 returns 2h later (closes session 1); user 2 appears
    spark.createDataFrame([ev(3, 130, 1), ev(4, 131, 2)], schema) \
        .coalesce(1).write.parquet(str(in_dir / "b.parquet"))
    streaming.stateful_sessionize(spark, str(in_dir) + "/*", out, ckpt)

    got = spark.read.parquet(out).collect()
    # exactly one CLOSED session: user 1's first (2 events, 10 min long) —
    # state carried it across the restart before the 2h gap closed it
    assert len(got) == 1
    row = got[0]
    assert row["user_id"] == 1
    assert row["n_events"] == 2
    assert row["session_end_s"] - row["session_start_s"] == 600


def test_stream_extract_batch_replay_idempotent(spark, pages_df, tmp_path):
    """foreachBatch is at-least-once: replaying a micro-batch (same
    batch_id) must NOT append duplicate rows — the batch_id-partitioned
    dynamic overwrite rewrites the partition instead."""
    input_path = str(tmp_path / "in")
    output_path = str(tmp_path / "out")
    checkpoint = str(tmp_path / "ckpt")
    pages_df.select("url", "warc_ts", "html", "text", "lang") \
        .write.parquet(input_path)

    streaming.stream_extract(spark, input_path, output_path, checkpoint,
                             num_partitions=4)
    n = pages_df.count()
    assert spark.read.parquet(output_path).count() == n

    # simulate a retried micro-batch: re-invoke the batch writer directly
    # with the SAME batch_id (0) and the same input
    from pdftotext_plus_plus_spark.engine import extract_pages
    from pyspark.sql import functions as F

    out = (extract_pages(spark.read.parquet(input_path), num_partitions=4)
           .withColumn("batch_id", F.lit(0)))
    (out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(output_path))
    replayed = spark.read.parquet(output_path)
    assert replayed.count() == n
    assert replayed.select("url").distinct().count() == n


def test_streaming_url_dedup_suppresses_and_corrects(spark, tmp_path):
    """Stateful URL dedup: duplicates within and across micro-batches are
    suppressed; an OUT-OF-ORDER earlier doc in a later batch emits a
    correction row, and min() over the sink equals the batch keep set."""
    import os

    in_dir = str(tmp_path / "url_in")
    out = str(tmp_path / "url_out")
    ckpt = str(tmp_path / "url_ckpt")
    os.makedirs(in_dir)

    # three single-file micro-batches; URL "u1" arrives as doc 30, then a
    # duplicate 40 (suppressed), then an out-of-order 10 (correction);
    # "u2" arrives once per batch (later ones suppressed)
    batches = [
        [(30, "u1"), (5, "u2")],
        [(40, "u1"), (6, "u2")],
        [(10, "u1"), (7, "u2"), (99, "u3")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, canon_url string") \
            .coalesce(1).write.parquet(f"{in_dir}/b{i}")
    # register each directory as a file; the source reads files one per
    # trigger in discovery order -> write them as three top-level files
    import glob
    import shutil
    files = []
    for i in range(3):
        part = glob.glob(f"{in_dir}/b{i}/part-*.parquet")[0]
        dst = f"{in_dir}/batch-{i}.parquet"
        shutil.copy(part, dst)
        files.append(dst)
        shutil.rmtree(f"{in_dir}/b{i}")

    streaming.streaming_url_dedup(spark, in_dir, out, ckpt)

    rows = spark.read.parquet(out).collect()
    emitted = {}
    for r in rows:
        emitted.setdefault(r["canon_url"], []).append(r["doc_id"])
    # micro-batch ARRIVAL ORDER is not guaranteed (file discovery order
    # varies under load), so assert the order-independent contract:
    # every emission is one of that URL's observed doc_ids, emissions
    # never repeat a value (suppression), at most one emission per
    # micro-batch, and min() over the sink == the global min per URL
    # (the decision rule).  With in-order discovery u1 emits [30, 10]
    # and u2 emits only [5]; out-of-order discovery may emit more
    # correction rows, never more than one per batch.
    seen = {"u1": {30, 40, 10}, "u2": {5, 6, 7}, "u3": {99}}
    for k, vals in emitted.items():
        assert set(vals) <= seen[k]
        assert len(vals) == len(set(vals))       # suppression: no repeats
        assert len(vals) <= len(batches)   # at most one emission per batch
    mins = {k: min(v) for k, v in emitted.items()}
    assert mins == {"u1": 10, "u2": 5, "u3": 99}

    # restart with the same checkpoint: no new files -> no new rows
    n_before = len(rows)
    streaming.streaming_url_dedup(spark, in_dir, out, ckpt)
    assert len(spark.read.parquet(out).collect()) == n_before

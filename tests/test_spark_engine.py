"""Spark-side tests: Arrow-batched extraction, salting, lineage, resume."""

import pytest
from pyspark.sql import functions as F

from pdftotext_plus_plus_spark import engine


def test_extract_matches_goldens(spark, pages_df):
    out = engine.extract_pages(pages_df, num_partitions=4)
    joined = out.join(pages_df.select("url", "golden_text"), "url")
    total = joined.count()
    matched = joined.filter(F.col("extracted_text") == F.col("golden_text")).count()
    assert total == 36
    assert matched == total
    assert joined.filter("parse_failure_code != 0").count() == 0


def test_extract_with_spans(spark, pages_df):
    out = engine.extract_pages(pages_df.limit(6), with_spans=True,
                               num_partitions=2)
    row = out.filter("n_blocks > 0").first()
    assert row is not None
    assert len(row["blocks"]) == row["n_blocks"]
    assert row["blocks"][0]["role"] == "paragraph"


def test_corrupt_payload_yields_failure_row(spark, pages_df):
    bad = spark.createDataFrame(
        [("bad://1", bytearray(b"not-a-payload")), ("bad://2", bytearray(b""))],
        "url string, html binary")
    out = engine.extract_pages(bad, salted=False)
    rows = {r["url"]: r for r in out.collect()}
    assert rows["bad://1"]["parse_failure_code"] != 0
    assert rows["bad://2"]["parse_failure_code"] != 0
    assert rows["bad://1"]["extracted_text"] == "\n"


def test_salted_repartition_spreads_jumbos(spark, pages_df):
    out = engine.extract_pages(pages_df, num_partitions=4)
    parts = out.select("part_id").distinct().count()
    assert parts >= 2  # the corpus spreads over multiple tasks


def test_lineage_frame(spark, pages_df):
    out = engine.extract_pages(pages_df, num_partitions=4)
    lineage = engine.lineage_frame(out).collect()
    assert sum(r["n_docs"] for r in lineage) == 36
    assert all(r["n_failures"] == 0 for r in lineage)
    assert all(r["bytes_in"] > 0 for r in lineage)


def test_run_job_resume(spark, pages_df, tmp_path):
    input_path = str(tmp_path / "pages")
    output_path = str(tmp_path / "out")
    pages_df.write.parquet(input_path)

    first = engine.run_job(spark, input_path, output_path, num_partitions=2)
    assert first["n_docs"] == 36
    assert first["n_failures"] == 0

    # re-run: everything already committed -> no duplicates (exact resume)
    second = engine.run_job(spark, input_path, output_path, num_partitions=2)
    assert second["n_docs"] == 36
    data = spark.read.parquet(first["output"])
    assert data.select("url").distinct().count() == 36
    assert data.count() == 36
    lineage = spark.read.parquet(first["lineage"])
    assert lineage.agg(F.sum("n_docs")).first()[0] == 36
    # manifest rows are stamped per run: the resumed re-run appended its
    # own run_id instead of double-counting the file set (VERDICT r5 #3)
    manifest = spark.read.parquet(first["input_manifest"])
    assert sorted(r["run_id"] for r in
                  manifest.select("run_id").distinct().collect()) == [0, 1]
    latest = manifest.filter(F.col("run_id") == 1)
    n_input_files = spark.read.parquet(input_path).select(
        F.input_file_name()).distinct().count()
    assert latest.count() == n_input_files
    assert latest.agg(F.sum("n_rows")).first()[0] == 36


def test_lineage_per_stage_timings(spark, pages_df):
    """with_timings=True adds a stage_ms map per row; lineage_frame rolls
    it up into one ms_<stage> column per pipeline stage — the distributed
    mirror of the reference's --print-running-times report
    (pdftotext++.cpp:765-784)."""
    from pdftotext_plus_plus_spark.kernel import STAGE_NAMES
    from pdftotext_plus_plus_spark.pipeline import (STAGE_DECODE,
                                                    STAGE_SERIALIZE)

    out = engine.extract_pages(pages_df, num_partitions=2,
                               with_timings=True)
    assert "stage_ms" in out.columns
    lineage = engine.lineage_frame(out)
    expected = [engine._stage_slug(n)
                for n in (STAGE_DECODE,) + STAGE_NAMES + (STAGE_SERIALIZE,)]
    assert set(expected) <= set(lineage.columns)
    rows = lineage.collect()
    totals = {c: sum(float(r[c]) for r in rows) for c in expected}
    # every stage ran on real documents: decode, word detection and
    # serialization must show nonzero total time
    assert totals["ms_parse_payload"] > 0
    assert totals["ms_detect_words"] > 0
    assert totals["ms_serialize"] > 0
    assert all(v >= 0 for v in totals.values())
    # stage sum is bounded by the per-doc wall total (stages are a
    # subset of each doc's timed extract() call)
    wall = sum(float(r["extract_ms_total"]) for r in rows)
    assert sum(totals.values()) <= wall * 1.05
    # without timings the lineage schema is unchanged (no ms_* columns)
    plain = engine.lineage_frame(
        engine.extract_pages(pages_df, num_partitions=2))
    assert not [c for c in plain.columns if c.startswith("ms_")]


def test_run_job_legacy_manifest_upgrade(spark, pages_df, tmp_path):
    """A pre-run_id manifest (no run_id column) is NEVER rewritten in
    place (Spark's overwrite deletes before it commits — a crash
    mid-upgrade would lose the whole lineage manifest, ADVICE r7): the
    new run APPENDS at run 1 and readers recover the legacy rows as run
    0 via coalesce under mergeSchema."""
    import glob

    input_path = str(tmp_path / "pages")
    output_path = str(tmp_path / "out")
    pages_df.write.parquet(input_path)
    files_path = output_path + "/lineage_files"
    # simulate a legacy manifest: same shape, run_id column absent
    (spark.read.parquet(input_path)
     .groupBy(F.input_file_name().alias("input_file"))
     .agg(F.count("*").alias("n_rows"),
          F.sum(F.length("html")).alias("payload_bytes"))
     .write.parquet(files_path))
    legacy_parts = sorted(glob.glob(files_path + "/part-*"))

    engine.run_job(spark, input_path, output_path, num_partitions=2)
    # crash-safety: the legacy part files are still on disk — nothing
    # was deleted at any point during the run
    assert set(legacy_parts) <= set(glob.glob(files_path + "/part-*"))
    manifest = (spark.read.option("mergeSchema", "true")
                .parquet(files_path))
    assert "run_id" in manifest.columns
    runs = manifest.select(
        F.coalesce("run_id", F.lit(0)).alias("run")).distinct()
    assert sorted(r["run"] for r in runs.collect()) == [0, 1]
    # and a THIRD run continues at 2 off the mixed directory
    engine.run_job(spark, input_path, output_path, num_partitions=2)
    manifest = (spark.read.option("mergeSchema", "true")
                .parquet(files_path))
    assert manifest.agg(
        F.max(F.coalesce("run_id", F.lit(0)))).first()[0] == 2


def test_run_job_empty_prior_manifest(spark, pages_df, tmp_path):
    """A manifest directory with zero rows (prior run over an empty
    input) must not crash the max(run_id)+1 probe (ADVICE r6)."""
    input_path = str(tmp_path / "pages")
    output_path = str(tmp_path / "out")
    pages_df.write.parquet(input_path)
    files_path = output_path + "/lineage_files"
    schema = ("input_file string, n_rows long, payload_bytes long, "
              "run_id int")
    spark.createDataFrame([], schema).write.parquet(files_path)

    result = engine.run_job(spark, input_path, output_path,
                            num_partitions=2)
    assert result["n_docs"] == 36
    manifest = spark.read.parquet(files_path)
    assert manifest.agg(F.max("run_id")).first()[0] == 0


def test_role_filter_through_engine(spark):
    """T17 at the Spark surface: roles= drops filtered blocks from the
    serialized text; jsonl_units= adds the JSONL column."""
    from dataclasses import replace

    from pyspark.sql import types as T

    from pdftotext_plus_plus_spark import fixtures
    from pdftotext_plus_plus_spark.config import DEFAULT_CONFIG

    rows = [r for r in fixtures.build_corpus(24)
            if r["family"] == "headings"][:2]
    schema = T.StructType([T.StructField("url", T.StringType()),
                           T.StructField("html", T.BinaryType())])
    df = spark.createDataFrame([(r["url"], r["html"]) for r in rows], schema)
    cfg = replace(DEFAULT_CONFIG, skip_semantic_roles=False)

    full = engine.extract_pages(df, config=cfg, salted=False).collect()
    only_para = engine.extract_pages(df, config=cfg, salted=False,
                                     roles={"paragraph"},
                                     jsonl_units=("blocks",)).collect()
    by_url_full = {r["url"]: r for r in full}
    for r in only_para:
        assert len(r["extracted_text"]) < len(
            by_url_full[r["url"]]["extracted_text"])
        # jsonl column present and the filtered role absent from it
        assert '"role": "title"' not in r["jsonl"]
        assert '"role": "paragraph"' in r["jsonl"]

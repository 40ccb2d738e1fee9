"""Spark integration: Arrow-batched extraction over a pages DataFrame.

Spark lifecycle (SURVEY.md §3.4):

    read pages table (url, warc_ts, html, text, lang)
      -> salted repartition by byte-size bucket of `html`   (skew defusal)
      -> mapInArrow kernel per record batch                 (stages 2-13)
      -> output DataFrame (extracted_text, span structs, failure codes,
         per-task lineage columns)
      -> parquet/Iceberg snapshot + lineage rows; exact resume by anti-join

Design notes for 100 TB scale:
* Only ``url`` and ``html`` are read by the kernel — column pruning reaches
  the scan because we select before the exchange.
* The repartition key is (size_bucket, salt): documents of similar byte size
  co-locate, and the salt spreads each bucket over many partitions so a tail
  of jumbo documents cannot serialize into one straggler task.
* The kernel is embarrassingly parallel per document — no shuffle after the
  single repartition exchange; output writes stream per task.
* Failures never abort a partition: corrupt payloads yield a row with
  ``parse_failure_code`` != 0 (cf. the reference's isOk() check,
  /root/reference/src/PdfToTextPlusPlus.cpp:88-90).
"""

from __future__ import annotations

import time
from typing import Iterator, Optional

import pyarrow as pa

from .config import DEFAULT_CONFIG, PipelineConfig
from .pipeline import extract

# ---------------------------------------------------------------------------
# output schemas
# ---------------------------------------------------------------------------

BLOCK_SPAN_TYPE = pa.struct([
    ("page", pa.int32()),
    ("rank", pa.int32()),
    ("min_x", pa.float64()),
    ("min_y", pa.float64()),
    ("max_x", pa.float64()),
    ("max_y", pa.float64()),
    ("font", pa.string()),
    ("font_size", pa.float64()),
    ("text", pa.string()),
    ("role", pa.string()),
])


def _arrow_schema(with_spans: bool, with_jsonl: bool = False,
                  with_svg: bool = False, with_pdf: bool = False,
                  with_timings: bool = False) -> pa.Schema:
    fields = [
        ("url", pa.string()),
        ("extracted_text", pa.string()),
        ("extracted_text_extended", pa.string()),
        ("parse_failure_code", pa.int32()),
        ("n_pages", pa.int32()),
        ("n_chars", pa.int32()),
        ("n_words", pa.int32()),
        ("n_lines", pa.int32()),
        ("n_blocks", pa.int32()),
        ("payload_bytes", pa.int64()),
        ("part_id", pa.int32()),
        ("extract_ms", pa.float64()),
    ]
    if with_spans:
        fields.append(("blocks", pa.list_(BLOCK_SPAN_TYPE)))
    if with_jsonl:
        fields.append(("jsonl", pa.string()))
    if with_svg:
        fields.append(("svg", pa.string()))
    if with_pdf:
        fields.append(("pdf", pa.string()))
    if with_timings:
        fields.append(("stage_ms", pa.map_(pa.string(), pa.float64())))
    return pa.schema(fields)


def _spark_schema_ddl(with_spans: bool, with_jsonl: bool = False,
                      with_svg: bool = False, with_pdf: bool = False,
                      with_timings: bool = False) -> str:
    ddl = ("url string, extracted_text string, extracted_text_extended string, "
           "parse_failure_code int, n_pages int, n_chars int, n_words int, "
           "n_lines int, n_blocks int, payload_bytes bigint, part_id int, "
           "extract_ms double")
    if with_spans:
        ddl += (", blocks array<struct<page: int, rank: int, min_x: double, "
                "min_y: double, max_x: double, max_y: double, font: string, "
                "font_size: double, text: string, role: string>>")
    if with_jsonl:
        ddl += ", jsonl string"
    if with_svg:
        ddl += ", svg string"
    if with_pdf:
        ddl += ", pdf string"
    if with_timings:
        ddl += ", stage_ms map<string,double>"
    return ddl


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _make_kernel(config: PipelineConfig, with_spans: bool,
                 roles=None, jsonl_units=None, svg_units=None,
                 pdf_units=None, with_timings: bool = False):
    schema = _arrow_schema(with_spans, bool(jsonl_units), bool(svg_units),
                           bool(pdf_units), with_timings)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        try:
            from pyspark import TaskContext
            ctx = TaskContext.get()
            part_id = ctx.partitionId() if ctx is not None else -1
        except Exception:
            part_id = -1

        for batch in batches:
            urls = batch.column("url").to_pylist()
            htmls = batch.column("html").to_pylist()
            n = len(urls)
            texts, texts_ext = [], []
            codes, pages, chars, words, lines, blocks_n = [], [], [], [], [], []
            sizes, times = [], []
            spans = [] if with_spans else None
            jsonls = [] if jsonl_units else None
            svgs = [] if svg_units else None
            pdfs = [] if pdf_units else None
            stage_maps = [] if with_timings else None
            for i in range(n):
                t0 = time.perf_counter()
                res = extract(htmls[i], config, with_spans=with_spans,
                              with_timings=with_timings,
                              roles=roles, jsonl_units=jsonl_units,
                              svg_units=svg_units, pdf_units=pdf_units)
                dt = (time.perf_counter() - t0) * 1000.0
                texts.append(res.extracted_text)
                texts_ext.append(res.extracted_text_extended)
                codes.append(res.parse_failure_code)
                pages.append(res.n_pages)
                chars.append(res.n_chars)
                words.append(res.n_words)
                lines.append(res.n_lines)
                blocks_n.append(res.n_blocks)
                sizes.append(len(htmls[i]) if htmls[i] is not None else 0)
                times.append(dt)
                if with_spans:
                    spans.append([{
                        "page": b.page, "rank": b.rank, "min_x": b.min_x,
                        "min_y": b.min_y, "max_x": b.max_x, "max_y": b.max_y,
                        "font": b.font, "font_size": b.font_size,
                        "text": b.text, "role": b.role} for b in res.blocks])
                if jsonl_units:
                    jsonls.append(res.jsonl)
                if svg_units:
                    svgs.append(res.svg)
                if pdf_units:
                    pdfs.append(res.pdf)
                if with_timings:
                    stage_maps.append(list(res.timings_ms.items()))

            arrays = [
                pa.array(urls, pa.string()),
                pa.array(texts, pa.string()),
                pa.array(texts_ext, pa.string()),
                pa.array(codes, pa.int32()),
                pa.array(pages, pa.int32()),
                pa.array(chars, pa.int32()),
                pa.array(words, pa.int32()),
                pa.array(lines, pa.int32()),
                pa.array(blocks_n, pa.int32()),
                pa.array(sizes, pa.int64()),
                pa.array([part_id] * n, pa.int32()),
                pa.array(times, pa.float64()),
            ]
            if with_spans:
                arrays.append(pa.array(spans, pa.list_(BLOCK_SPAN_TYPE)))
            if jsonl_units:
                arrays.append(pa.array(jsonls, pa.string()))
            if svg_units:
                arrays.append(pa.array(svgs, pa.string()))
            if pdf_units:
                arrays.append(pa.array(pdfs, pa.string()))
            if with_timings:
                arrays.append(pa.array(
                    stage_maps, pa.map_(pa.string(), pa.float64())))
            yield pa.RecordBatch.from_arrays(arrays, schema=schema)

    return kernel


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def salted_repartition(df, num_partitions: Optional[int] = None,
                       salt_buckets: int = 1024):
    """Repartition by (payload-size bucket, salt of url).

    Documents land in log2-size buckets; the salt spreads each bucket across
    partitions so jumbo documents cannot pile into one task (north-rule skew
    handling).  At 100 TB this is the only shuffle in the job.

    ``salt_buckets`` must be >> the task count: hash partitioning lumps
    whole (bucket, salt) KEYS into tasks, so each key's population rides
    together — with 64 salts a 10x bench corpus put ~9 jumbo documents in
    every jumbo-bucket key and the busiest task ran 3.8x the median; at
    1024 salts the same corpus measured 2.1x and -29% wall (round-6
    straggler probe, BASELINE.md).  Keys are free; 1024 stays tiny vs the
    shuffle itself at any scale.
    """
    from pyspark.sql import functions as F

    size_bucket = F.ceil(F.log2(F.length(F.col("html")) + F.lit(2)))
    salt = F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets))
    df = df.withColumn("_size_bucket", size_bucket).withColumn("_salt", salt)
    if num_partitions:
        df = df.repartition(num_partitions, "_size_bucket", "_salt")
    else:
        df = df.repartition("_size_bucket", "_salt")
    return df.drop("_size_bucket", "_salt")


def extract_pages(df, config: PipelineConfig = DEFAULT_CONFIG,
                  with_spans: bool = False,
                  num_partitions: Optional[int] = None,
                  salted: bool = True,
                  roles=None,
                  jsonl_units=None,
                  svg_units=None,
                  pdf_units=None,
                  with_timings: bool = False):
    """pages DataFrame -> extraction DataFrame (one row per url).

    ``roles`` / ``jsonl_units`` / ``svg_units`` / ``pdf_units`` mirror the
    reference CLI's --role / --type / --visualize-* options
    (serializer-level filtering, the JSONL sink, and the S8 visualization
    sink in its SVG and annotated-PDF forms).  ``with_timings`` adds a
    per-row ``stage_ms`` map mirroring the reference's
    --print-running-times stage report (pdftotext++.cpp:765-784), which
    :func:`lineage_frame` rolls up into per-stage columns."""
    projected = df.select("url", "html")  # column pruning reaches the scan
    if salted:
        projected = salted_repartition(projected, num_partitions)
    elif num_partitions:
        projected = projected.repartition(num_partitions)
    roles = frozenset(roles) if roles else None
    jsonl_units = tuple(jsonl_units) if jsonl_units else None
    svg_units = tuple(svg_units) if svg_units else None
    pdf_units = tuple(pdf_units) if pdf_units else None
    return projected.mapInArrow(
        _make_kernel(config, with_spans, roles, jsonl_units, svg_units,
                     pdf_units, with_timings),
        _spark_schema_ddl(with_spans, bool(jsonl_units), bool(svg_units),
                          bool(pdf_units), with_timings))


def _stage_slug(name: str) -> str:
    return "ms_" + "".join(
        c if c.isalnum() else "_" for c in name.lower()).strip("_")


def lineage_frame(result_df):
    """Per-task lineage/metrics rows (north rule): partition id, row counts,
    failure counts, byte and time totals — written beside each snapshot.

    When the result carries ``stage_ms`` (extract_pages
    ``with_timings=True``), per-stage total columns are added — the
    distributed mirror of the reference's --print-running-times report
    (/root/reference/src/pdftotext++.cpp:765-784): one ``ms_<stage>``
    column per pipeline stage, summed per task.  The rollup is a plain
    projection of map lookups inside the SAME single hash aggregate —
    no extra shuffle, no explode."""
    from pyspark.sql import functions as F

    from .kernel import STAGE_NAMES
    from .pipeline import STAGE_DECODE, STAGE_SERIALIZE

    aggs = [F.count("*").alias("n_docs"),
            F.sum((F.col("parse_failure_code") != 0).cast("int"))
            .alias("n_failures"),
            F.sum("payload_bytes").alias("bytes_in"),
            F.sum("extract_ms").alias("extract_ms_total"),
            F.max("extract_ms").alias("max_doc_ms"),  # straggler signal
            F.min("url").alias("min_url"),
            F.max("url").alias("max_url")]
    if "stage_ms" in result_df.columns:
        # try_element_at, NOT element_at: under ANSI mode element_at
        # throws on a missing map key, and failure rows record only the
        # decode stage
        for name in (STAGE_DECODE,) + STAGE_NAMES + (STAGE_SERIALIZE,):
            aggs.append(
                F.sum(F.coalesce(F.try_element_at("stage_ms", F.lit(name)),
                                 F.lit(0.0))).alias(_stage_slug(name)))
    return result_df.groupBy("part_id").agg(*aggs)


def run_job(spark, input_path: str, output_path: str,
            config: PipelineConfig = DEFAULT_CONFIG,
            with_spans: bool = False,
            num_partitions: Optional[int] = None,
            resume: bool = True,
            roles=None,
            jsonl_units=None,
            with_timings: bool = True) -> dict:
    """Batch extraction job with snapshot + lineage + exact resume.

    ``with_timings`` (default on) stores the per-row ``stage_ms`` map in
    the snapshot and rolls it up into per-stage ``ms_*`` lineage columns
    — the distributed --print-running-times report.  ~300 bytes/row
    against multi-KB documents; pass False to shed it.

    Resume semantics: rows whose ``url`` already exists in the committed
    output are skipped (anti-join), so a re-run after a mid-job failure
    processes only the remainder — the parquet/Iceberg commit is the
    checkpoint boundary.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    pages = spark.read.parquet(input_path)
    data_path = output_path.rstrip("/") + "/data"
    lineage_path = output_path.rstrip("/") + "/lineage"
    files_path = output_path.rstrip("/") + "/lineage_files"

    # input-file manifest (north rule: lineage records the input files);
    # computed on the raw scan, where file provenance still exists.  Each
    # run_job invocation appends under its own run_id — a resumed job adds
    # a NEW run's rows instead of double-counting the file set (the current
    # inventory is `WHERE run_id = max(run_id)`); the max() probe is an
    # O(1)-result scalar job over manifest metadata, not data
    try:
        # mergeSchema: a manifest touched by a pre-run_id release holds a
        # mix of stamped and legacy part files; the merged schema surfaces
        # run_id with NULL on the legacy rows, which read as run 0
        prev_manifest = (spark.read.option("mergeSchema", "true")
                         .parquet(files_path))
        if "run_id" in prev_manifest.columns:
            prev = prev_manifest.agg(
                F.max(F.coalesce("run_id", F.lit(0)))).first()[0]
            # prev is None when the manifest exists but has zero rows
            # (a prior run over an empty input dir)
            run_id = 0 if prev is None else prev + 1
        else:
            # manifest written ENTIRELY before run_id stamping: its rows
            # are implicitly run 0, so this run continues at 1 — by
            # APPENDING, never by rewriting the directory.  Spark's
            # overwrite deletes before it commits, so an in-place upgrade
            # crash could lose the whole lineage manifest; append-only
            # keeps every committed byte, and readers recover the legacy
            # rows' run via coalesce(run_id, 0) under mergeSchema.
            run_id = 1
    except AnalysisException:
        run_id = 0
    manifest = (pages
                .groupBy(F.input_file_name().alias("input_file"))
                .agg(F.count("*").alias("n_rows"),
                     F.sum(F.length("html")).alias("payload_bytes"))
                .withColumn("run_id", F.lit(run_id)))
    manifest.write.mode("append").parquet(files_path)

    if resume:
        try:
            done = spark.read.parquet(data_path).select("url")
            pages = pages.join(done, "url", "left_anti")
        except AnalysisException:
            pass  # first run: no committed snapshot yet

    result = extract_pages(pages, config, with_spans, num_partitions,
                           roles=roles, jsonl_units=jsonl_units,
                           with_timings=with_timings)
    # partitioned snapshot: stable hash bucket of url -> downstream jobs
    # prune by bucket (the parquet stand-in for an Iceberg partition spec)
    result = result.withColumn(
        "out_bucket", F.pmod(F.xxhash64("url"), F.lit(16)).cast("int"))
    result.write.mode("append").partitionBy("out_bucket").parquet(data_path)

    # mergeSchema: a resumed job over a pre-stage_ms snapshot reads a
    # mixed directory; old rows surface a NULL map (element_at -> NULL ->
    # coalesce 0.0 in the stage rollup) instead of hiding the column
    committed = spark.read.option("mergeSchema", "true").parquet(data_path)
    lineage = lineage_frame(committed)
    lineage.write.mode("overwrite").parquet(lineage_path)

    n_done = committed.count()
    n_failed = committed.filter("parse_failure_code != 0").count()
    return {"output": data_path, "lineage": lineage_path,
            "input_manifest": files_path,
            "n_docs": n_done, "n_failures": n_failed}


def build_session(app_name: str = "pdftotext_plus_plus_spark",
                  cpus: Optional[int] = None,
                  shuffle_partitions: Optional[int] = None,
                  driver_memory: str = "8g"):
    """Local session tuned for the extraction job; on a real cluster the
    same settings arrive via spark-submit --conf."""
    from pyspark.sql import SparkSession

    master = "local[%s]" % (cpus if cpus else "*")
    parts = shuffle_partitions or (cpus or 32)
    return (SparkSession.builder
            .master(master)
            .appName(app_name)
            .config("spark.sql.shuffle.partitions", str(parts))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
            .config("spark.driver.memory", driver_memory)
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
            .getOrCreate())

"""Structured Streaming ingestion for the extraction pipeline.

The per-document kernel is stateless, so the streaming form is a file-source
stream driven through ``foreachBatch`` — each micro-batch runs the exact
batch path (:func:`~.engine.extract_pages`) and appends to the output
snapshot, with Spark's checkpoint directory giving exactly-once micro-batch
tracking on top of the batch layer's per-url resume.

At the 10^12-row tier this is the continuous-ingest form: WARC drops land in
the input directory, each micro-batch is one salted extraction pass.
"""

from __future__ import annotations

from typing import Optional

from .config import DEFAULT_CONFIG, PipelineConfig
from .engine import extract_pages


def stream_extract(spark, input_path: str, output_path: str,
                   checkpoint_path: str, schema=None,
                   config: PipelineConfig = DEFAULT_CONFIG,
                   num_partitions: Optional[int] = None,
                   available_now: bool = True):
    """Start (and by default drain) a file-source extraction stream.

    Returns the StreamingQuery; with ``available_now`` the call blocks until
    all currently-available input is processed (the test/batch-drain mode).
    """
    if schema is None:
        schema = ("url string, warc_ts timestamp, html binary, "
                  "text string, lang string")

    stream = (spark.readStream
              .schema(schema)
              .format("parquet")
              .load(input_path))

    def process_batch(batch_df, batch_id: int) -> None:
        out = extract_pages(batch_df, config=config,
                            num_partitions=num_partitions)
        out.write.mode("append").parquet(output_path)

    writer = (stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
        return query
    return writer.start()

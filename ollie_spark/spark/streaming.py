"""Structured Streaming ingestion variant.

The north_rule pipeline is resumable *batch* (checkpoint/resume via the
bucket manifest in materialize.py) — but a continuously-arriving corpus
can feed the same extraction with Structured Streaming:

- ``stream_extract``: file-source stream of documents parquet ->
  foreachBatch(run_extraction) -> parquet partitioned by batch_id with
  dynamic partition overwrite.  Each micro-batch reuses the exact batch
  pipeline (same UDFs, same scoring plan), so streaming and batch
  cannot drift; exactly-once = streaming checkpoint (batch replay
  detection) + the idempotent per-batch_id partition overwrite (a batch
  replayed after a crash-before-checkpoint rewrites its own partition
  instead of appending duplicates).
- ``windowed_mention_rate``: event-time windowed aggregation with a
  watermark — the late-data-tolerant monitoring stream (mentions/min
  per relation) the reference has no analog for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .corpus import DOCUMENTS_SCHEMA
from .pipeline import run_extraction


def stream_documents(spark: SparkSession, input_dir: str,
                     max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream over the documents table directory."""
    return (spark.readStream
            .schema(DOCUMENTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir))


def write_mention_batch(mentions: DataFrame, batch_id: int,
                        output_dir: str) -> None:
    """Idempotent micro-batch sink: the batch's rows land in partition
    ``batch_id=<n>`` via dynamic partition overwrite, so replaying a
    batch (crash before the streaming checkpoint committed) rewrites
    that partition instead of appending duplicate mention rows."""
    (mentions.withColumn("batch_id", F.lit(batch_id))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id")
     .parquet(output_dir))


def stream_extract(spark: SparkSession, input_dir: str,
                   output_dir: str, checkpoint_dir: str,
                   conf_threshold: float = 0.0):
    """documents stream -> mentions parquet, one micro-batch at a time.

    foreachBatch reuses the batch extraction pipeline verbatim; the
    streaming checkpoint detects replays and the batch_id-partitioned
    dynamic overwrite makes them idempotent (see write_mention_batch).
    Returns the StreamingQuery (caller awaits/stops it)."""
    docs = stream_documents(spark, input_dir)

    def process(batch_df: DataFrame, batch_id: int):
        write_mention_batch(
            run_extraction(batch_df, conf_threshold=conf_threshold),
            batch_id, output_dir)

    return (docs.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def windowed_mention_rate(mentions_stream: DataFrame,
                          event_time_col: str = "event_time",
                          window: str = "1 minute",
                          watermark: str = "2 minutes") -> DataFrame:
    """Watermarked event-time windowed aggregation over a mention
    stream: mentions per (window, rel) with late rows accepted up to
    the watermark and older ones dropped (state is bounded)."""
    return (mentions_stream
            .withWatermark(event_time_col, watermark)
            .groupBy(F.window(F.col(event_time_col), window)
                     .alias("win"),
                     F.col("rel_text"))
            .agg(F.count("*").alias("n_mentions"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "rel_text", "n_mentions"))

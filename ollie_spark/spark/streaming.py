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


def dedup_documents_stream(docs_stream: DataFrame,
                           id_col: str = "doc_id",
                           ts_col: str = "ingest_time",
                           watermark: str = "10 minutes") -> DataFrame:
    """Cross-batch document dedup for re-delivering sources (an
    at-least-once feed re-sends docs after retries/failover): the
    first-seen row per ``id_col`` is emitted immediately, any
    re-delivery within the watermark is suppressed, and the per-id
    state is EVICTED once the watermark passes — bounded state at any
    stream length, which a plain streaming ``dropDuplicates`` (keys
    kept forever) does not give at 10^12-doc scale."""
    return (docs_stream.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark([id_col]))


def source_running_stats(docs_stream: DataFrame,
                         source_col: str = "source",
                         text_col: str = "text") -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    cumulative per-source ingest stats — docs and chars seen so far —
    re-emitted on every micro-batch that touches the source.

    This is the pattern slot for any custom stateful op Spark lacks
    natively (running corpus counters, per-source quota cutoffs,
    streaming near-dup against a stored fingerprint set): state is
    partitioned by group key across executors, Arrow-batched into
    pandas, and checkpointed with the query.  Timeout is NoTimeout
    here because corpus sources are few and long-lived; per-entity
    keys at scale would set a ProcessingTimeTimeout to evict idle
    state."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{source_col} string, n_docs long, n_chars long"
    state_schema = "n_docs long, n_chars long"

    def update(key, pdfs, state):
        n_docs, n_chars = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n_docs += len(pdf)
            n_chars += int(pdf[text_col].str.len().sum())
        state.update((n_docs, n_chars))
        yield pd.DataFrame([{source_col: key[0], "n_docs": n_docs,
                             "n_chars": n_chars}])

    return (docs_stream.groupBy(source_col)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update",
                                    GroupStateTimeout.NoTimeout))


def curation_filter_stream(docs_stream: DataFrame,
                           text_col: str = "text") -> DataFrame:
    """At-ingest curation pre-filter: the curation funnel's map
    stages (language-ID, quality, repetition keep rules) applied to
    the document stream via the SAME shared predicates the batch
    funnel uses (textops._curation_predicates), so junk never lands
    in the corpus store.  Stateless — no watermark, no state store,
    pure per-row projection+filter at any stream length; the funnel's
    JOIN stages (exact dedup, near-dup prune, decontamination,
    sampling) remain batch jobs over the materialized store, which is
    where they belong (they need corpus-wide visibility)."""
    from ollie_spark.spark.textops import _curation_predicates

    keep_lang, keep_quality, keep_rep = _curation_predicates(text_col)
    return docs_stream.where(keep_lang & keep_quality & keep_rep)


def link_mention_batch(batch_df: DataFrame, batch_id: int,
                       map_dir: str, linked_dir: str,
                       banded_state: dict | None = None) -> None:
    """One micro-batch of continuous KG maintenance: incrementally
    link ``batch_df`` against the accumulated canonical map and write
    (a) the map DELTA and (b) the linked mentions, each into a
    ``batch_id=<n>`` partition via dynamic overwrite.

    Replay determinism: the map is read EXCLUDING this batch's own
    partition, so a batch replayed after a crash (delta written,
    checkpoint not committed) sees byte-identical input state — and
    because novel node ids are content-derived min-norm labels, the
    rewritten partitions are identical to the first attempt's.  The
    map read is a spark.read probe (AnalysisException = no map yet),
    the object-store-safe spelling from materialize.StageWriter."""
    from pyspark.errors import AnalysisException

    from .linking import band_entities, incremental_link
    spark = batch_df.sparkSession
    try:
        existing = (spark.read.parquet(map_dir)
                    .where(F.col("batch_id") != batch_id)
                    .select("norm", "node_id"))
    except AnalysisException:
        existing = spark.createDataFrame([], "norm string, node_id string")
    caches = []
    pre_banded = banded_state.get("banded") if banded_state else None
    if banded_state is not None and pre_banded is None:
        # seed the across-batch band frame ONCE, before the link call
        # (incremental_link then skips its own banding of the map —
        # seeding after the call would band the same map twice).
        # localCheckpoint, not persist: the frame is extended
        # iteratively batch over batch, so its lineage must be
        # TRUNCATED or the plan grows per batch and a lost block
        # recomputes through every previous batch (the CC iterative
        # rule; reliable cluster spelling is .checkpoint())
        pre_banded = band_entities(existing).localCheckpoint()
        banded_state["banded"] = pre_banded
    linked, delta = incremental_link(batch_df, existing,
                                     caches_out=caches,
                                     existing_banded=pre_banded)
    (delta.withColumn("batch_id", F.lit(batch_id))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id").parquet(map_dir))
    write_mention_batch(linked, batch_id, linked_dir)
    if banded_state is not None:
        # extend the across-batch band frame BEFORE releasing this
        # batch's caches (the extension must not depend on the
        # about-to-be-released delta lineage): next batch links
        # without re-banding the whole map.  localCheckpoint per
        # extension keeps the iterative lineage TRUNCATED (see the
        # seed comment above); restart-safe — after a crash the state
        # is empty and the next first batch re-seeds from the map it
        # reads, which excludes its own partition.
        prev = banded_state["banded"]
        banded_state["banded"] = (
            prev.unionByName(band_entities(delta)).localCheckpoint())
        prev.unpersist()
    # both outputs are on disk: release this batch's materialized
    # frames so a long-running stream doesn't stack per-batch caches
    for c in caches:
        c.unpersist()


def stream_link(spark: SparkSession, input_dir: str, schema: str,
                map_dir: str, linked_dir: str, checkpoint_dir: str,
                max_files_per_trigger: int = 4):
    """Continuous KG maintenance: a mention stream incrementally
    linked against an accumulating canonical map (stream_extract's
    output directory is a valid ``input_dir``).  Per micro-batch the
    exact/attach/novel tiers of ``linking.incremental_link`` apply,
    so node ids the downstream KG references never churn as the
    stream grows; exactly-once = streaming checkpoint + the
    batch_id-partitioned dynamic overwrites (see link_mention_batch).
    Returns the StreamingQuery (caller awaits/stops it)."""
    ments = (spark.readStream.schema(schema)
             .option("maxFilesPerTrigger", max_files_per_trigger)
             .parquet(input_dir))
    banded_state: dict = {}  # across-batch banded-map amortization

    def process(batch_df: DataFrame, batch_id: int):
        link_mention_batch(batch_df, batch_id, map_dir, linked_dir,
                           banded_state=banded_state)

    return (ments.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def session_stats_stream(events_stream: DataFrame,
                         user_col: str = "user_id",
                         ts_col: str = "ts",
                         value_col: str = "value",
                         gap_minutes: int | None = None,
                         watermark: str = "10 minutes") -> DataFrame:
    """Streaming sessionization with a watermark, so per-user
    open-session state is BOUNDED: a session's state is emitted
    exactly once and evicted when the watermark passes its end
    (append mode), and events later than the watermark are dropped
    instead of reopening it.  Sessions spanning micro-batches merge
    in the state store — the property a per-batch foreachBatch
    sessionizer cannot give.

    DELEGATES to ``temporal.session_stats`` (a pure DataFrame
    transform, equally valid on a stream) after attaching the
    watermark — batch q40 and the stream are ONE spelling, not two
    copies held together by a test."""
    from .temporal import session_stats
    return session_stats(
        events_stream.withWatermark(ts_col, watermark),
        user_col=user_col, ts_col=ts_col, value_col=value_col,
        **({} if gap_minutes is None else {"gap_minutes": gap_minutes}))

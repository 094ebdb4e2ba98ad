"""Structured Streaming over the message log — the reference's roadmap made
real (ref:docs/GUIDE.md:461-465 durable consumers/checkpoints; :479-482 live
tail; :484-488 parallel scanning). The reference implements none of these;
Spark gives them natively:

- ``readStream`` + checkpointLocation = durable consumer position
  (at-least-once delivery resumes from the checkpoint, like a JetStream
  durable consumer);
- watermark + windowed aggregation = late-data-tolerant rollups over
  ``ts_nats``;
- partitioned file/DataSource streams = the parallel scan.

The stream carries the same 5-column message schema as the batch scan, so
every extraction/filter operator composes unchanged on either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from duckdb_nats_jetstream_spark.functions.json_extract import json_extract

def _events_raw_ts_type(log_dir: str) -> T.DataType:
    """Inspect one parquet file to learn the stored ts flavor — streaming
    reads require a declared schema, and the driver's writer has produced
    both TIMESTAMP(NANOS) (Spark: long under nanosAsLong) and timestamp[us]
    naive (Spark: TIMESTAMP_NTZ). Declaring the wrong one fails the scan,
    so an EMPTY directory is an error, not a guess (r09 review: guessing
    LongType on an empty live-tail dir made the first real micro-batch
    fail with a parquet conversion error once timestamp-flavored files
    appeared; pass ``ts_type`` to :func:`message_stream` to start a
    stream ahead of its first file)."""
    import glob
    import os

    import pyarrow.parquet as pq

    candidates = sorted(glob.glob(os.path.join(log_dir, "*.parquet")))
    if not candidates:
        raise ValueError(
            f"message_stream: no *.parquet in {log_dir!r} to infer the ts "
            "flavor from — pass ts_type= explicitly (LongType for "
            "ns-as-long logs, TimestampNTZType/TimestampType for "
            "timestamp-encoded logs) to tail a not-yet-written directory"
        )
    t = pq.read_schema(candidates[0]).field("ts").type
    s = str(t)
    if s.startswith("timestamp[ns") or not s.startswith("timestamp"):
        return T.LongType()  # ns-as-long
    if getattr(t, "tz", None) is None:
        return T.TimestampNTZType()
    return T.TimestampType()


def _events_raw_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def message_stream(
    spark: SparkSession,
    log_dir: str,
    stream: str = "events",
    *,
    subject: str | None = None,
    json_fields: list[str] | None = None,
    max_files_per_trigger: int | None = None,
    ts_type: T.DataType | None = None,
) -> DataFrame:
    """``readStream`` over a directory of parquet message-log files,
    projected to the message schema. New files appearing in ``log_dir`` are
    new message batches (the live-tail model). ``ts_nats`` is canonical
    TimestampType whatever the stored flavor (schema.py BASE_FIELDS).

    ``ts_type`` overrides the file-sniffed flavor — required to tail a
    directory that has no files yet. NB: the ns-as-long path sets the
    SESSION conf ``spark.sql.legacy.parquet.nanosAsLong`` (Spark offers
    no per-read form); it is set only when actually needed so a
    timestamp-flavored stream doesn't silently change how unrelated
    TIMESTAMP(NANOS) reads in the same session decode (r09 review)."""
    if ts_type is None:
        ts_type = _events_raw_ts_type(log_dir)
    if isinstance(ts_type, T.LongType):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(_events_raw_schema(ts_type)).format("parquet")
    if max_files_per_trigger is not None:
        # bounds each micro-batch (availableNow honors it too) — the knob
        # tests use to force multi-batch state round-trips
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.load(log_dir)
    if isinstance(ts_type, T.LongType):
        ts_nats = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        ts_nats = F.col("ts").cast("timestamp")
    # the shared events→message mapping — ONE definition with the batch
    # scan and the oracle CTE (see message_scan.message_projection)
    from duckdb_nats_jetstream_spark.sources.message_scan import (
        message_projection,
    )

    df = raw.select(*message_projection(stream, ts_nats))
    if subject is not None:
        df = df.filter(F.col("subject").contains(subject))
    if json_fields:
        df = json_extract(df, json_fields, payload_col="payload")
    return df


def windowed_message_counts(
    stream_df: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window per-subject counts with late-data watermark — the
    stateful rollup the reference's roadmap gestures at."""
    return (
        stream_df.withWatermark("ts_nats", watermark)
        .groupBy(F.window("ts_nats", window).alias("win"), F.col("subject"))
        .agg(
            F.count("*").alias("n_msgs"),
            F.max("seq").alias("max_seq"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "subject",
            "n_msgs",
            "max_seq",
        )
    )


def run_to_completion(stream_df: DataFrame, checkpoint_dir: str, mode: str = "append"):
    """Drain all currently-available input through a memory sink
    (trigger=availableNow) and return the collected rows. Test/utility
    harness for the streaming path."""
    import uuid

    name = "sink_" + uuid.uuid4().hex[:8]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def continuous_rollup_sink(
    windowed_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    partition_col: str = "window_start",
    key_cols: tuple[str, ...] = ("subject",),
):
    """Continuous-aggregate maintenance (the hypertable-rollup pattern):
    keep a queryable partitioned parquet table of windowed aggregates in
    sync with the stream.

    Update output mode re-emits a group's row every time late data lands in
    it; each micro-batch therefore *dynamically overwrites* exactly the
    partitions it touched — newer values replace older ones, and a replayed
    batch rewrites identical partitions, so the table is correct under both
    late data and at-least-once redelivery. The overwrite granularity MUST
    be the full grouping key (window + ``key_cols``), not just the window:
    update mode only re-emits changed keys, and overwriting a whole window
    partition would silently drop that window's unchanged keys. At scale
    this is one small file per touched group per batch, never a table
    rewrite.
    """

    if "__p" in windowed_df.columns:
        # withColumn would silently REPLACE the user's column with the
        # derived partition key and read_rollup would then drop it — the
        # one collision the reserved internal name can't dodge fails loud
        raise ValueError(
            "continuous_rollup_sink: '__p' is a reserved internal column; "
            "alias it before sinking"
        )

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        (
            batch_df.withColumn("__p", F.col(partition_col).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__p", *key_cols)
            .parquet(out_dir)
        )

    return (
        windowed_df.writeStream.foreachBatch(_write)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(spark, out_dir: str) -> DataFrame:
    """Read a :func:`continuous_rollup_sink` table (the derived ``__p``
    partition key dropped; ``key_cols`` read back from partition dirs)."""
    return spark.read.parquet(out_dir).drop("__p")


def parquet_sink(stream_df: DataFrame, out_dir: str, checkpoint_dir: str):
    """Continuous parquet export — the streaming analogue of the reference's
    COPY TO parquet (ref:docs/EXAMPLES.md:225-233)."""
    return (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

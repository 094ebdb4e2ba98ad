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

#: raw events-parquet schema (declared — streaming reads require one; the
#: driver's parquet stores ts as TIMESTAMP(NANOS) which Spark surfaces as
#: long under nanosAsLong)
_EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # ns since epoch
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
) -> DataFrame:
    """``readStream`` over a directory of parquet message-log files,
    projected to the message schema. New files appearing in ``log_dir`` are
    new message batches (the live-tail model)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(_EVENTS_RAW_SCHEMA)
        .format("parquet")
        .load(log_dir)
    )
    df = raw.select(
        F.lit(stream).alias("stream"),
        F.concat(
            F.lit(f"{stream}."),
            F.col("event_type"),
            F.lit(".u"),
            F.col("user_id").cast("string"),
        ).alias("subject"),
        (F.col("event_id") + F.lit(1)).cast("long").alias("seq"),
        F.timestamp_micros(F.expr("ts div 1000")).alias("ts_nats"),
        F.col("props").alias("payload"),
    )
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

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        (
            batch_df.withColumn("p", F.col(partition_col).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("p", *key_cols)
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
    """Read a :func:`continuous_rollup_sink` table (the derived ``p``
    partition key dropped; ``key_cols`` read back from partition dirs)."""
    return spark.read.parquet(out_dir).drop("p")


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

"""Streaming deduplication — the live twin of :mod:`operators.dedup`'s
exact dedup, for ingest pipelines where the same message can arrive twice
(NATS JetStream redelivery, at-least-once sources; the reference's Direct
Get scan can also refetch on retry, ref:src/nats_scan.cpp:715-723).

``dropDuplicatesWithinWatermark`` keeps state only for the watermark
horizon: a duplicate arriving within the delay is dropped, state for older
keys is evicted, so memory is bounded by (unique-key rate × watermark) —
the only dedup shape that runs forever. Plain ``dropDuplicates`` on a
stream would keep ALL keys in state and OOM eventually; don't use it
unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_messages(
    stream_df: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts_nats",
    watermark: str = "2 hours",
) -> DataFrame:
    """Drop redelivered messages by key (default: the sequence number)
    within the watermark horizon."""
    keys = keys or ["seq"]
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def dedup_content(
    stream_df: DataFrame,
    payload_col: str = "payload",
    ts_col: str = "ts_nats",
    watermark: str = "2 hours",
) -> DataFrame:
    """Content-level streaming dedup: fingerprint the payload (md5 of the
    normalized bytes, same normalization as the batch ``fingerprint``) and
    keep the first arrival per fingerprint within the watermark."""
    from duckdb_nats_jetstream_spark.functions.text import fingerprint

    return (
        stream_df.withColumn("__fp", fingerprint(F.col(payload_col).cast("string")))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def near_dup_flagger(
    stream_df: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    band_size: int = 2,
):
    """Incremental NEAR-duplicate detection over a document stream — the
    streaming twin of :func:`operators.dedup.minhash_lsh_pairs`' candidate
    stage, for "is this new document a near-dup of ANYTHING ingested so
    far?" (continuous corpus curation).

    Per micro-batch (``foreachBatch``, replay-safe):

    1. compute the batch's MinHash LSH band keys (same salted-md5 carving
       as the batch operator — identical keys, so batch and stream agree
       on candidates);
    2. broadcast-join them against the accumulated band-key store (a plain
       partitioned parquet table — at scale, the store shuffles on
       ``band_key`` and the join is key-co-located; candidate = any shared
       band key with an earlier doc);
    3. append per-doc verdicts ``(id, n_candidate_bands, is_near_dup)`` to
       ``out_dir`` under a per-batch subdirectory (idempotent on
       redelivery: a replayed batch OVERWRITES its own directory, never
       double-appends);
    4. append the batch's own keys to the store the same way.

    State is the parquet store, not executor memory — survives restarts,
    unbounded corpus, no watermark eviction needed (near-dup checks must
    look back forever, unlike redelivery dedup above).
    """
    from duckdb_nats_jetstream_spark.operators.dedup import _band_keys_df

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not batch_df.head(1):
            return
        keys = _band_keys_df(batch_df, text_col, id_col, k, band_size).persist()
        try:
            # Exclude THIS batch's partition from the store read: after a
            # failed attempt the store may already hold the replayed batch's
            # own band keys, and without the filter documents within the
            # batch would flag each other — verdicts on replay would differ
            # from a clean run (r02 ADVICE). The partition column comes from
            # the batch_id=N directory layout, so the filter prunes the
            # directory, it doesn't scan it.
            store = spark.read.parquet(store_dir).filter(
                F.col("batch_id") != F.lit(batch_id)
            )
        except Exception:  # first batch — empty store
            store = None
        if store is not None:
            hits = (
                keys.join(
                    store.withColumnRenamed(id_col, "__prior_id"),
                    "band_key",
                )
                .filter(F.col("__prior_id") != F.col(id_col))
                .groupBy(id_col)
                .agg(F.countDistinct("band_key").alias("n_candidate_bands"))
            )
        else:
            hits = keys.select(id_col).distinct().withColumn(
                "n_candidate_bands", F.lit(0).cast("long")
            ).limit(0)
        verdict = (
            keys.select(id_col)
            .distinct()
            .join(hits, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_candidate_bands", F.lit(0).cast("long")).alias(
                    "n_candidate_bands"
                ),
                (F.coalesce("n_candidate_bands", F.lit(0)) > 0).alias("is_near_dup"),
            )
        )
        # per-batch dirs → a replayed batch overwrites itself (idempotent)
        verdict.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
        keys.write.mode("overwrite").parquet(f"{store_dir}/batch_id={batch_id}")
        keys.unpersist(blocking=True)

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_band_store(
    spark,
    store_dir: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Maintenance pass for :func:`near_dup_flagger`'s band-key store.

    Each micro-batch appends its keys as up-to-``shuffle.partitions``
    small files under ``batch_id=N``; after B batches the probe join pays
    the many-small-files penalty (measured 3.2× warm, SCALING.md batch 6)
    on every batch. This rewrites the store size-targeted WHILE KEEPING
    the ``batch_id`` hive layout — the layout is load-bearing: the
    flagger's replay-exclusion filter (``batch_id != current``) prunes
    the replayed batch's own directory, so a compaction that flattened
    the column away would silently break replay idempotence.

    Run it offline (between drains, or from a maintenance job) and swap
    the compacted directory in for the store: verdicts are identical
    before and after (pinned in ``tests/test_stream_dedup.py``). Returns
    the size-derived file-count target from :func:`sinks.compact_parquet`.
    """
    from duckdb_nats_jetstream_spark.sinks import compact_parquet

    return compact_parquet(
        spark,
        store_dir,
        dst_path,
        target_file_bytes=target_file_bytes,
        partition_cols=["batch_id"],
    )

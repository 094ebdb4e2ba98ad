"""Signature-store backend for BATCH incremental near-dup screening —
the steady-state shape :func:`dedup.incremental_near_dups`'s docstring
promises ("the reference side's banded signatures are ... precomputed
once and stored") but whose API re-shingles and re-minhashes the whole
reference corpus on every call. Measured cost of that gap: per-batch
wall grows with corpus size even though the batch is fixed
(SCALING.md batch 24); with the store, only the two narrow store
relations are scanned and the corpus TEXT is never touched again.

Design notes:

- the store is TWO narrow relations, built once at admission time:
  ``(id, band_key)`` for candidate generation (4 rows/doc at the default
  k=8/band_size=2) and ``(id, sh)`` for exact-Jaccard verification
  join-back. Storing them separately avoids duplicating the shingle
  array per band row. Persist both as parquet; bucketing the band
  relation by ``band_key`` additionally deletes its per-batch reshuffle
  (the same measured win as the streaming flagger's ``store_table``
  backend, SCALING.md batch 11: 59 vs 101 MB shuffle).
- admission is append-only: new accepted docs run through
  :func:`build_signature_store` and append — the corpus is shingled
  exactly once per document, ever.
- this lives beside (not inside) ``operators/dedup.py`` deliberately:
  editing that module re-queues its 12 green registry queries against
  the 50-slot driver verification budget (rotation discipline — same
  trade as the deferred ``session.spread`` fix); fold it into
  ``dedup.py`` at the next rotation window. Bit-parity with the
  rescanning API is pinned by ``tests/test_incstore.py``.

Reference scope: beyond the reference (scan/extract only); north-star
curation surface, the batch complement of ``streaming/dedup.
near_dup_flagger(store_table=)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from duckdb_nats_jetstream_spark.functions.text import jaccard
from duckdb_nats_jetstream_spark.operators.dedup import (
    _banded_signatures,
    _with_shingles,
)


def build_signature_store(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    band_size: int = 2,
    n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """One-time (or per-admitted-batch, appended) store build: returns
    ``(shingles, bands)`` — ``(id, sh)`` and ``(id, band_key)`` relations
    using exactly the hash pipeline of :func:`dedup.incremental_near_dups`,
    so stored and recomputed candidates are identical."""
    sh = _with_shingles(df, text_col, id_col, n)
    return sh, _banded_signatures(sh, id_col, k, band_size)


def incremental_near_dups_stored(
    new_df: DataFrame,
    ref_shingles: DataFrame,
    ref_bands: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    band_size: int = 2,
    threshold: float = 0.2,
    n: int = 3,
) -> DataFrame:
    """Store-backed twin of :func:`dedup.incremental_near_dups`: identical
    output ``(doc_id, n_ref_dups)`` — one row per flagged incoming doc —
    but the reference side arrives as the prebuilt store relations, so the
    per-batch bill is O(batch grams) + two store joins; the corpus text is
    never rescanned. ``k``/``band_size``/``n`` must match the store build
    (they parameterize only the batch side here)."""
    new_sh = _with_shingles(new_df, text_col, id_col, n)
    new_sh.persist()
    try:
        nb = _banded_signatures(new_sh, id_col, k, band_size).alias("nb")
        rb = ref_bands.alias("rb")
        cand = (
            nb.join(rb, F.col("nb.band_key") == F.col("rb.band_key"))
            .select(
                F.col(f"nb.{id_col}").alias("new_id"),
                F.col(f"rb.{id_col}").alias("ref_id"),
            )
            .distinct()
        )
        verified = (
            cand.join(
                new_sh.select(
                    F.col(id_col).alias("new_id"), F.col("sh").alias("sh_n")
                ),
                "new_id",
            )
            .join(
                ref_shingles.select(
                    F.col(id_col).alias("ref_id"), F.col("sh").alias("sh_r")
                ),
                "ref_id",
            )
            .filter(jaccard(F.col("sh_n"), F.col("sh_r")) >= threshold)
        )
        out = verified.groupBy(F.col("new_id").alias(id_col)).agg(
            F.count("*").cast("long").alias("n_ref_dups")
        )
        return out.localCheckpoint(eager=True)
    finally:
        new_sh.unpersist(blocking=True)

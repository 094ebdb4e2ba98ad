"""Chunk-level exact deduplication with document reassembly (CCNet /
RefinedWeb-style "line dedup", adapted to the corpus's newline-free texts by
chunking on fixed word windows).

Classic web-corpus cleaning drops *paragraphs* that repeat across many
documents (boilerplate, navigation, license headers) while keeping the rest
of each document. The pipeline:

  1. split each document into W-word chunks (position-indexed),
  2. count, per chunk hash, how many DISTINCT documents contain it,
  3. drop chunks whose document-frequency exceeds a cap,
  4. re-assemble each document from its surviving chunks in original order.

This differs from `dedup.duplicated_span_fraction` (audit-only: *how much* of
a doc is duplicated) by actually producing the cleaned text — the
reassembly is the operator.

Spark shape at 100 TB:
  - chunking: map-only (split + slice per row), fuses into the scan.
  - document frequency: one shuffle keyed on the 16-char md5 chunk hash —
    bounded key width regardless of chunk text size; map-side partial
    distinct-count keeps the shuffle near |unique chunks|.
  - reassembly: one shuffle keyed on doc_id (sort_array over collected
    (pos, chunk) structs — per-doc state is the doc itself, bounded).
  No all-pairs anything; both shuffles are on keys the data already has.

Reference scope note: beyond the reference extension (ref:src/nats_scan.cpp
stops at scan + extraction); north-star curation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from duckdb_nats_jetstream_spark.tables import spread


def chunk_dedup(
    df: DataFrame,
    chunk_words: int = 8,
    max_doc_freq: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document cleaning summary after chunk-frequency dedup:
    ``(doc_id, n_chunks, n_dropped, cleaned_md5, cleaned_chars)``.

    A chunk survives iff its corpus document-frequency ≤ ``max_doc_freq``.
    ``cleaned_md5`` digests the reassembled text (space-joined surviving
    chunks in original position order) — the text itself stays distributed;
    only its fingerprint crosses the driver boundary, so the output row is
    narrow and the driver's value-hash is byte-stable.

    Precondition: ``id_col`` must be NON-NULL (r13 ADVICE). The dense_rank
    doc-frequency below counts a NULL id as one distinct document, whereas
    the count_distinct it replaced ignored NULLs — a NULL-id row would
    inflate doc_freq by 1 for every chunk it contains and flip keep
    decisions. Every in-repo caller feeds fixture ``doc_id``s (non-null by
    schema); filter NULL ids first when feeding external data.
    """
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_words)).cast("int")
    # chunk i (1-based) = words (i-1)*W+1 .. i*W; slice clips at the end
    chunks = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.concat_ws(
            " ", F.slice(toks, (i - F.lit(1)) * chunk_words + F.lit(1), chunk_words)
        ),
    )
    exploded = (
        spread(df)
        .select(F.col(id_col), F.posexplode(chunks).alias("pos", "chunk"))
        .select(
            id_col, "pos", "chunk", F.substring(F.md5("chunk"), 1, 16).alias("ch")
        )
    )
    # document frequency per chunk hash (distinct docs, not occurrences:
    # a chunk repeated WITHIN one doc is repetition, not boilerplate).
    # r13 optimization: attach it IN PLACE with two window passes over one
    # ch-keyed exchange — dense_rank by id then its per-ch max IS the
    # exact distinct-doc count — instead of a count_distinct aggregate
    # (two exchanges) joined back to the exploded relation (which planned
    # the tokenize+explode subtree twice). A hot boilerplate chunk lands
    # on one spillable window group either way; the join-back put it on
    # one join partition, so skew is unchanged while two exchanges and a
    # second explode pass are gone.
    from pyspark.sql import Window as W

    wch = W.partitionBy("ch")
    marked = (
        exploded.withColumn(
            "__dr", F.dense_rank().over(wch.orderBy(id_col))
        )
        .withColumn("doc_freq", F.max("__dr").over(wch))
        .withColumn("keep", F.col("doc_freq") <= F.lit(max_doc_freq))
    )
    cleaned = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("keep"), F.struct(F.col("pos"), F.col("chunk")))
                )
            ),
            lambda s: s.getField("chunk"),
        ),
        " ",
    )
    return marked.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum((~F.col("keep")).cast("long")).alias("n_dropped"),
        F.md5(cleaned).alias("cleaned_md5"),
        F.length(cleaned).cast("long").alias("cleaned_chars"),
    )


def sql_chunk_dedup(
    chunk_words: int = 8,
    max_doc_freq: int = 1,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror. 1-based inclusive list slicing lines up with Spark's
    ``slice(arr, start, length)``; ``string_agg(... ORDER BY pos)`` is the
    reassembly; empty reassembly coalesces to '' (Spark's array_join of an
    empty array) so the md5s agree on fully-boilerplate documents."""
    w = chunk_words
    return f"""
WITH toks AS (
  SELECT {id_col}, string_split({text_col}, ' ') AS t FROM {table}
),
chunks AS (
  SELECT {id_col},
         CAST(i AS INT) AS pos,
         array_to_string(t[CAST((i - 1) * {w} + 1 AS INT) : CAST(i * {w} AS INT)], ' ') AS chunk
  FROM toks,
       UNNEST(range(1, CAST(ceil(len(t) / {w}.0) AS BIGINT) + 1)) AS u(i)
),
hashed AS (
  SELECT {id_col}, pos, chunk, substr(md5(chunk), 1, 16) AS ch FROM chunks
),
freq AS (
  SELECT ch, COUNT(DISTINCT {id_col}) AS doc_freq FROM hashed GROUP BY ch
),
marked AS (
  SELECT h.{id_col}, h.pos, h.chunk, f.doc_freq <= {max_doc_freq} AS keep
  FROM hashed h JOIN freq f USING (ch)
)
SELECT {id_col},
       COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       md5(COALESCE(string_agg(CASE WHEN keep THEN chunk END, ' ' ORDER BY pos), '')) AS cleaned_md5,
       CAST(length(COALESCE(string_agg(CASE WHEN keep THEN chunk END, ' ' ORDER BY pos), '')) AS BIGINT) AS cleaned_chars
FROM marked
GROUP BY {id_col}
"""

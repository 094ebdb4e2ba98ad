"""Corpus-frequency boilerplate detection (CCNet / RefinedWeb style).

Web-scale training corpora carry templated segments — navigation chrome,
license footers, share buttons — that repeat across *different* documents.
Document-level dedup never removes them (the documents differ); span-level
winnowing finds them but keys on overlapping shingles. This operator uses
the CCNet recipe: split each document into consecutive non-overlapping
``w``-word segments, count how many **distinct documents** each segment
occurs in, and flag segments above a document-frequency threshold as
boilerplate. Emits a per-document boilerplate profile the cleaning step
filters on.

Scale shape (100 TB): the segment explode is row-local; the corpus is then
shuffled twice on the 16-hex segment fingerprint (distinct-doc count, then
the flag join-back on the SAME key — co-partitioned, AQE will broadcast the
flagged set when it is small, which for real boilerplate it is: the flagged
fps are the tiny high-frequency head of the segment distribution). No
windows, no driver collect, fingerprints keep the shuffle narrow (16-byte
keys, not segment text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def segment_boilerplate_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document boilerplate profile: ``n_segments`` non-overlapping
    ``w``-word segments, ``n_boiler`` of them occurring in ≥ ``min_docs``
    distinct documents, and the exact fraction. Documents shorter than
    ``w`` words have no segments and are absent (mirrors the SQL, where
    ``range(0, 0)`` is empty)."""
    # materialize the split FIRST: a transform lambda referencing the raw
    # split(text) expression re-evaluates the whole split once per segment
    # index (the PERF.md transform-lambda trap)
    tokenized = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__w"))
    words = F.col("__w")
    n_seg = F.floor(F.size(words) / w).cast("int")
    # guard the empty case: F.sequence(0, -1) yields a DESCENDING [0, -1],
    # not [] (the r02 winnowing lesson — ADVICE.md)
    idxs = F.when(n_seg > 0, F.sequence(F.lit(0), n_seg - F.lit(1))).otherwise(
        F.array().cast("array<int>")
    )
    segs = tokenized.select(
        F.col(id_col),
        F.explode(
            F.transform(
                idxs,
                lambda i: F.substring(
                    F.md5(F.array_join(F.slice(words, i * w + F.lit(1), F.lit(w)), " ")),
                    1,
                    16,
                ),
            )
        ).alias("fp"),
    )
    if min_docs == 2:
        # min(id) < max(id) ⟺ ≥2 distinct docs: one exchange instead of
        # the distinct-agg's two (r13 optimization; the generic arm below
        # stays for min_docs > 2, where a true distinct count is needed)
        flagged = (
            segs.groupBy("fp")
            .agg(F.min(id_col).alias("__mn"), F.max(id_col).alias("__mx"))
            .filter(F.col("__mn") < F.col("__mx"))
            .select("fp", F.lit(1).alias("is_b"))
        )
    else:
        flagged = (
            segs.groupBy("fp")
            .agg(F.countDistinct(id_col).alias("nd"))
            .filter(F.col("nd") >= min_docs)
            .select("fp", F.lit(1).alias("is_b"))
        )
    return (
        segs.join(flagged, "fp", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.coalesce(F.col("is_b"), F.lit(0))).cast("long").alias("n_boiler"),
        )
        .select(
            id_col,
            "n_segments",
            "n_boiler",
            (F.col("n_boiler") / F.col("n_segments")).alias("boiler_frac"),
        )
    )


def sql_segment_boilerplate(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 5,
    min_docs: int = 2,
) -> str:
    """DuckDB mirror of :func:`segment_boilerplate_stats`. ``boiler_frac``
    is one BIGINT/BIGINT correctly-rounded double divide in both engines."""
    return f"""
WITH wds AS (
  SELECT {id_col}, string_split({text_col}, ' ') AS ws FROM {table}
), idx AS (
  SELECT {id_col}, ws,
         unnest(range(0, CAST(len(ws) // {w} AS BIGINT))) AS i
  FROM wds
), segs AS (
  SELECT {id_col},
         substring(md5(array_to_string(
           ws[CAST(i * {w} + 1 AS INT):CAST(i * {w} + {w} AS INT)], ' ')), 1, 16) AS fp
  FROM idx
), freq AS (
  SELECT fp, count(DISTINCT {id_col}) AS nd FROM segs GROUP BY fp
)
SELECT s.{id_col},
       count(*) AS n_segments,
       CAST(sum(CASE WHEN f.nd >= {min_docs} THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       CAST(sum(CASE WHEN f.nd >= {min_docs} THEN 1 ELSE 0 END) AS BIGINT)
         / count(*) AS boiler_frac
FROM segs s JOIN freq f USING (fp)
GROUP BY s.{id_col}
"""

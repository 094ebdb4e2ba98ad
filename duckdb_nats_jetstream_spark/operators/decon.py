"""Benchmark decontamination for training-data pipelines (north-star
surface — beyond the reference, which stops at payload extraction):
flag training documents whose word n-grams overlap an evaluation set.

This is the standard eval-leakage check (n-gram collision
decontamination, as popularized by the GPT-3 / PaLM data-prep appendices):
build the set of distinct n-grams occurring anywhere in the benchmark
corpus, then score every training document by the fraction of its n-gram
positions that collide with that set.

Scale shape (the 100 TB path):

- the benchmark gram set is tiny relative to the corpus (eval suites are
  MBs, not TBs) → broadcast it and probe with a **broadcast outer join**
  carrying a hit flag: the training corpus never shuffles on gram, each
  exploded gram partition probes the in-memory hash set locally;
- total and matched gram counts come from ONE aggregation over the probe
  output (``count(*)`` + ``sum(hit)``), so the corpus is read, tokenized,
  and shingled exactly once — no per-doc self-join, no recompute;
- the only shuffle is that per-doc aggregation keyed ``doc_id``, which
  map-side-combines down to one row per document;
- per-doc gram arrays are deduped *before* explode (``array_distinct``
  row-local), so the probe volume is distinct-grams-per-doc, not
  positions.

Float discipline: ``contam_r`` is one IEEE division of two exact integers
— bit-identical to the DuckDB oracle (see ``functions/exact.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from duckdb_nats_jetstream_spark.functions.text import shingles, tokens


def ngram_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-training-document benchmark n-gram overlap.

    Returns ``(doc_id, n_grams, n_matched, contam_r)`` where ``n_grams``
    counts the document's *distinct* n-grams, ``n_matched`` of which occur
    in the benchmark corpus; ``contam_r = n_matched / n_grams``. Documents
    shorter than ``n`` tokens are dropped (no grams to match).
    """
    from duckdb_nats_jetstream_spark.tables import spread

    gram = lambda c: F.array_distinct(shingles(tokens(c), n))  # noqa: E731

    # bench_grams is broadcast unconditionally: it scales with the
    # BENCHMARK corpus (eval suites, ~10^6 grams), not the training
    # corpus being scanned — the structurally-bounded side of the
    # hint-vs-cardinality rule (SCALING.md batch 8). A benchmark too big
    # to broadcast should use bloom_decontaminate instead.
    bench_grams = (
        benchmark.select(F.explode(gram(F.col(text_col))).alias("gram"))
        .distinct()
        .withColumn("__hit", F.lit(1).cast("long"))
    )
    # tokenize+shingle is the hot per-row stage — spread a few-file input;
    # grams are deduped row-locally, so count(*) per doc == n distinct grams
    exploded = spread(train).select(
        F.col(id_col), F.explode(gram(F.col(text_col))).alias("gram")
    )
    return (
        exploded.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0).cast("long"))).alias(
                "n_matched"
            ),
        )
        .select(
            id_col,
            "n_grams",
            "n_matched",
            (F.col("n_matched") / F.col("n_grams")).alias("contam_r"),
        )
    )


def bloom_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_hashes: int = 3,
    cell_hex: int = 3,
) -> DataFrame:
    """Bloom-filter variant of :func:`ngram_contamination` — the sketch that
    keeps working when the benchmark side ISN'T small.

    Instead of broadcasting the exact benchmark gram set (memory grows with
    the eval corpus), each gram maps to ``n_hashes`` cells in a fixed
    universe of ``16^cell_hex`` cells per hash function (md5-prefix cells —
    deterministic and identical in any engine). A training gram is *flagged*
    iff all of its cells are occupied by the benchmark — the classic Bloom
    guarantee: **no false negatives** (every truly-overlapping gram is
    flagged; ``tests`` assert n_flagged ≥ n_matched against the exact
    operator), false positives at ~(fill_ratio)^n_hashes, driven down by
    ``cell_hex``/``n_hashes`` exactly like m/k in a textbook Bloom filter.

    Scale shape: the broadcast payload is ≤ n_hashes · 16^cell_hex short
    strings — CONSTANT in benchmark size (vs. the exact operator's
    every-distinct-gram set); everything else is the same single
    explode + broadcast probe + one per-doc aggregation.

    Returns ``(doc_id, n_grams, n_flagged, flag_r)``.
    """
    from duckdb_nats_jetstream_spark.tables import spread

    gram = lambda c: F.array_distinct(shingles(tokens(c), n))  # noqa: E731

    def cells_of(gram_col: F.Column) -> F.Column:
        return F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    F.substring(
                        F.md5(F.concat(F.lit(f"{i}:"), gram_col)), 1, cell_hex
                    ).alias("cell"),
                )
                for i in range(n_hashes)
            ]
        )

    occupied = (
        benchmark.select(F.explode(gram(F.col(text_col))).alias("gram"))
        .distinct()
        .select(F.explode(cells_of(F.col("gram"))).alias("s"))
        .select(F.col("s.i").alias("i"), F.col("s.cell").alias("cell"))
        .distinct()
        .withColumn("__set", F.lit(1).cast("long"))
    )
    probes = (
        spread(train)
        .select(F.col(id_col), F.explode(gram(F.col(text_col))).alias("gram"))
        .select(id_col, "gram", F.explode(cells_of(F.col("gram"))).alias("s"))
        .select(id_col, "gram", F.col("s.i").alias("i"), F.col("s.cell").alias("cell"))
    )
    per_gram = (
        probes.join(F.broadcast(occupied), ["i", "cell"], "left")
        .groupBy(id_col, "gram")
        .agg(
            (
                F.sum(F.coalesce(F.col("__set"), F.lit(0).cast("long")))
                == F.lit(n_hashes)
            ).alias("flagged")
        )
    )
    return per_gram.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.sum(F.col("flagged").cast("long")).alias("n_flagged"),
        (
            F.sum(F.col("flagged").cast("long")) / F.count("*")
        ).alias("flag_r"),
    )


def sql_bloom_contamination(
    bench_pred: str = "doc_id % 50 = 0",
    n: int = 3,
    n_hashes: int = 3,
    cell_hex: int = 3,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`bloom_contamination` (same md5-prefix cells)."""
    from duckdb_nats_jetstream_spark.functions.text import sql_shingles, sql_tokens

    hash_ids = ", ".join(str(i) for i in range(n_hashes))
    return f"""
WITH tok AS (SELECT {id_col}, {sql_tokens('text')} AS t FROM {table}),
g AS (
  SELECT {id_col}, list_distinct({sql_shingles('t', n)}) AS grams FROM tok
),
bench AS (
  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE {bench_pred}
),
occupied AS (
  SELECT DISTINCT i, substr(md5(CAST(i AS VARCHAR) || ':' || gram), 1, {cell_hex}) AS cell
  FROM bench, (SELECT unnest([{hash_ids}]) AS i)
),
train AS (
  SELECT {id_col}, grams FROM g WHERE NOT ({bench_pred}) AND len(grams) > 0
),
probes AS (
  SELECT {id_col}, gram, i,
         substr(md5(CAST(i AS VARCHAR) || ':' || gram), 1, {cell_hex}) AS cell
  FROM (SELECT {id_col}, unnest(grams) AS gram FROM train),
       (SELECT unnest([{hash_ids}]) AS i)
),
per_gram AS (
  SELECT p.{id_col}, p.gram,
         SUM(CASE WHEN o.cell IS NOT NULL THEN 1 ELSE 0 END) = {n_hashes} AS flagged
  FROM probes p LEFT JOIN occupied o ON p.i = o.i AND p.cell = o.cell
  GROUP BY p.{id_col}, p.gram
)
SELECT {id_col},
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(SUM(CASE WHEN flagged THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS flag_r
FROM per_gram
GROUP BY {id_col}
"""

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
    from duckdb_nats_jetstream_spark.session import spread

    gram = lambda c: F.array_distinct(shingles(tokens(c), n))  # noqa: E731

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

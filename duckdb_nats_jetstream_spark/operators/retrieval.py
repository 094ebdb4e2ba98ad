"""Retrieval operators: BM25 lexical scoring and reciprocal-rank fusion.

The retrieval half of a RAG / curation pipeline over the ``documents`` and
``embeddings`` tables — the missing sibling of the similarity-search family
(:mod:`operators.similarity`): score the corpus against a query term set
with BM25 (Robertson/Sparck Jones probabilistic ranking), and fuse a
lexical candidate list with a vector candidate list by reciprocal-rank
fusion (Cormack, Clarke & Buettcher, SIGIR 2009).

Scale shape (the part that survives a 100 TB corpus):

- **BM25 scoring is map-only.** Per-document term frequencies come from
  array higher-order functions over the tokenized text (``size(filter(
  tokens, t = term))``) — no explode, no per-token shuffle. The corpus
  statistics the score needs (doc count, total token count, per-term
  document frequency) are ONE single-row aggregate, broadcast back with a
  ``crossJoin(broadcast(...))``. Total cost: one scan + one 1-row exchange.
- **Top-k is TakeOrderedAndProject** (distributed partial top-k), never a
  global sort; ranks are assigned by a window over the already-reduced
  k rows.
- **RRF fuses two bounded candidate lists** (k rows each), so the fusion
  join is broadcast-trivial regardless of corpus size; the heavy lifting
  stays in the two candidate generators.

Cross-engine exactness (the driver hash-compares against DuckDB): the idf
is kept *rational* — ``(N - df + 0.5) / (df + 0.5)``, the argument of the
classic Robertson log-idf and strictly monotone in it — so every score is
a composition of exact integer counts and correctly-rounded IEEE double
ops in a pinned evaluation order, bit-identical across engines. A log
would hit libm last-ulp variation (same discipline as
``queries/pipeline.text_tfidf_top_terms``; see ``functions/exact.py``).
All fractional constants are emitted into the oracle SQL via
``sql_lit_f64`` (scientific notation → DuckDB's exact double parser).

The reference engine has no retrieval surface; this extends the
LLM-pipeline operator family (SURVEY §2 north-star block).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.functions import text as TX
from duckdb_nats_jetstream_spark.operators.similarity import sql_lit_f64

__all__ = [
    "bm25_scored",
    "bm25_topk",
    "rrf_fuse",
    "sql_bm25_scored",
    "sql_bm25_topk",
]

#: BM25 free parameters (Robertson et al.; the usual defaults rounded to
#: exactly-representable doubles so the Python-side constant folding and
#: the SQL literal agree bit-for-bit: 1.5 and 0.75 are dyadic rationals).
DEFAULT_K1 = 1.5
DEFAULT_B = 0.75

#: RRF smoothing constant from the original paper.
DEFAULT_RRF_K = 60


def _tf(toks: Column, term: str) -> Column:
    # per-doc term frequency without an explode: filter the token array
    return F.size(F.filter(toks, lambda x: x == F.lit(term)))


def bm25_scored(
    docs: DataFrame,
    terms: list[str],
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Every document scored by BM25 against ``terms`` → ``(id_col, score)``.

    One scan (map-only tf/dl), one single-row stats aggregate broadcast
    back, zero data-sized shuffles. A term absent from a document
    contributes an exact ``0.0`` (zero numerator over a positive
    denominator), so no per-term conditional is needed and the fixed
    left-to-right sum order matches the oracle SQL term-for-term.
    """
    toks = TX.tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        *[_tf(toks, t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    ).withColumn("avgdl", F.col("sum_dl").cast("double") / F.col("n_docs"))

    score: Column = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}")
        idf = (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5)) / (
            F.col(f"df_{i}") + F.lit(0.5)
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.col("avgdl"))
        )
        score = score + idf * (tf * F.lit(k1 + 1.0)) / denom

    return base.crossJoin(F.broadcast(stats)).select(
        F.col(id_col), score.alias("score")
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    topk: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``topk`` documents by BM25 → ``(id_col, rnk, bm25_r)``.

    ``orderBy(...).limit(k)`` plans TakeOrderedAndProject (per-partition
    heap + driver merge of k rows); ``row_number`` then runs over the k
    surviving rows only — the unpartitioned window is bounded by
    construction, never corpus-sized.
    """
    scored = bm25_scored(docs, terms, k1=k1, b=b, text_col=text_col, id_col=id_col)
    top = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(topk)
    w = W.orderBy(F.col("score").desc(), F.col(id_col))
    return top.select(
        F.col(id_col),
        F.row_number().over(w).cast("long").alias("rnk"),
        F.col("score").alias("bm25_r"),
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_a: str = "doc_id",
    id_b: str = "doc_id",
    rnk_a: str = "rnk",
    rnk_b: str = "rnk",
    rrf_k: int = DEFAULT_RRF_K,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked candidate lists →
    ``(doc_id, lex_rnk, vec_rnk, rrf_r)``.

    Classic RRF: an item absent from one list contributes 0 from that
    list (``coalesce``), present items contribute ``1/(rrf_k + rank)``.
    Both inputs are top-k lists (bounded by construction), so the full
    outer join is trivially small at any corpus scale.
    """
    a = ranked_a.select(
        F.col(id_a).alias("_ida"), F.col(rnk_a).cast("long").alias("lex_rnk")
    )
    bd = ranked_b.select(
        F.col(id_b).alias("_idb"), F.col(rnk_b).cast("long").alias("vec_rnk")
    )
    fused = a.join(bd, a["_ida"] == bd["_idb"], "full_outer").select(
        F.coalesce(F.col("_ida"), F.col("_idb")).alias("doc_id"),
        F.col("lex_rnk"),
        F.col("vec_rnk"),
        (
            F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("lex_rnk")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("vec_rnk")), F.lit(0.0))
        ).alias("rrf_r"),
    )
    return fused.orderBy(F.col("rrf_r").desc(), F.col("doc_id")).limit(topk)


# --- DuckDB oracle builders ---------------------------------------------------


def sql_bm25_scored(
    terms: list[str],
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    where: str = "TRUE",
) -> str:
    """DuckDB SELECT mirroring :func:`bm25_scored` expression-for-expression
    (same operand order, so every IEEE rounding step matches)."""
    toks = TX.sql_tokens(text_col)
    tf_cols = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    half = sql_lit_f64(0.5)
    terms_sql = " + ".join(
        f"((n_docs - df_{i} + {half}) / (df_{i} + {half}))"
        f" * (tf_{i} * {sql_lit_f64(k1 + 1.0)})"
        f" / (tf_{i} + {sql_lit_f64(k1)} * ({sql_lit_f64(1.0 - b)}"
        f" + {sql_lit_f64(b)} * (dl / avgdl)))"
        for i in range(len(terms))
    )
    return f"""
WITH bm25_base AS (
  SELECT {id_col}, len(toks) AS dl, {tf_cols}
  FROM (SELECT {id_col}, {toks} AS toks FROM {table} WHERE {where})
),
bm25_stats AS (
  SELECT count(*) AS n_docs, sum(dl) AS sum_dl, {df_cols},
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM bm25_base
)
SELECT {id_col}, {sql_lit_f64(0.0)} + {terms_sql} AS score
FROM bm25_base CROSS JOIN bm25_stats
"""


def sql_bm25_topk(
    terms: list[str],
    topk: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    where: str = "TRUE",
) -> str:
    scored = sql_bm25_scored(
        terms, k1=k1, b=b, table=table, text_col=text_col, id_col=id_col, where=where
    )
    return f"""
SELECT {id_col},
       CAST(row_number() OVER (ORDER BY score DESC, {id_col}) AS BIGINT) AS rnk,
       score AS bm25_r
FROM ({scored}) bm25_scored
ORDER BY score DESC, {id_col}
LIMIT {topk}
"""

"""Product quantization ANN (Jégou et al. 2011, "Product Quantization for
Nearest Neighbor Search") — the compressed-index member of the similarity
family (brute-force exact → `similarity.cosine_topk`; bucketed → SRP;
inverted-file → IVF; compressed → this).

The embedding space splits into ``m`` subspaces of ``dim/m`` dims; each
subspace gets its own k-means codebook (trained on the same bounded
deterministic driver-side sample as IVF — index training never scans the
corpus); every corpus vector compresses to ``m`` small codes (m bytes at
k ≤ 256 — a 64-float vector becomes 8 bytes, the whole point at 100 TB).
Queries rank candidates by **asymmetric distance (ADC)**: the exact
query-subvector→assigned-centroid distance summed across subspaces, read
from an m×k lookup table per query — never touching the original corpus
vectors.

Spark shape:
  - fit: O(sample) driver-side, per-subspace (`similarity._kmeans_sample`,
    seeded per subspace) — same production pattern as IVF.
  - encode: ONE distributed Arrow map over the corpus (codebooks broadcast
    in the UDF closure); output is the (id, codes) relation — the index.
  - search: ONE distributed Arrow map over the codes relation with the
    query LUTs broadcast (queries are a bounded head of the table, same
    explicit broadcast-side trade as ``cosine_topk``); per-query top-k by
    the standard partitioned window.

Cross-engine exactness (the oracle embeds the codebooks as literals and
re-derives codes + ADC in pure SQL):
  - every distance term evaluates as ``(qq − 2·gram) + cc`` with left-fold
    dots (`functions.vector_np.fold_d2` ↔ ``sql_dot``) — bit-identical;
  - code assignment ties break on the smaller centroid index both sides
    (stable argmin ↔ ``ORDER BY d2, j``);
  - the ADC sum folds subspace terms in subspace order both sides (numpy
    loop over s ↔ ``list_reduce`` over ``list(... ORDER BY s)``), pinning
    double summation order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from duckdb_nats_jetstream_spark.functions.vector import sql_dot
from duckdb_nats_jetstream_spark.functions.vector_np import fold_d2, fold_norms


def _l2norm(X: np.ndarray) -> np.ndarray:
    """Row-normalize with the fold-exact norm: after this, squared
    euclidean distance is 2 − 2·cos, so ADC ranking == cosine ranking —
    which is what every embedding-similarity consumer actually wants, and
    what the recall test compares against. One division per element,
    mirrored by ``x / sqrt(dot(v, v))`` in the oracle.

    Zero-norm guard (r09 review, the same guard ``quantize_int8``
    carries): an all-zero embedding stays all-zero instead of going NaN —
    NaN in the fit sample poisons the trained centroids AND renders as a
    syntactically invalid ``nane0`` literal in the embedded-codebook
    oracle SQL."""
    n = fold_norms(X)
    return X / np.where(n == 0.0, 1.0, n)[:, None]
from duckdb_nats_jetstream_spark.operators.similarity import (
    _kmeans_sample,
    sql_lit_f64,
    sql_lit_vec,
)


def fit_pq_codebooks(
    df: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    fit_sample_size: int = 100_000,
) -> list[list[list[float]]]:
    """Per-subspace codebooks ``C[s][j][d]`` from the k-smallest-ids sample
    (TakeOrderedAndProject, bounded, deterministic)."""
    if dim % m != 0:
        from duckdb_nats_jetstream_spark.errors import BindError

        raise BindError(
            f"PQ requires m to divide dim (dim={dim}, m={m}): a non-zero "
            f"remainder would silently drop the trailing {dim % m} "
            "dimensions from training, encoding, and ADC (r09 review)"
        )
    sample = (
        df.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .sort(id_col)
        .limit(fit_sample_size)
        .collect()
    )
    if not sample:
        from duckdb_nats_jetstream_spark.errors import BindError

        raise BindError("cannot fit PQ codebooks on an empty corpus")
    X = _l2norm(np.asarray([r.v for r in sample], dtype=float))
    sub = dim // m
    return [
        _kmeans_sample(X[:, s * sub : (s + 1) * sub], n_codes, seed + s).tolist()
        for s in range(m)
    ]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The compressed index relation ``(id, codes array<int>)`` — one Arrow
    map, codebooks closure-broadcast."""
    m = len(codebooks)
    sub = len(codebooks[0][0])

    @pandas_udf("array<int>")
    def encode(vs: pd.Series) -> pd.Series:
        X = _l2norm(np.stack(vs.to_numpy()).astype(np.float64))
        codes = np.empty((len(X), m), dtype=np.int32)
        for s in range(m):
            C = np.asarray(codebooks[s], dtype=float)
            codes[:, s] = fold_d2(X[:, s * sub : (s + 1) * sub], C).argmin(axis=1)
        return pd.Series(list(codes))

    return df.select(
        F.col(id_col), encode(F.col(vec_col).cast("array<double>")).alias("codes")
    )


def pq_topk(
    df: DataFrame,
    query_max_id: int = 10,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    fit_sample_size: int = 100_000,
) -> DataFrame:
    """ADC top-k: ``(query_id, neighbor_id, rnk, adc_r)`` — smaller ADC =
    closer. The queries (ids < ``query_max_id``) collect driver-side into
    the LUT closure — the same bounded broadcast-side trade the exact
    ``cosine_topk`` makes explicit."""
    codebooks = fit_pq_codebooks(
        df, m, n_codes, dim, seed, vec_col, id_col, fit_sample_size
    )
    sub = dim // m
    queries = (
        df.filter(F.col(id_col) < query_max_id)
        .select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .sort(id_col)
        .collect()
    )
    qids = [r[0] for r in queries]
    if not qids:
        # no ids below query_max_id: empty result, same schema — the
        # sibling cosine_topk/ivf_topk shapes degrade the same way
        # (np.asarray([]) is 1-D and crashed _l2norm pre-r09)
        return df.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rnk long, adc_r double"
        )
    Q = _l2norm(np.asarray([r.v for r in queries], dtype=float))
    # LUT[qi][s][j] = fold-exact d2(query subvector, centroid j of subspace s)
    lut = np.empty((len(qids), m, n_codes), dtype=float)
    for s in range(m):
        C = np.asarray(codebooks[s], dtype=float)
        lut[:, s, :] = fold_d2(Q[:, s * sub : (s + 1) * sub], C)

    codes = pq_encode(df, codebooks, vec_col, id_col)

    @pandas_udf("array<double>")
    def adc(code_col: pd.Series) -> pd.Series:
        cd = np.stack(code_col.to_numpy())  # (n, m)
        # fold over subspaces IN ORDER — pins double summation order to
        # match the oracle's list fold (ORDER BY s)
        acc = np.zeros((len(cd), len(qids)))
        for s in range(m):
            acc = acc + lut[:, s, :][:, cd[:, s]].T
        return pd.Series(list(acc))

    exploded = (
        codes.select(F.col(id_col), adc(F.col("codes")).alias("a"))
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.posexplode("a").alias("qpos", "adc"),
        )
        .select(
            F.element_at(
                F.array(*[F.lit(q) for q in qids]), F.col("qpos") + 1
            ).alias("query_id"),
            "neighbor_id",
            "adc",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("neighbor_id"))
    return (
        exploded.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rnk").cast("long").alias("rnk"),
            F.col("adc").alias("adc_r"),
        )
        .orderBy("query_id", "rnk")
    )


def sql_pq_topk(
    sf_dir: str,
    query_max_id: int = 10,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    seed: int = 42,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    fit_sample_size: int = 100_000,
) -> str:
    """DuckDB oracle: re-runs the identical deterministic per-subspace
    training on the parquet, embeds the codebooks as literals, and derives
    codes + ADC in pure SQL — every distance term ``(qq − 2·dp) + cc`` with
    left-fold dots, assignment ties on centroid index, ADC folded over
    subspaces in order (DuckDB lambda quirks per ``operators/histsketch``:
    totals ride in elements, consumer fields precede update fields)."""
    import duckdb

    from duckdb_nats_jetstream_spark.functions.vector_np import fold_sq_norms

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT list_transform({vec_col}, x -> CAST(x AS DOUBLE)) "
        f"FROM '{sf_dir}/{table}.parquet' ORDER BY {id_col} LIMIT {fit_sample_size}"
    ).fetchall()
    con.close()
    X = _l2norm(np.asarray([r[0] for r in rows], dtype=float))
    sub = dim // m
    cent_rows = []
    for s in range(m):
        C = _kmeans_sample(X[:, s * sub : (s + 1) * sub], n_codes, seed + s)
        cc = fold_sq_norms(C)
        for j in range(n_codes):
            cent_rows.append(
                f"({s}, {j}, {sql_lit_vec(list(C[j]))}, {sql_lit_f64(cc[j])})"
            )
    cents = ",\n    ".join(cent_rows)
    return f"""
WITH vr AS (
  SELECT {id_col}, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
  FROM {table}
), v0 AS (
  -- L2-normalize with the same fold-exact norm the operator uses, so ADC
  -- euclidean ranking equals cosine ranking
  SELECT {id_col}, list_transform(v, x -> x / nrm) AS v
  FROM (SELECT {id_col}, v, sqrt({sql_dot('v', 'v')}) AS nrm FROM vr)
), cent(s, j, cv, cc) AS (
  VALUES
    {cents}
), subv AS (
  SELECT {id_col}, s.s,
         v[(s.s * {sub} + 1):(s.s * {sub} + {sub})] AS sv
  FROM v0 CROSS JOIN (SELECT DISTINCT s FROM cent) s
), subd AS (
  SELECT b.{id_col}, b.s, c.j,
         (({sql_dot('b.sv', 'b.sv')} - CAST(2.0 AS DOUBLE) * {sql_dot('b.sv', 'c.cv')}) + c.cc) AS d2
  FROM subv b JOIN cent c ON c.s = b.s
), codes AS (
  SELECT {id_col}, s, j AS code, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY {id_col}, s ORDER BY d2, j) AS rn
    FROM subd
  ) WHERE rn = 1
), qsub AS (
  SELECT {id_col} AS qid, s, sv FROM subv WHERE {id_col} < {query_max_id}
), terms AS (
  -- ADC term: exact d2(query subvector, the centroid the CANDIDATE's code
  -- points at) — recomputed directly (≡ the operator's LUT gather)
  SELECT q.qid, n.{id_col} AS nid, n.s,
         (({sql_dot('q.sv', 'q.sv')} - CAST(2.0 AS DOUBLE) * {sql_dot('q.sv', 'c.cv')}) + c.cc) AS t
  FROM codes n
  JOIN cent c ON c.s = n.s AND c.j = n.code
  JOIN qsub q ON q.s = n.s
  WHERE n.{id_col} != q.qid
), adc AS (
  SELECT qid, nid,
         (list_reduce(
            list_prepend({{'acc': CAST(0 AS DOUBLE), 't': CAST(0 AS DOUBLE)}},
                         list({{'acc': CAST(0 AS DOUBLE), 't': t}} ORDER BY s)),
            (a, x) -> {{'acc': a.acc + x.t, 't': x.t}})).acc AS adc
  FROM terms GROUP BY qid, nid
)
SELECT qid AS query_id, nid AS neighbor_id, CAST(rn AS BIGINT) AS rnk, adc AS adc_r
FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY adc ASC, nid) AS rn
  FROM adc
)
WHERE rn <= {k}
ORDER BY query_id, rnk
"""

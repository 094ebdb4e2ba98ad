"""Similarity search over embedding columns (north-star surface).

Two tiers:

- :func:`cosine_topk` — exact brute-force top-k: broadcast the (small) query
  set against the corpus, ordered fold dot products, per-query window rank.
  The baseline and the verifier for the approximate tier.
- :func:`srp_topk` — signed-random-projection (SRP) LSH: each vector gets an
  n-bit signature (sign of the dot with ±1 hyperplanes); candidates = same
  bucket; exact cosine re-rank inside the bucket. At 100 TB the bucket join
  is the only shuffle, and buckets bound the pair explosion.

Hyperplanes are generated *driver-side* from md5 (deterministic, seedless),
so the exact same ±1 matrices are embeddable as literals in both the Spark
plan and the DuckDB oracle SQL.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window as W, functions as F

from duckdb_nats_jetstream_spark.functions.vector import dot, sql_dot


def srp_hyperplanes(n_bits: int, dim: int) -> list[list[float]]:
    """±1 hyperplane matrix from md5 parity — deterministic everywhere."""
    planes = []
    for j in range(n_bits):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"srp:{j}:{i}".encode()).hexdigest()
            row.append(1.0 if int(h[0], 16) % 2 == 1 else -1.0)
        planes.append(row)
    return planes


def _lit_vec(v: list[float]) -> F.Column:
    return F.array(*[F.lit(x) for x in v])


def sql_lit_vec(v: list[float]) -> str:
    return "[" + ", ".join(str(x) for x in v) + "]::DOUBLE[]"


def with_srp_bucket(
    df: DataFrame, vec_col: str = "embedding", n_bits: int = 8, dim: int = 64
) -> DataFrame:
    """Append an integer LSH ``bucket`` column: bit j = (v·h_j >= 0)."""
    planes = srp_hyperplanes(n_bits, dim)
    bucket = None
    for j, plane in enumerate(planes):
        bit = F.when(dot(F.col(vec_col), _lit_vec(plane), dim) >= 0, F.lit(2**j)).otherwise(
            F.lit(0)
        )
        bucket = bit if bucket is None else bucket + bit
    return df.withColumn("bucket", bucket.cast("long"))


def sql_srp_bucket(vec: str, n_bits: int = 8, dim: int = 64) -> str:
    planes = srp_hyperplanes(n_bits, dim)
    parts = [
        f"CASE WHEN {sql_dot(vec, sql_lit_vec(p))} >= 0 THEN {2**j} ELSE 0 END"
        for j, p in enumerate(planes)
    ]
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


def _scored_pairs(queries: DataFrame, corpus: DataFrame, id_col: str, extra_cond=None, dim: int = 64):
    cond = F.col(f"q.{id_col}") != F.col(f"c.{id_col}")
    if extra_cond is not None:
        cond = cond & extra_cond
    score = dot(F.col("q.v"), F.col("c.v"), dim) / (F.col("q.nrm") * F.col("c.nrm"))
    return (
        F.broadcast(queries.alias("q"))
        .join(corpus.alias("c"), cond)
        .select(
            F.col(f"q.{id_col}").alias("query_id"),
            F.col(f"c.{id_col}").alias("neighbor_id"),
            score.alias("cos"),
        )
    )


def _prep(df: DataFrame, vec_col: str, id_col: str, dim: int = 64) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.col(vec_col).alias("v"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col), dim)).alias("nrm"),
    )


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rnk").cast("long").alias("rnk"),
            F.col("cos").alias("cos_r"),
        )
    )


def cosine_topk(
    df: DataFrame,
    query_max_id: int = 10,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Exact brute-force top-k neighbors for the query set
    (vec_id < query_max_id), deterministic tie-break on neighbor id."""
    base = _prep(df, vec_col, id_col, dim)
    queries = base.filter(F.col(id_col) < query_max_id)
    scored = _scored_pairs(queries, base, id_col, dim=dim)
    return _rank_topk(scored, k)


def ivf_topk(
    df: DataFrame,
    query_max_id: int = 10,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """IVF-style approximate top-k: KMeans-partition the corpus (the inverted
    file), then search only the ``n_probe`` clusters nearest each query and
    re-rank with exact cosine inside.

    The scale shape: the corpus shuffles once by cluster id; each query
    touches n_probe/n_clusters of the data. Not oracle-expressible (KMeans),
    so the registry records it rows-only; tests verify recall against
    :func:`cosine_topk`."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    ml_df = df.withColumn("__features", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=n_clusters, seed=seed, featuresCol="__features").fit(ml_df)
    assigned = model.transform(ml_df).withColumnRenamed("prediction", "cluster")

    centers = model.clusterCenters()
    base = _prep(assigned, vec_col, id_col, dim).join(
        assigned.select(id_col, "cluster"), id_col
    )
    queries = base.filter(F.col(id_col) < query_max_id)

    # driver-side: the n_probe nearest centroids per query vector
    import numpy as np

    qrows = queries.select(id_col, "v").collect()
    probe_pairs = []
    C = np.array([c.toArray() if hasattr(c, "toArray") else np.asarray(c) for c in centers])
    for r in qrows:
        qv = np.asarray(r.v, dtype=float)
        d2 = ((C - qv) ** 2).sum(axis=1)
        for c in np.argsort(d2)[:n_probe]:
            probe_pairs.append((r[0], int(c)))
    probes = df.sparkSession.createDataFrame(
        probe_pairs, schema=f"{id_col} long, cluster int"
    )

    cand = (
        F.broadcast(queries.join(probes.withColumnRenamed("cluster", "probe_cluster"), id_col))
        .alias("q")
        .join(
            base.alias("c"),
            (F.col("q.probe_cluster") == F.col("c.cluster"))
            & (F.col(f"q.{id_col}") != F.col(f"c.{id_col}")),
        )
        .select(
            F.col(f"q.{id_col}").alias("query_id"),
            F.col(f"c.{id_col}").alias("neighbor_id"),
            (dot(F.col("q.v"), F.col("c.v"), dim) / (F.col("q.nrm") * F.col("c.nrm"))).alias("cos"),
        )
        .distinct()
    )
    return _rank_topk(cand, k)


def srp_topk(
    df: DataFrame,
    query_max_id: int = 10,
    k: int = 5,
    n_bits: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's SRP bucket,
    exact cosine re-rank inside. Recall < 1 by design; compare against
    :func:`cosine_topk` to measure."""
    bucketed = with_srp_bucket(df, vec_col, n_bits, dim)
    base = _prep(bucketed, vec_col, id_col, dim).join(
        bucketed.select(id_col, "bucket"), id_col
    )
    queries = base.filter(F.col(id_col) < query_max_id)
    scored = _scored_pairs(
        queries, base, id_col,
        extra_cond=F.col("q.bucket") == F.col("c.bucket"), dim=dim,
    )
    return _rank_topk(scored, k)

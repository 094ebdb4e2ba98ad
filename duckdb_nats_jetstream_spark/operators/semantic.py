"""SemDeDup-style semantic deduplication (Abbas et al. 2023, arXiv:2303.09540).

The idea: cluster the embedding space, then look for near-duplicate pairs
*only within a cluster* and keep one representative per duplicate set. The
clustering bounds the quadratic pair search — the cluster (here: SRP bucket)
is the blocking key, exactly like LSH bands block MinHash.

Spark shape at 100 TB:
  - bucket assignment: map-only Arrow pass (``with_srp_bucket``), fuses into
    the scan; no shuffle.
  - candidate pairs: ONE shuffle on the bucket key; the self-join explodes
    only within buckets (expected bucket size ~n/2^bits, tunable by
    ``n_bits``), never all-pairs.
  - verdict: exact fold-cosine on each candidate pair, then a groupBy on the
    pruned id — shuffles only the surviving pair list.

We use the SRP bucket rather than k-means clusters so the *whole* pipeline
stays deterministic and SQL-mirrorable (the md5-parity hyperplanes embed as
literals in both plans — `similarity.srp_hyperplanes`); the paper's k-means
variant plugs in by swapping the bucket column for
`operators.kmeans.kmeans_assignments`.

Reference scope note: beyond the reference extension (scan + extraction only,
ref:src/nats_scan.cpp:700-790); north-star curation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from duckdb_nats_jetstream_spark.functions.vector import dot, sql_dot
from duckdb_nats_jetstream_spark.operators.similarity import (
    sql_srp_bucket,
    with_srp_bucket,
)


def semantic_dedup_pruned(
    df: DataFrame,
    threshold: float = 0.4,
    n_bits: int | None = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    target_bucket_rows: int = 1024,
) -> DataFrame:
    """Rows to PRUNE: any vector with a lower-id neighbor in the same SRP
    bucket at cosine ≥ ``threshold``. Keeping the lowest id per duplicate
    set is the deterministic stand-in for the paper's keep-the-
    farthest-from-centroid rule (which would tie-break on doubles).

    Returns ``(vec_id, bucket, n_dups)`` — integers only, hash-stable.
    ``n_dups`` counts the lower-id near-duplicates that condemned the row
    (audit signal: heavily duplicated regions have n_dups ≫ 1).

    ``n_bits=None`` AUTO-SIZES to the batch-23 recipe
    ``ceil(log2(N / target_bucket_rows))`` (floor 1): expected bucket size
    stays ~``target_bucket_rows`` as the corpus grows, so the bucket-local
    O(c²) cosine work stays bounded per task. A PINNED bit count grows c
    linearly with N and the work quadratically — the r11 two-decade sweep
    measured exactly that (e2 = 1.79 at 100× under the pinned 6 bits vs
    flat under auto; SCALING batch 35). The registry query keeps 6 pinned
    because bits select bucket MEMBERSHIP — the oracle must compute the
    same buckets — and the sf0.01 fixture sits near the recipe's own
    output for that N anyway. Auto-sizing costs one ``count()`` job.

    Recall caveat (same as every blocked method, documented not hidden): a
    near-dup pair split across buckets is missed; at 1 − cos ≤ 0.6 and 6
    bits the per-pair collision probability is (1 − θ/π)^6 — raise recall
    with fewer bits (bigger buckets) or OR-amplification over bands, the
    same dial as `dedup.minhash_lsh_pairs`. Under auto-sizing, recall per
    pair FALLS as the corpus grows (more bits) — the SemDeDup trade: pick
    target_bucket_rows by the recall you need, then the cost is bounded.
    """
    if n_bits is None:
        import math

        n = df.count()
        n_bits = max(1, math.ceil(math.log2(max(n, 2) / target_bucket_rows)))
    b = with_srp_bucket(df, vec_col=vec_col, n_bits=n_bits, dim=dim).select(
        F.col(id_col),
        F.col("bucket"),
        F.col(vec_col).alias("v"),
    )
    return _prune_within_block(b, "bucket", id_col, dim, threshold)


def _prune_within_block(
    b: DataFrame,
    block_col: str,
    id_col: str,
    dim: int,
    threshold: float,
    arrow: bool = True,
) -> DataFrame:
    """Shared pair-prune core: within each block, exact fold-cosine over all
    pairs, condemn the higher id of each qualifying pair. ``b`` must carry
    ``(id, block, v)``.

    ``arrow=True`` (default): ONE shuffle on the block key; each block's
    pair matrix is computed in a single Arrow task with the fold-exact numpy
    kernels (``functions.vector_np`` — bit-identical to the per-pair column
    fold, see its module docstring), and the per-id dup counts are emitted
    directly — no pair relation ever materializes into a second shuffle.
    Per-task memory is one block of vectors (block_size × dim doubles plus
    the block's cosine matrix); for blocks too large for one task, fall back
    to the block-pair decomposition of ``dedup.embedding_near_dup_pairs``.

    ``arrow=False``: the same semantics as a JVM self-join + re-aggregation
    (two shuffles, interpreted fold per pair) — kept as the no-Python
    reference path; measured 2.5-4× slower on the quadratic workload because
    the higher-order fold lambdas don't enter whole-stage codegen.
    """
    if not arrow:
        withnrm = b.withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"), dim)))
        # try_divide: a zero-norm pair yields NULL (excluded by the
        # threshold filter, matching DuckDB's 0.0/0.0 → NULL and the
        # arrow path's NaN-drop); the raw `/` crashes under ANSI mode —
        # Spark 4's default — on the first degenerate vector (r09 review)
        cos = F.try_divide(
            dot(F.col("a.v"), F.col("b.v"), dim),
            F.col("a.nrm") * F.col("b.nrm"),
        )
        pairs = (
            withnrm.alias("a")
            .join(
                withnrm.alias("b"),
                (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"b.{id_col}").alias(id_col),
                F.col(f"b.{block_col}").alias(block_col),
                cos.alias("cos"),
            )
            .filter(F.col("cos") >= threshold)
        )
        return pairs.groupBy(id_col, block_col).agg(
            F.count("*").cast("long").alias("n_dups")
        )

    import numpy as np
    import pandas as pd

    from duckdb_nats_jetstream_spark.functions.vector_np import (
        fold_gram,
        fold_norms,
    )

    def _block(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(
                {id_col: [], block_col: [], "n_dups": []}
            ).astype({id_col: "int64", block_col: "int64", "n_dups": "int64"})
        ids = pdf[id_col].to_numpy()
        m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        nrm = fold_norms(m)
        with np.errstate(divide="ignore", invalid="ignore"):
            # same op sequence as the JVM path: dot / (nrm_a * nrm_b).
            # Zero-norm vectors give 0/0 = NaN here; `cos >= threshold`
            # is False for NaN, which IS the contract: a vector with
            # undefined similarity is never a near-dup — DuckDB renders
            # the same pair as NULL (0.0/0.0 → NULL) and excludes it,
            # and the JVM path try_divides to NULL (r09 review: under
            # ANSI the raw division crashed the JVM path outright).
            cos = fold_gram(m, m) / np.outer(nrm, nrm)
        mask = (ids[:, None] < ids[None, :]) & (cos >= threshold)
        n_dups = mask.sum(axis=0)
        keep = n_dups > 0
        return pd.DataFrame(
            {
                id_col: ids[keep],
                block_col: pdf[block_col].to_numpy()[keep],
                "n_dups": n_dups[keep].astype("int64"),
            }
        )

    return b.groupBy(block_col).applyInPandas(
        _block, f"{id_col} long, {block_col} long, n_dups long"
    )


def semantic_dedup_pruned_kmeans(
    df: DataFrame,
    threshold: float = 0.4,
    k: int | None = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    target_bucket_rows: int = 1024,
) -> DataFrame:
    """The paper-faithful SemDeDup blocking: k-means clusters (two
    distributed Lloyd iterations, `operators.kmeans`) instead of SRP
    buckets. Same prune rule inside each cluster; returns
    ``(vec_id, cluster, n_dups)``.

    Trade vs the SRP variant: clusters adapt to the data distribution
    (better recall for the same block count on clustered corpora) at the
    cost of the clustering passes; SRP needs no training at all. Both are
    one blocked self-join after assignment.

    ``k=None`` AUTO-SIZES to ``ceil(N / target_bucket_rows)`` (floor 2) —
    the same hold-the-expected-block-size recipe as the SRP variant's
    ``n_bits=None`` (batch 23 / r11 batch 35): a pinned k lets the mean
    cluster grow linearly with the corpus and the cluster-local O(c²)
    cosine work quadratically. Unlike SRP buckets, k-means clusters are
    NOT balanced — a dense region can still concentrate a cluster well
    above the mean, so for skew-prone corpora pair the auto-k with the
    SRP variant as a cap check. k changes cluster MEMBERSHIP (a recall
    dial, like bits), which is why the registry query pins it for its
    oracle."""
    import math

    from duckdb_nats_jetstream_spark.operators.kmeans import kmeans_assignments

    if k is None:
        k = max(2, math.ceil(df.count() / target_bucket_rows))

    a = kmeans_assignments(df, k, vec_col, id_col, dim).select(
        id_col, F.col("cluster_iter2").alias("cluster")
    )
    b = df.join(a, id_col).select(
        F.col(id_col),
        F.col("cluster"),
        F.col(vec_col).alias("v"),
    )
    return _prune_within_block(b, "cluster", id_col, dim, threshold)


def sql_semantic_dedup_pruned_kmeans(
    threshold: float = 0.4,
    k: int = 8,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror: the unrolled k-means assignment CTEs feed the same
    blocked pair query."""
    from duckdb_nats_jetstream_spark.operators.kmeans import (
        sql_kmeans_assignment_ctes,
    )

    return f"""
WITH {sql_kmeans_assignment_ctes(k, dim, table, id_col, vec_col)},
base AS (
  SELECT e.{id_col},
         CAST(joined.c2 AS BIGINT) AS cluster,
         e.{vec_col} AS v,
         sqrt({sql_dot(f'e.{vec_col}', f'e.{vec_col}')}) AS nrm
  FROM {table} e JOIN joined ON joined.id = e.{id_col}
)
SELECT {id_col}, cluster, COUNT(*) AS n_dups
FROM (
  SELECT b.{id_col} AS {id_col}, b.cluster AS cluster,
         {sql_dot('a.v', 'b.v')} / (a.nrm * b.nrm) AS cos
  FROM base a JOIN base b
    ON a.cluster = b.cluster AND a.{id_col} < b.{id_col}
) t
WHERE cos >= {threshold}
GROUP BY {id_col}, cluster
"""


def sql_semantic_dedup_pruned(
    threshold: float = 0.4,
    n_bits: int = 6,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror: same md5-parity hyperplane literals, same fold-cosine."""
    return f"""
WITH base AS (
  SELECT {id_col},
         {sql_srp_bucket(vec_col, n_bits, dim)} AS bucket,
         {vec_col} AS v,
         sqrt({sql_dot(vec_col, vec_col)}) AS nrm
  FROM {table}
)
SELECT {id_col}, bucket, COUNT(*) AS n_dups
FROM (
  SELECT b.{id_col} AS {id_col}, b.bucket AS bucket,
         {sql_dot('a.v', 'b.v')} / (a.nrm * b.nrm) AS cos
  FROM base a JOIN base b
    ON a.bucket = b.bucket AND a.{id_col} < b.{id_col}
) t
WHERE cos >= {threshold}
GROUP BY {id_col}, bucket
"""

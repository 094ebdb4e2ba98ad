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

import pandas as pd  # module-level: pandas_udf type hints resolve in module globals

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


def sql_lit_f64(x: float) -> str:
    """A DuckDB literal that round-trips the double EXACTLY. A bare decimal
    literal with > 15 significant digits parses as DECIMAL first and loses
    the last ulp before any DOUBLE cast (measured:
    ``CAST(0.055813135980669316 AS DOUBLE)`` → ``…931``); scientific
    notation forces the double parser, which is shortest-round-trip exact."""
    s = repr(float(x))
    return s if ("e" in s or "E" in s) else s + "e0"


def sql_lit_vec(v: list[float]) -> str:
    return "[" + ", ".join(sql_lit_f64(x) for x in v) + "]::DOUBLE[]"


def with_srp_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_bits: int = 8,
    dim: int = 64,
    arrow: bool = True,
) -> DataFrame:
    """Append an integer LSH ``bucket`` column: bit j = (v·h_j >= 0).

    Default path is an Arrow-batched pandas UDF over the fold-exact numpy
    kernel — bit-identical to the column-fold expression (proven kernel,
    :mod:`functions.vector_np`) but vectorized over rows, where the
    n_bits × dim higher-order ``aggregate`` lambdas run interpreted
    (measured 2.6s → 0.3s for the sf0.1 assignment). ``arrow=False``
    keeps the pure-JVM column expression (NULL-element tolerant; the
    numpy path requires dense vectors, which embeddings are)."""
    planes = srp_hyperplanes(n_bits, dim)
    if arrow:
        import numpy as np
        from pyspark.sql.functions import pandas_udf

        from duckdb_nats_jetstream_spark.functions.vector_np import fold_gram

        @pandas_udf("long")
        def srp_bucket(vs: pd.Series) -> pd.Series:
            P = np.asarray(planes, dtype=np.float64)  # (n_bits, dim)
            X = np.stack(vs.to_numpy()).astype(np.float64)
            bits = (fold_gram(X, P) >= 0).astype(np.int64)
            return pd.Series(bits @ (1 << np.arange(n_bits, dtype=np.int64)))

        return df.withColumn(
            "bucket", srp_bucket(F.col(vec_col).cast("array<double>"))
        )
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
    # `queries` is broadcast UNCONDITIONALLY: the search contract is
    # "few queries against a large corpus" — the caller bounds the query
    # set (a filter / explicit probe list), it does not scale with corpus
    # size. A corpus-scaled probe set should go through the bucketed
    # paths (srp_topk / ivf_topk), not a broadcast of every probe
    # (hint-vs-cardinality rule measured in SCALING.md batch 8).
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
    # deliberately NO spread() here: the scoring join fans every query row out
    # against the corpus, so the downstream work parallelizes off the join
    # itself; an extra exchange on the corpus was measured pure overhead at
    # small scale and redundant at large (many input files already split it)
    return df.select(
        F.col(id_col),
        F.col(vec_col).alias("v"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col), dim)).alias("nrm"),
    )


def block_pair_memberships(n_blocks: int) -> F.Column:
    """Block-pair membership array for a row whose block id sits in an int
    column named ``blk``: the distinct ``(least(blk, j), greatest(blk, j))``
    structs for j in 0..n_blocks-1 — every unordered block pair this row's
    block participates in.

    Built as a SQL ``transform(sequence(...))`` so the Catalyst expression
    tree is **O(1) in n_blocks** (r11 ADVICE: the previous per-row literal
    ``F.array`` of n_blocks struct expressions grew the plan — and codegen —
    linearly with the auto-derived block count, which itself grows with the
    corpus; at multi-million-row corpora that blows codegen limits on top
    of the intended n_blocks× shuffle replication). Per-row eval is still
    O(n_blocks) work and the shuffle still replicates n_blocks× — that is
    the block-pair product's intrinsic cost, documented at both call sites
    with the "use SRP/IVF beyond a few million vectors" caveat.

    Raises :class:`BindError` for ``n_blocks < 1``: ``sequence(0, -1)`` is
    a DESCENDING ``[0, -1]`` in Spark, so a user-pinned 0 would silently
    yield bogus negative block pairs instead of an error (r12 ADVICE)."""
    if int(n_blocks) < 1:
        from duckdb_nats_jetstream_spark.errors import BindError

        raise BindError(f"n_blocks must be >= 1, got {n_blocks}")
    return F.array_distinct(
        F.expr(
            f"transform(sequence(0, {int(n_blocks)} - 1), "
            f"j -> named_struct("
            f"'p', least(blk, CAST(j AS INT)), "
            f"'q', greatest(blk, CAST(j AS INT))))"
        )
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


def hard_negative_topk(
    df: DataFrame,
    query_max_id: int = 10,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    dim: int = 64,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector (id < ``query_max_id``), the top-``k`` most-similar corpus
    vectors with a DIFFERENT label — the maximally confusable non-matches
    that make the strongest negatives in a triplet/InfoNCE batch.

    Same plan as :func:`cosine_topk` (bounded query broadcast × one
    corpus scan, per-query window over the scored pairs) with the label
    anti-predicate pushed into the broadcast-join condition, so rejected
    pairs never leave the join. A pair is a negative only when BOTH
    labels are KNOWN and different — the training-safe definition: an
    unlabeled candidate might be a positive, and mining it as a negative
    poisons the contrastive loss, so NULL labels are excluded on either
    side (a NULL-label query mines nothing; pre-filter or pseudo-label
    first). The explicit isNotNull guards also keep the ``!=`` total.
    Returns (query_id, neighbor_id, rnk, cos_r).
    """
    base = df.select(
        F.col(id_col),
        F.col(label_col).alias("lbl"),
        F.col(vec_col).alias("v"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col), dim)).alias("nrm"),
    )
    queries = base.filter(F.col(id_col) < query_max_id)
    scored = _scored_pairs(
        queries,
        base,
        id_col,
        extra_cond=(
            F.col("q.lbl").isNotNull()
            & F.col("c.lbl").isNotNull()
            & (F.col("q.lbl") != F.col("c.lbl"))
        ),
        dim=dim,
    )
    return _rank_topk(scored, k)


def contrastive_triplets(
    df: DataFrame,
    query_max_id: int = 10,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    dim: int = 64,
) -> DataFrame:
    """Contrastive training triplets: for each anchor vector (id <
    ``query_max_id``), the single best POSITIVE (same label, highest
    cosine) paired with the top-``k`` HARD NEGATIVES (different label,
    highest cosine) — the (anchor, positive, hard-negative) rows a
    triplet/InfoNCE loss consumes directly.

    One corpus scan serves both candidate classes: the bounded anchor set
    broadcasts against the corpus once (labels known on both sides — the
    same training-safe NULL policy as :func:`hard_negative_topk`), each
    pair is classed positive/negative by label equality, and a single
    window over (anchor, class) ranks both classes in one pass. The
    positive top-1 and negative top-k are then joined per anchor — two
    k-bounded lists, broadcast-trivial at any corpus size. An anchor with
    no same-label candidate yields no rows (a triplet needs all three
    legs). Returns (query_id, pos_id, pos_cos, neg_id, rnk, neg_cos).
    """
    base = df.select(
        F.col(id_col),
        F.col(label_col).alias("lbl"),
        F.col(vec_col).alias("v"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col), dim)).alias("nrm"),
    )
    queries = base.filter(F.col(id_col) < query_max_id)
    cond = (
        F.col(f"q.{id_col}") != F.col(f"c.{id_col}")
    ) & F.col("q.lbl").isNotNull() & F.col("c.lbl").isNotNull()
    score = dot(F.col("q.v"), F.col("c.v"), dim) / (
        F.col("q.nrm") * F.col("c.nrm")
    )
    scored = (
        F.broadcast(queries.alias("q"))
        .join(base.alias("c"), cond)
        .select(
            F.col(f"q.{id_col}").alias("query_id"),
            F.col(f"c.{id_col}").alias("cand_id"),
            (F.col("q.lbl") == F.col("c.lbl")).alias("is_pos"),
            score.alias("cos"),
        )
    )
    w = W.partitionBy("query_id", "is_pos").orderBy(
        F.col("cos").desc(), F.col("cand_id")
    )
    ranked = scored.withColumn("rn", F.row_number().over(w))
    pos = ranked.filter(F.col("is_pos") & (F.col("rn") == 1)).select(
        "query_id",
        F.col("cand_id").alias("pos_id"),
        F.col("cos").alias("pos_cos"),
    )
    neg = ranked.filter(~F.col("is_pos") & (F.col("rn") <= k)).select(
        "query_id",
        F.col("cand_id").alias("neg_id"),
        F.col("rn").cast("long").alias("rnk"),
        F.col("cos").alias("neg_cos"),
    )
    return pos.join(neg, "query_id").select(
        "query_id", "pos_id", "pos_cos", "neg_id", "rnk", "neg_cos"
    )


def _d2(X, C):
    """Squared euclidean distances, ||x||² - 2x·c + ||c||² matmul form —
    one BLAS gemm instead of an n×k×dim broadcast temp (the difference
    between milliseconds and seconds already at 100k×64)."""
    import numpy as np

    d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
    return np.maximum(d2, 0.0)


def _kmeans_sample(X, n_clusters: int, seed: int, iters: int = 20):
    """Lloyd's k-means with k-means++ init on a driver-side sample —
    deterministic for a fixed seed. Sized for samples up to ~100k×dim."""
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = [X[rng.randint(len(X))]]
    # k-means++: maintain the running min-distance incrementally — each new
    # center costs one n×dim pass, not a rescan against every center so far
    d2_min = _d2(X, np.asarray(centers, dtype=float)).ravel()
    for _ in range(n_clusters - 1):
        total = d2_min.sum()
        if total <= 0:
            nxt = X[rng.randint(len(X))]
        else:
            nxt = X[rng.choice(len(X), p=d2_min / total)]
        centers.append(nxt)
        d2_min = np.minimum(d2_min, _d2(X, nxt[None, :]).ravel())
    C = np.asarray(centers, dtype=float)
    for _ in range(iters):
        assign = _d2(X, C).argmin(axis=1)
        new_c = C.copy()
        for j in range(n_clusters):
            pts = X[assign == j]
            if len(pts):
                new_c[j] = pts.mean(axis=0)
        if np.allclose(new_c, C):
            break
        C = new_c
    return C


def fit_codebook(
    df: DataFrame,
    n_clusters: int,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    fit_sample_size: int = 100_000,
) -> list[list[float]]:
    """Train a k-means codebook on a bounded deterministic sample (the k
    smallest ids — TakeOrderedAndProject, not a full sort): the production
    IVF pattern where index training never scans the full corpus. The one
    shared fit path for :func:`ivf_topk` and ``sinks.write_ann_index``."""
    import numpy as np

    sample = (
        df.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .sort(id_col)
        .limit(fit_sample_size)
        .collect()
    )
    if not sample:
        from duckdb_nats_jetstream_spark.errors import BindError

        raise BindError("cannot fit a codebook on an empty corpus")
    return _kmeans_sample(
        np.asarray([r.v for r in sample], dtype=float), n_clusters, seed
    ).tolist()


def nearest_centroid_udf(c_list: list[list[float]]):
    """Arrow-vectorized nearest-centroid assignment against a broadcast
    codebook, with fold-exact distances (not BLAS): an oracle recomputing
    the same ``(xx - 2*gram) + cc`` doubles sees the identical argmin —
    assignments can't flip across engines. Shared by :func:`ivf_topk` and
    the ANN index sink (``sinks.write_ann_index``)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from duckdb_nats_jetstream_spark.functions.vector_np import fold_d2

    @pandas_udf("int")
    def nearest(vs: pd.Series) -> pd.Series:
        carr = np.asarray(c_list)
        xs = np.stack(vs.to_numpy())
        return pd.Series(fold_d2(xs, carr).argmin(axis=1).astype("int32"))

    return nearest


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
    fit_sample_size: int = 100_000,
) -> DataFrame:
    """IVF-style approximate top-k: train centroids on a bounded driver-side
    sample (the way production IVF indexes are built — training never scans
    the full corpus), broadcast them, assign every corpus vector to its
    nearest centroid with one Arrow-vectorized pass, then search only the
    ``n_probe`` clusters nearest each query and re-rank with exact cosine.

    The scale shape: centroid training is O(sample); the corpus is touched
    by exactly one distributed map (assignment) plus the probed fraction
    (n_probe/n_clusters) of the candidate join — no ML-pipeline iteration
    jobs over the full data, and probe selection runs vectorized where the
    query rows live (an arbitrarily large query side never reaches the
    driver). Not oracle-expressible (k-means), so the registry records it
    rows-only; tests verify recall against :func:`cosine_topk`."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    c_list = fit_codebook(
        df, n_clusters, seed, vec_col, id_col, fit_sample_size
    )  # closure-captured; broadcast with the udf

    from duckdb_nats_jetstream_spark.functions.vector_np import fold_d2

    nearest_centroid = nearest_centroid_udf(c_list)

    @pandas_udf("array<int>")
    def probe_clusters(vs: pd.Series) -> pd.Series:
        # n_probe nearest centroids per query vector, computed where the
        # query rows live — the query side can itself be 100 TB-scale (batch
        # ANN lookup for a whole corpus) and never touches the driver.
        # Stable argsort = deterministic tie-break on centroid index
        # (mirrors ORDER BY d2, cl in the oracle).
        carr = np.asarray(c_list)
        xs = np.stack(vs.to_numpy())
        idx = np.argsort(fold_d2(xs, carr), axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(idx.astype("int32")))

    base = _prep(df, vec_col, id_col, dim).withColumn(
        "cluster", nearest_centroid(F.col("v").cast("array<double>"))
    )
    queries = base.filter(F.col(id_col) < query_max_id).withColumn(
        "probe_cluster",
        F.explode(probe_clusters(F.col("v").cast("array<double>"))),
    )

    # (query, candidate) pairs are unique by construction — a candidate
    # lives in exactly one cluster and a query's probe clusters are distinct
    cand = (
        F.broadcast(queries)
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
    )
    return _rank_topk(cand, k)


def sql_ivf_topk(
    sf_dir: str,
    query_max_id: int = 10,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 2,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    fit_sample_size: int = 100_000,
) -> str:
    """DuckDB oracle for :func:`ivf_topk` — KMeans itself has no SQL, so
    the oracle *embeds the trained codebook as literals*: it re-runs the
    identical deterministic training (same bounded ORDER BY id sample, same
    seeded ``_kmeans_sample``) on the parquet directly, then expresses
    assignment / probe selection / re-rank in pure SQL against those
    centroid constants. Distances evaluate as ``(dot(x,x) − 2.0·dot(x,c)) +
    cc`` with left-fold dots — bit-identical to the operator's
    :func:`functions.vector_np.fold_d2` — and ties break on centroid index
    both sides (stable argsort ↔ ``ORDER BY d2, cl``), so what was a
    rows-only registry entry becomes a full hash-parity gate."""
    import duckdb
    import numpy as np

    from duckdb_nats_jetstream_spark.functions.vector_np import fold_sq_norms

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT list_transform({vec_col}, x -> CAST(x AS DOUBLE)) "
        f"FROM '{sf_dir}/{table}.parquet' ORDER BY {id_col} LIMIT {fit_sample_size}"
    ).fetchall()
    con.close()
    X = np.asarray([r[0] for r in rows], dtype=float)
    C = _kmeans_sample(X, n_clusters, seed)
    cc = fold_sq_norms(C)
    cent_rows = ",\n    ".join(
        f"({j}, {sql_lit_vec(list(C[j]))}, {sql_lit_f64(cc[j])})"
        for j in range(n_clusters)
    )
    return f"""
WITH v0 AS (
  SELECT {id_col}, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
  FROM {table}
), vv AS (
  SELECT {id_col}, v, {sql_dot('v', 'v')} AS vv FROM v0
), cent(cl, cv, cc) AS (
  VALUES
    {cent_rows}
), dist AS (
  SELECT b.{id_col}, b.cl,
         ((b.vv - CAST(2.0 AS DOUBLE) * b.dp) + b.cc) AS d2
  FROM (
    SELECT b.{id_col}, b.vv, c.cl, c.cc, {sql_dot('b.v', 'c.cv')} AS dp
    FROM vv b CROSS JOIN cent c
  ) b
), assigned AS (
  SELECT {id_col}, cl AS cluster FROM (
    SELECT *, row_number() OVER (PARTITION BY {id_col} ORDER BY d2, cl) AS rn
    FROM dist
  ) WHERE rn = 1
), probes AS (
  SELECT {id_col} AS qid, cl AS probe FROM (
    SELECT *, row_number() OVER (PARTITION BY {id_col} ORDER BY d2, cl) AS rn
    FROM dist WHERE {id_col} < {query_max_id}
  ) WHERE rn <= {n_probe}
), s AS (
  SELECT q.{id_col} AS query_id, c.{id_col} AS neighbor_id,
         {sql_dot('q.v', 'c.v')} / (sqrt(q.vv) * sqrt(c.vv)) AS cos
  FROM probes p
  JOIN vv q ON q.{id_col} = p.qid
  JOIN assigned a ON a.cluster = p.probe
  JOIN vv c ON c.{id_col} = a.{id_col} AND c.{id_col} != q.{id_col}
), r AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rn
  FROM s
)
SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rnk, cos AS cos_r
FROM r WHERE rn <= {k}
"""


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
    # project (id, v, nrm, bucket) off the bucketed frame directly — the
    # bucket column is already ON these rows, and the previous
    # re-attachment via a corpus×corpus self-join on id shuffled the
    # whole corpus twice to recover it (r09 review)
    base = bucketed.select(
        F.col(id_col),
        F.col(vec_col).alias("v"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col), dim)).alias("nrm"),
        "bucket",
    )
    queries = base.filter(F.col(id_col) < query_max_id)
    scored = _scored_pairs(
        queries, base, id_col,
        extra_cond=F.col("q.bucket") == F.col("c.bucket"), dim=dim,
    )
    return _rank_topk(scored, k)


def knn_join(
    df: DataFrame,
    k: int = 3,
    n_blocks: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    target_block_rows: int = 4096,
) -> DataFrame:
    """Exact k-NN **self-join**: every vector gets its top-k cosine
    neighbors, both sides the full corpus. Fills the gap between
    :func:`cosine_topk` (small broadcast query side) and
    ``dedup.embedding_near_dup_pairs`` (threshold, not top-k).

    Plan: block-pair product like the near-dup operator — ids hash into
    ``n_blocks`` blocks, every unordered block pair is one ``applyInPandas``
    group — but each group emits only the **per-row partial top-k within the
    pair** (selected under the total order (cos desc, neighbor_id asc), so
    merging partials preserves the exact global top-k). Intermediate volume
    is O(n_blocks · N · k) instead of the N² score matrix; one final window
    rank merges the partials. Shuffle = n_blocks × corpus. The N²/2 dot
    products are intrinsic to exact k-NN — for corpora beyond a few million
    vectors use :func:`srp_topk` / IVF.

    ``n_blocks`` defaults to AUTO-BLOCKING on two dials (pass an int to
    pin): (a) memory — ``ceil(N / target_block_rows)`` caps the per-task
    block-pair cosine matrix at ~``target_block_rows``² doubles (134 MB
    at the 4096 default); the old fixed 4 meant task memory grew
    quadratically with the corpus (34→208 MB on 10× data, r10 sweep);
    (b) parallelism — the smallest b with b(b+1)/2 ≥ 2×defaultParallelism,
    so the block-pair task count covers the executor slots in ≥2 waves
    (the r10 sweep's sf1 run under the fixed 4 scheduled 10 tasks on 32
    cores: the intrinsic N² gram work is parallel by construction, and
    leaving 2/3 of the slots idle doubled the wall for free).

    Inside each block pair the per-row top-k is selected by a STABLE
    argsort over candidate columns pre-sorted by id — cos ties break by
    ascending neighbor id exactly like the (cos desc, id asc) oracle
    order, with no per-row Python loop (the r10 sweep found the old
    per-row ``np.lexsort`` loop dominating the sf1 wall).

    Cosine uses the fold-exact numpy kernel, so results are bit-identical to
    the column-fold oracle (cross join + row_number). ``dim`` is accepted
    for API symmetry with :func:`cosine_topk` / ``functions.vector.dot``
    and, like there, does NOT truncate vectors — the kernel always uses the
    full stored width. Returns (query_id, neighbor_id, rnk, cos_r).
    """
    import math

    import numpy as np

    from duckdb_nats_jetstream_spark.functions.vector_np import pairwise_cosine

    if n_blocks is None:
        par = df.sparkSession.sparkContext.defaultParallelism
        b = 2
        while b * (b + 1) // 2 < 2 * par:
            b += 1
        n_blocks = max(b, math.ceil(df.count() / target_block_rows))
    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    rows = df.select(F.col(id_col), F.col(vec_col), blk.alias("blk"))
    pairs = rows.select(
        id_col,
        vec_col,
        "blk",
        F.explode(block_pair_memberships(n_blocks)).alias("bp"),
    )

    def _partial_topk(ids_q, cos, ids_c, out):
        """Per-row top-k under (cos desc, neighbor_id asc), vectorized:
        ``ids_c`` is ASCENDING (callers sort their block by id), so a
        STABLE argsort on -cos breaks cos ties by candidate position =
        candidate id — identical selection to the old per-row lexsort.
        Masked self-pairs (-inf) and NaN cosines (zero-norm vectors:
        undefined similarity is no neighbor — r09 review) sort past
        every finite value and are dropped by the finite filter."""
        import pandas as pd

        kk = min(k, cos.shape[1])
        sel = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(np.arange(cos.shape[0]), kk)
        cols = sel.ravel()
        vals = cos[rows, cols]
        m = np.isfinite(vals)
        out.append(
            pd.DataFrame(
                {
                    "query_id": ids_q[rows[m]],
                    "neighbor_id": ids_c[cols[m]],
                    "cos": vals[m],
                }
            )
        )

    def _block_pair(key, pdf):
        import pandas as pd

        cols = ["query_id", "neighbor_id", "cos"]
        p, q = key
        if pdf.empty:
            return pd.DataFrame(columns=cols)
        pdf = pdf.sort_values(id_col)  # ascending ids → stable tie-break
        out: list = []
        if p == q:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy()
            cos = pairwise_cosine(m, m)
            np.fill_diagonal(cos, -np.inf)  # exclude self
            _partial_topk(ids, cos, ids, out)
        else:
            pa = pdf[pdf["blk"] == p]
            pb = pdf[pdf["blk"] == q]
            if pa.empty or pb.empty:
                return pd.DataFrame(columns=cols)
            ma = np.stack(pa[vec_col].to_numpy()).astype(np.float64)
            mb = np.stack(pb[vec_col].to_numpy()).astype(np.float64)
            ids_a = pa[id_col].to_numpy()
            ids_b = pb[id_col].to_numpy()
            cos = pairwise_cosine(ma, mb)
            _partial_topk(ids_a, cos, ids_b, out)
            _partial_topk(ids_b, np.ascontiguousarray(cos.T), ids_a, out)
        if not out:
            return pd.DataFrame(columns=cols)
        return pd.concat(out, ignore_index=True)

    partial = pairs.groupBy("bp.p", "bp.q").applyInPandas(
        _block_pair, "query_id long, neighbor_id long, cos double"
    )
    return _rank_topk(partial, k)


def sql_knn_join(
    k: int = 3, table: str = "embeddings", vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB mirror of :func:`knn_join` — the textbook cross join +
    row_number the operator decomposes."""
    return f"""
WITH base AS (
  SELECT {id_col}, {vec_col} AS v, sqrt({sql_dot(vec_col, vec_col)}) AS nrm
  FROM {table}
), s AS (
  SELECT a.{id_col} AS query_id, b.{id_col} AS neighbor_id,
         {sql_dot('a.v', 'b.v')} / (a.nrm * b.nrm) AS cos
  FROM base a JOIN base b ON a.{id_col} != b.{id_col}
), r AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rn
  FROM s
)
SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rnk, cos AS cos_r
FROM r WHERE rn <= {k}
"""


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector symmetric int8 quantization with reconstruction-error
    audit — the storage-compression step of a large ANN corpus (4× smaller
    than float32, 8× than float64; IVF/SRP candidate generation runs fine on
    int8, the exact re-rank can dequantize).

    Row-local column math, zero shuffle, scale-free: ``scale = max|v|/127``,
    ``q_i = round(v_i/scale)``, error = max |q_i·scale − v_i| ≤ scale/2.
    Returns hashable scalars per vector: (id, scale, err_max, n_sat) where
    ``n_sat`` counts saturated ±127 cells. All arithmetic is double and the
    op sequence (abs, max, /, round, *, −) is identical in DuckDB, so values
    are bit-exact cross-engine (round: both engines take half away from
    zero; arguments are never exact halves except the max element, which is
    exactly ±127 pre-round).
    """
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col), vd.alias("__v"))
    scaled = base.select(
        id_col,
        "__v",
        # zero vectors quantize to zeros via the scale=1 guard (0/1=0), not NaN
        F.when(
            F.array_max(F.transform("__v", F.abs)) == 0, F.lit(1.0)
        ).otherwise(F.array_max(F.transform("__v", F.abs)) / F.lit(127.0)).alias(
            "__s"
        ),
    )
    q = scaled.select(
        id_col,
        "__v",
        "__s",
        F.transform("__v", lambda x: F.round(x / F.col("__s"))).alias("__q"),
    )
    return q.select(
        F.col(id_col),
        F.col("__s").alias("scale"),
        F.array_max(
            F.zip_with("__q", "__v", lambda qq, x: F.abs(qq * F.col("__s") - x))
        ).alias("err_max"),
        F.size(F.filter("__q", lambda qq: F.abs(qq) == 127)).cast("long").alias(
            "n_sat"
        ),
    )


def sql_quantize_int8(
    table: str = "embeddings", vec_col: str = "embedding", id_col: str = "vec_id"
) -> str:
    """DuckDB mirror of :func:`quantize_int8` (same op sequence, same
    zero-vector guard)."""
    return f"""
WITH v AS (
  SELECT {id_col}, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS e
  FROM {table}
), s AS (
  SELECT {id_col}, e,
         CASE WHEN list_max(list_transform(e, x -> abs(x))) = 0 THEN 1.0
              ELSE list_max(list_transform(e, x -> abs(x))) / 127.0 END AS sc
  FROM v
), q AS (
  SELECT {id_col}, e, sc, list_transform(e, x -> round(x / sc)) AS qv FROM s
)
SELECT {id_col}, sc AS scale,
       list_max(list_transform(range(1, len(e) + 1),
                               i -> abs(qv[CAST(i AS INT)] * sc
                                        - e[CAST(i AS INT)]))) AS err_max,
       CAST(len(list_filter(qv, x -> abs(x) = 127)) AS BIGINT) AS n_sat
FROM q
"""


def bucket_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_bits: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Per-SRP-bucket centroids — the codebook-refresh step of a bucketed
    ANN index (and one Lloyd iteration if fed back as centroids).

    Plan shape for 100 TB: posexplode fans each vector into (bucket, pos,
    val) rows — dim× the row count but tiny rows — and ONE hash aggregation
    on (bucket, pos) with map-side partial sums does the rest; no window, no
    sort, no driver collect. Float summation order differs between engines
    and partitionings, so the mean uses an EXACT fixed-point sum:
    ``round(val·10^12) → BIGINT`` is the same IEEE multiply + half-away
    round in both engines (a double→DECIMAL cast is NOT — Spark rounds,
    DuckDB truncates; measured r03), and the integer sum in DECIMAL(38,0)
    is associative and overflow-proof for any bucket size. The result is
    bit-stable cross-engine and run-to-run regardless of partitioning.
    Returns (bucket, pos, c, n).
    """
    bucketed = with_srp_bucket(df, vec_col, n_bits, dim)
    exploded = bucketed.select(
        "bucket",
        F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias(
            "pos", "val"
        ),
    )
    fixed = F.round(F.col("val") * F.lit(1e12)).cast("bigint")
    return exploded.groupBy("bucket", "pos").agg(
        (
            F.sum(fixed.cast("decimal(38,0)")).cast("double")
            / F.lit(1e12)
            / F.count(F.lit(1))
        ).alias("c"),
        F.count(F.lit(1)).alias("n"),
    )


def sql_bucket_centroids(
    table: str = "embeddings",
    vec_col: str = "embedding",
    n_bits: int = 6,
    dim: int = 64,
) -> str:
    """DuckDB mirror of :func:`bucket_centroids` (1-based range → 0-based
    pos; identical fixed-point exact mean)."""
    bucket = sql_srp_bucket(vec_col, n_bits, dim)
    return f"""
WITH b AS (
  SELECT {bucket} AS bucket,
         list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS e
  FROM {table}
), x AS (
  SELECT bucket, CAST(i - 1 AS INT) AS pos,
         CAST(round(e[CAST(i AS INT)] * 1e12) AS BIGINT) AS fx
  FROM b, range(1, {dim} + 1) r(i)
)
SELECT bucket, pos,
       CAST(SUM(CAST(fx AS DECIMAL(38,0))) AS DOUBLE) / 1e12 / COUNT(*) AS c,
       COUNT(*) AS n
FROM x GROUP BY bucket, pos
"""

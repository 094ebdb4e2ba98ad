"""KMV (k-minimum-values) distinct sketch with SET ALGEBRA — the theta-
sketch idea (Beyer et al. 2007; Apache DataSketches' theta family) built
from relational primitives.

HLL (`operators/hll.py`) estimates |A| but cannot intersect: register
maxima destroy membership. KMV keeps the k smallest *hash values* of a
set — a uniform sample of the hashed domain — so sketches support:

- **union**: k smallest of the concatenated sketches (associative,
  mergeable — same contract as every sketch here);
- **Jaccard / intersection**: of the union sketch's k values, the fraction
  present in BOTH input sketches estimates J(A,B); |A∩B| ≈ J·|A∪B|.

Everything is relational and cross-engine exact:
- the hash is the md5 hex STRING — fixed-length hex is uniformly ordered
  lexicographically, so "k smallest hashes" is ``ORDER BY h LIMIT k``
  (TakeOrderedAndProject in Spark — no global sort materializes);
- the estimator ``(k−1)/U_k`` converts ONLY the kth hash to a number: its
  first 13 hex chars as an integer (52 bits — exactly representable in a
  double). Spark parses with ``conv``; DuckDB with a 13-term positional
  ``strpos`` polynomial — different routes, identical integers;
- when a set has fewer than k distinct values the sketch IS the set and
  the estimate is the exact count (both sides take the same CASE).

Scale shape: per sketch, one hash projection + dedup + ``ORDER BY LIMIT k``
(top-k per partition, then k·partitions → k merge — never a full sort);
sketch ops touch only ≤ k-row relations. Reference scope: beyond the
reference extension (ref:src/nats_scan.cpp:700-790); north-star analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from duckdb_nats_jetstream_spark.operators.similarity import sql_lit_f64

#: sketch size — (k−1)/U_k has relative std error ≈ 1/sqrt(k−2) ≈ 6.3%
K = 256
_HEX = "0123456789abcdef"
#: 16^13 — the hash-prefix space the kth value is normalized against
_SPACE = float(16 ** 13)


def kmv_sketch(df: DataFrame, value_col: str, salt: str = "kmv:") -> DataFrame:
    """The ≤ k-row sketch relation ``(h)`` — the k lexicographically
    smallest md5 hex strings over the DISTINCT values of ``value_col``."""
    h = F.md5(F.concat(F.lit(salt), F.col(value_col).cast("string")))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(h.alias("h"))
        .distinct()
        .sort("h")
        .limit(K)
    )


def kmv_union(*sketches: DataFrame) -> DataFrame:
    """Union sketch: k smallest over the stacked sketch relations."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().sort("h").limit(K)


def _kth_num(h: F.Column) -> F.Column:
    # first 13 hex chars as an exact 52-bit integer (Spark route: conv)
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("double")


def kmv_union_with_membership(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union sketch with per-side membership flags →
    ``(h, in_ka, in_kb)``, ≤ k rows (r14 branch fold, r13 verdict ask #8).

    Same ``h`` set as ``kmv_union(a, b)`` — the groupBy IS the dedup —
    but each union-sketch row also records which input sketches contain
    it (``max`` of the tagged stack), so intersection/Jaccard counting
    needs NO semi-joins back into the inputs: each input is consumed
    exactly once and nothing needs to be persisted."""
    tagged = a.select(
        "h", F.lit(1).alias("ia"), F.lit(0).alias("ib")
    ).unionByName(b.select("h", F.lit(0).alias("ia"), F.lit(1).alias("ib")))
    return (
        tagged.groupBy("h")
        .agg(F.max("ia").alias("in_ka"), F.max("ib").alias("in_kb"))
        .sort("h")
        .limit(K)
    )


def kmv_intersection_stats(ku_flagged: DataFrame) -> DataFrame:
    """ONE single-row aggregate over :func:`kmv_union_with_membership`
    output: ``(n_union, n_match, est_union)`` — the union cardinality
    estimate (exact below k, (k−1)/U_k otherwise — same CASE as
    :func:`kmv_estimate`) and the both-sides match count
    (``h ∈ ka ∧ h ∈ kb`` ⇔ ``in_ka·in_kb``, exactly what a semi-join
    pair against the input sketches would test)."""
    agg = ku_flagged.agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max("h").alias("kth"),
        F.sum(F.col("in_ka") * F.col("in_kb")).alias("n_match"),
    )
    est = F.when(
        F.col("n_sketch") < K, F.col("n_sketch").cast("double")
    ).otherwise((F.lit(float(K - 1)) * F.lit(_SPACE)) / _kth_num(F.col("kth")))
    return agg.select(
        F.col("n_sketch").cast("long").alias("n_union"),
        F.col("n_match").cast("long").alias("n_match"),
        est.alias("est_union"),
    )


def kmv_estimate(sketch: DataFrame) -> DataFrame:
    """One-row ``(n_sketch, estimate)``: (k−1)/U_k, or the exact count when
    the sketch holds the whole set (n < k)."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_sketch"), F.max("h").alias("kth")
    )
    est = F.when(
        F.col("n_sketch") < K, F.col("n_sketch").cast("double")
    ).otherwise(
        (F.lit(float(K - 1)) * F.lit(_SPACE)) / _kth_num(F.col("kth"))
    )
    return agg.select(
        F.col("n_sketch").cast("long").alias("n_sketch"), est.alias("estimate")
    )


def sql_kmv_sketch(value_expr: str, table_expr: str, salt: str = "kmv:") -> str:
    """DuckDB mirror of :func:`kmv_sketch` (CTE body)."""
    return f"""
  SELECT DISTINCT md5('{salt.replace(chr(39), chr(39) * 2)}' || CAST({value_expr} AS VARCHAR)) AS h
  FROM {table_expr}
  WHERE {value_expr} IS NOT NULL
  ORDER BY h LIMIT {K}
"""


def sql_kth_num(h_expr: str) -> str:
    """13-term positional hex polynomial — the DuckDB route to the same
    exact 52-bit integer Spark's ``conv`` produces."""
    terms = [
        f"(strpos('{_HEX}', substr({h_expr}, {i + 1}, 1)) - 1) * {16 ** (12 - i)}"
        for i in range(13)
    ]
    return "CAST(" + " + ".join(terms) + " AS DOUBLE)"


def sql_kmv_estimate(sketch_cte: str) -> str:
    """DuckDB mirror of :func:`kmv_estimate` (a SELECT over a sketch CTE)."""
    return f"""
  SELECT CAST(count(*) AS BIGINT) AS n_sketch,
         CASE WHEN count(*) < {K} THEN CAST(count(*) AS DOUBLE)
              ELSE ({sql_lit_f64(K - 1)} * {sql_lit_f64(_SPACE)}) / {sql_kth_num('max(h)')}
         END AS estimate
  FROM {sketch_cte}
"""

"""Fuzzy key matching (entity resolution) via symmetric-delete blocking.

The SymSpell observation: two strings at Levenshtein distance ≤ 1 always
share a key in the union of {s} and s's single-character-deletion
neighborhood — a substitution matches after deleting the differing
position from both; an insert/delete matches the shorter string's identity
key against one of the longer's deletion keys. So candidate generation is
an equi-join on deletion keys (shuffle on short string keys, candidates
bounded per key bucket) instead of an all-pairs edit-distance cross join,
and one exact ``levenshtein`` evaluation per *candidate* filters the
distance-2 false positives that share a deletion key.

Scale shape: the neighborhood explode is row-local (len+1 keys per
string); the join shuffles (key, string) pairs; verification is a
row-local integer DP. The all-pairs plan this replaces is quadratic in
the corpus — the oracle runs it, which is exactly why the oracle is the
brute-force mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fuzzy_key_pairs(df: DataFrame, key_col: str) -> DataFrame:
    """Distinct unordered pairs of ``key_col`` values at Levenshtein
    distance exactly 1 (equal values are identical keys, not fuzzy
    matches). Returns (s_a, s_b, dist) with s_a < s_b."""
    s = df.select(F.col(key_col).alias("s")).distinct()
    dels = F.transform(
        F.sequence(F.lit(1), F.length("s")),
        lambda i: F.concat(
            F.substring(F.col("s"), F.lit(1), i - 1),
            F.substring(F.col("s"), i + 1, F.length("s")),
        ),
    )
    keyed = s.select(
        "s", F.explode(F.array_distinct(F.concat(F.array(F.col("s")), dels))).alias("k")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("s_a"), F.col("b.s").alias("s_b"))
        .distinct()
    )
    dist = F.levenshtein("s_a", "s_b")
    return cand.filter(dist <= 1).select(
        "s_a", "s_b", dist.cast("long").alias("dist")
    )


def sql_fuzzy_key_pairs(source_sql: str) -> str:
    """Brute-force oracle: distinct self-join + levenshtein over
    ``source_sql`` (a subquery yielding one column ``s``)."""
    return f"""
WITH d AS (SELECT DISTINCT s FROM ({source_sql}))
SELECT a.s AS s_a, b.s AS s_b,
       CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
FROM d a JOIN d b ON a.s < b.s
WHERE levenshtein(a.s, b.s) <= 1
"""

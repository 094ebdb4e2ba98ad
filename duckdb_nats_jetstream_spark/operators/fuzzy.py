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
    matches). Returns (s_a, s_b, dist) with s_a < s_b.

    Candidates are generated WITHIN deletion-key groups (r13 optimization):
    ``groupBy(k).collect_list`` then a row-local ordered-pair expansion,
    instead of the previous self-join of the keyed relation — which planned
    the scan→distinct→explode subtree TWICE (no exchange reuse across the
    join aliases) plus the join's own exchanges. One pass and one shuffle
    now build every candidate group. This is safe at any corpus size
    because a deletion-key group is bounded by construction: the strings
    matching key ``k`` are ``k`` itself plus single-character insertions
    into ``k`` — at most ``(len(k)+1) × |alphabet| + 1`` DISTINCT values,
    independent of row count (duplicates are collapsed by the upstream
    ``distinct`` and ``array_distinct``)."""
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
    groups = (
        keyed.groupBy("k")
        .agg(F.array_sort(F.collect_list("s")).alias("ss"))
        .filter(F.size("ss") >= 2)
    )
    # ordered pairs (x, y) with x < y — the array is sorted and duplicate-
    # free (each s contributes a given key once via array_distinct), so
    # pairing each element with its successors preserves the old
    # ``a.s < b.s`` join condition exactly
    pair = F.explode(
        F.flatten(
            F.expr(
                "transform(ss, (x, i) -> "
                "transform(slice(ss, i + 2, size(ss)), y -> struct(x, y)))"
            )
        )
    ).alias("p")
    cand = groups.select(pair).select(
        F.col("p.x").alias("s_a"), F.col("p.y").alias("s_b")
    ).distinct()
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

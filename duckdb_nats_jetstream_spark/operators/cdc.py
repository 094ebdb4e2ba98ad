"""Corpus snapshot diffing — the change-data-capture step of dataset
versioning: given two snapshots of a keyed corpus, classify every key as
added / removed / changed / unchanged by content digest. Training-data
pipelines run this between crawl refreshes to re-process only the delta
(and to audit how much of the corpus churned).

Scale shape: one full outer sort-merge/shuffle join on the id — the
minimum possible; content comparison is md5-digest equality computed
row-local on each side before the join, so the shuffle carries (id, 32-hex)
not document bodies. Complements the SCD2 validity-interval query
(``scan_scd2_intervals``), which tracks history *within* one table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """(id, status, old_md5, new_md5) with status ∈ added | removed |
    changed | unchanged.

    Presence is tracked with explicit marker columns, NOT digest nullness:
    ``md5(NULL)`` is NULL, so a NULL-content row would otherwise be
    indistinguishable from an absent row (misclassified added/removed).
    Digest comparison is null-safe — NULL content vs NULL content is
    ``unchanged``, NULL vs text is ``changed``.
    """
    o = old.select(
        F.col(id_col),
        F.md5(F.col(content_col)).alias("old_md5"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(id_col),
        F.md5(F.col(content_col)).alias("new_md5"),
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.col("old_md5").eqNullSafe(F.col("new_md5")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(id_col, status.alias("status"), "old_md5", "new_md5")


def sql_snapshot_diff(old_sql: str, new_sql: str, id_col: str = "doc_id",
                      content_col: str = "text") -> str:
    """DuckDB mirror: ``old_sql`` / ``new_sql`` are subqueries yielding
    (id, content)."""
    return f"""
WITH o AS (
  SELECT {id_col}, md5({content_col}) AS old_md5, TRUE AS in_old
  FROM ({old_sql})
), n AS (
  SELECT {id_col}, md5({content_col}) AS new_md5, TRUE AS in_new
  FROM ({new_sql})
)
SELECT coalesce(o.{id_col}, n.{id_col}) AS {id_col},
       CASE WHEN o.in_old IS NULL THEN 'added'
            WHEN n.in_new IS NULL THEN 'removed'
            WHEN o.old_md5 IS NOT DISTINCT FROM n.new_md5 THEN 'unchanged'
            ELSE 'changed' END AS status,
       o.old_md5, n.new_md5
FROM o FULL OUTER JOIN n ON o.{id_col} = n.{id_col}
"""

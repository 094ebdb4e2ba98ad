"""Deterministic stratified sampling for training-data pipelines
(north-star surface — beyond the reference): exact per-group quotas
selected by salted content hash, reproducible across runs and engines
(no RNG, no ``TABLESAMPLE``).

``stratified_hash_topn(df, group_col, n)`` keeps, for every group, the
``n`` rows with the smallest ``md5(salt || id)`` — i.e. a uniform,
deterministic without-replacement sample of fixed size per stratum
(domain/language mixing quotas, eval-set carving, per-source caps).

Scale shape (the 100 TB path): the naive plan — one window over every
group — funnels each stratum through a single task, which dies when one
domain holds billions of rows. Instead:

1. aggregate per-group row counts (map-side combine, tiny output) and
   broadcast them;
2. **coarse hash prefilter**: keep rows whose hash prefix falls below a
   per-group threshold sized for ``margin × n`` expected survivors — a
   row-local comparison that discards ~``1 - margin·n/count`` of every
   large group before any shuffle (md5 hex is fixed-width, so the
   lexicographic prefix compare IS the numeric compare);
3. exact rank window over the survivors only;
4. **declarative shortfall guard**: the prefilter is probabilistic, so
   groups whose survivor rank-count came up short of ``min(n, count)``
   are re-ranked from the full input (broadcast semi-join on the
   shortfall group list) and unioned in. The guard is an empty join in
   the overwhelmingly common case — the plan stays exact ALWAYS without
   any driver-side retry loop.

Determinism/exactness: selection depends only on (salt, id) — engine-,
partitioning-, and prefilter-independent — so a plain QUALIFY window in
DuckDB mirrors it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

#: hash-prefix width (hex chars) used for the coarse threshold compare
_PFX = 8
_PFX_SPACE = 16 ** _PFX


def sample_hash(id_col: Column, salt: str) -> Column:
    """The salted selection hash: ``md5(salt || ':' || id)``."""
    return F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string")))


def stratified_hash_topn(
    df: DataFrame,
    group_col: str,
    n: int,
    id_col: str = "doc_id",
    salt: str = "strat",
    margin: float = 4.0,
    rank_col: str = "smp_rank",
) -> DataFrame:
    """Exact deterministic n-per-group sample; see module docstring.

    ``margin`` sizes the coarse prefilter (expected survivors per group =
    ``margin × n``); ``margin=None`` disables it (plain window — fine when
    every group is small)."""
    h = sample_hash(F.col(id_col), salt)
    w = W.partitionBy(group_col).orderBy("__h", id_col)
    hashed = df.withColumn("__h", h)

    def ranked(in_df: DataFrame) -> DataFrame:
        return (
            in_df.withColumn(rank_col, F.row_number().over(w).cast("long"))
            .filter(F.col(rank_col) <= n)
        )

    if margin is None:
        return ranked(hashed).drop("__h")

    counts = hashed.groupBy(group_col).agg(F.count("*").alias("__gcnt"))
    # per-group prefix threshold: ceil(space * margin * n / count), capped
    # cap at space-1 ("ffffffff", keeps everything): the cap must stay
    # _PFX hex chars wide or the lpad would truncate it into a SMALLER bound
    thr = F.least(
        F.lit(_PFX_SPACE - 1),
        F.ceil(F.lit(float(_PFX_SPACE) * margin * n) / F.col("__gcnt")).cast("long"),
    )
    thr_hex = F.lpad(F.lower(F.conv(thr.cast("string"), 10, 16)), _PFX, "0")
    counts = counts.withColumn("__thr", thr_hex)

    survivors = hashed.join(F.broadcast(counts), group_col).filter(
        F.substring("__h", 1, _PFX) <= F.col("__thr")
    )
    kept = ranked(survivors)

    # groups where the prefilter starved the quota (kept < min(n, count));
    # anchored on `counts`, not `kept` — a fully-starved group has NO kept
    # rows at all and must still be flagged (left join + coalesce 0)
    shortfall = (
        counts.join(
            kept.groupBy(group_col).agg(F.count("*").alias("__kept")),
            group_col,
            "left",
        )
        .filter(
            F.coalesce(F.col("__kept"), F.lit(0).cast("long"))
            < F.least(F.lit(n).cast("long"), F.col("__gcnt"))
        )
        .select(group_col)
    )
    ok = kept.join(F.broadcast(shortfall), group_col, "left_anti")
    redo = ranked(hashed.join(F.broadcast(shortfall), group_col, "left_semi"))
    out_cols = df.columns + [rank_col]
    return ok.select(out_cols).unionByName(redo.select(out_cols))

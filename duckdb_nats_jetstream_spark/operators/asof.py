"""As-of (point-in-time) join — a custom operator the host engines differ on.

DuckDB ships native ``ASOF JOIN`` (the oracle side); Spark has no built-in,
so this implements the canonical distributed shape: union both sides tagged,
one shuffle by key, and a running ``last(..., ignorenulls)`` window that
carries the most recent right-side row forward onto each left row. No
broadcast, no range explosion — cost is a single hash shuffle plus a sorted
window scan per key, which survives a 100× scale-up as long as keys are not
pathologically skewed (salt upstream if one key dominates).

The reference has no as-of join (its join surface is inner-equi/cross only,
ref:test/sql/test_json_extraction.sql:230-249); this belongs to the
north-star pipeline surface (time-aligned feature lookup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from duckdb_nats_jetstream_spark.errors import BindError

_L, _R = "__asof_is_left", "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    direction: str = "backward",
    tie_col: str | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Left as-of join: each left row gains the right row with the greatest
    ``right_ts <= left_ts`` (``backward``, inclusive — DuckDB ``ASOF JOIN``
    semantics) or the least ``right_ts >= left_ts`` (``forward``) within the
    same ``on`` key(s). Unmatched left rows keep NULLs (ASOF *LEFT* JOIN).

    ``right_cols`` maps right column → output alias. ``tie_col`` (a right
    column) deterministically breaks ties between right rows sharing one
    timestamp; required only when (key, right_ts) is not unique.
    ``tolerance_us`` (timestamp columns only) is the feature-store
    max-staleness bound: a match farther than this many microseconds from
    the left timestamp is nulled out, exactly as if no right row existed —
    stale features are worse than missing ones. Enforced AFTER the window
    (row-local), so the plan shape is unchanged.
    """
    if direction not in ("backward", "forward"):
        raise BindError(f"asof_join direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    for c in keys + [left_ts]:
        if c not in left.columns:
            raise BindError(f"asof_join: left side lacks column '{c}'")
    for c in keys + [right_ts] + list(right_cols):
        if c not in right.columns:
            raise BindError(f"asof_join: right side lacks column '{c}'")
    clash = set(right_cols.values()) & set(left.columns)
    if clash:
        raise BindError(f"asof_join output column(s) {sorted(clash)} collide with left side")

    payload = F.struct(
        F.col(right_ts).alias("__asof_mts"), *[F.col(c) for c in right_cols]
    )
    # a NULL-timestamp right row can never be "as of" anything (SQL
    # comparisons with NULL match nothing — DuckDB ASOF JOIN drops such
    # rows), but the union+window encoding sorts nulls FIRST, where
    # last(ignorenulls) would happily pick the row's payload as a match
    # for every left row with no real predecessor (r10 review)
    r = right.filter(F.col(right_ts).isNotNull()).select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias(_L),
        payload.alias(_R),
        (F.col(tie_col) if tie_col else F.lit(0)).alias("__asof_tie"),
    )
    l = left.select(  # noqa: E741
        "*",
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias(_L),
        F.lit(None).cast(r.schema[_R].dataType).alias(_R),
        F.lit(None).cast(r.schema["__asof_tie"].dataType).alias("__asof_tie"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # backward: right rows at an equal timestamp sort BEFORE left rows
    # (inclusive bound); among tied right rows the greatest tie_col wins.
    if direction == "backward":
        order = [F.col("__asof_ts").asc(), F.col(_L).asc(), F.col("__asof_tie").asc()]
        frame = W.unboundedPreceding, W.currentRow
    else:
        order = [F.col("__asof_ts").desc(), F.col(_L).asc(), F.col("__asof_tie").desc()]
        frame = W.unboundedPreceding, W.currentRow
    w = W.partitionBy(*keys).orderBy(*order).rowsBetween(*frame)
    matched = (
        u.withColumn("__asof_match", F.last(_R, ignorenulls=True).over(w))
        .filter(F.col(_L) == 1)
    )
    if tolerance_us is not None:
        lus = F.unix_micros(F.col("__asof_ts"))
        mus = F.unix_micros(F.col("__asof_match.__asof_mts"))
        staleness = lus - mus if direction == "backward" else mus - lus
        matched = matched.withColumn(
            "__asof_match",
            F.when(staleness <= F.lit(tolerance_us), F.col("__asof_match")),
        )
    out_cols = [c for c in left.columns] + [
        F.col(f"__asof_match.{src}").alias(dst) for src, dst in right_cols.items()
    ]
    return matched.select(*out_cols)

"""Binned interval (range) join — point-in-interval matching at scale.

A naive ``p.ts BETWEEN i.start AND i.end`` join has no equi-key, so Spark
plans a broadcast-nested-loop or cartesian product — quadratic at 100 TB.
This operator bins time: each interval registers in every bin it overlaps
(``sequence`` + ``explode``), each point lands in exactly one bin, and the
join becomes a plain hash equi-join on (keys, bin) followed by the exact
BETWEEN filter. Each (point, interval) pair appears at most once because a
point lives in exactly one bin. Bin width should be on the order of the
typical interval length: wider wastes filter work, narrower multiplies the
interval-side explosion (an interval covers ``len/bin + 1`` bins).

The reference has no range join (inner-equi/cross only,
ref:test/sql/test_json_extraction.sql:230-249); north-star pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from duckdb_nats_jetstream_spark.errors import BindError


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_width: str = "1 hour",
) -> DataFrame:
    """Inner join: every (point, interval) pair sharing the ``on`` key(s)
    with ``start_col <= point_ts <= end_col`` (inclusive both ends).
    Output = all point columns + all interval columns (names must not
    collide; alias beforehand)."""
    keys = [on] if isinstance(on, str) else list(on)
    for c in keys + [point_ts]:
        if c not in points.columns:
            raise BindError(f"interval_join: points side lacks column '{c}'")
    for c in keys + [start_col, end_col]:
        if c not in intervals.columns:
            raise BindError(f"interval_join: intervals side lacks column '{c}'")
    clash = (set(points.columns) - set(keys)) & set(intervals.columns)
    if clash:
        raise BindError(
            f"interval_join: column(s) {sorted(clash)} exist on both sides; alias them first"
        )
    if "__bin" in points.columns or "__bin" in intervals.columns:
        # withColumn would silently overwrite it and drop() would then
        # delete the user's data — unlike every other collision, which errors
        raise BindError(
            "interval_join: '__bin' is a reserved internal column; alias it first"
        )

    bin_us = F.lit(_width_to_us(bin_width))
    # inverted intervals (end < start) can never match (BETWEEN is false);
    # drop them BEFORE binning — sequence() would otherwise step DOWNWARD
    # from start to end, exploding one bad row into |start-end|/bin junk
    # bins that the final filter pays to discard
    intervals = intervals.filter(F.col(start_col) <= F.col(end_col))
    i_binned = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / bin_us),
                F.floor(F.unix_micros(F.col(end_col)) / bin_us),
            )
        ),
    )
    p_binned = points.withColumn(
        "__bin", F.floor(F.unix_micros(F.col(point_ts)) / bin_us)
    )
    joined = p_binned.join(i_binned, keys + ["__bin"]).filter(
        F.col(point_ts).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("__bin")


def _width_to_us(width: str) -> int:
    """'N unit' → microseconds. Deliberately tiny vocabulary — callers pass
    a plan-time constant, not data."""
    n, _, unit = width.partition(" ")
    unit_us = {
        "second": 1_000_000, "seconds": 1_000_000,
        "minute": 60_000_000, "minutes": 60_000_000,
        "hour": 3_600_000_000, "hours": 3_600_000_000,
        "day": 86_400_000_000, "days": 86_400_000_000,
    }.get(unit)
    if not unit_us or not n.isdigit() or int(n) <= 0:
        raise BindError(f"interval_join: bad bin_width {width!r} (use e.g. '1 hour')")
    return int(n) * unit_us

"""Named query registry — the driver-verified capability surface.

Each module exports ``QUERIES: dict[name -> (spark_fn, oracle_sql | None)]``
where ``spark_fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the
DuckDB-equivalent ANSI SQL (None for genuinely non-SQL-expressible ops, which
the driver checks rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
Registry = dict[str, tuple[QueryFn, str | None]]


def full_registry() -> Registry:
    from duckdb_nats_jetstream_spark.queries import (
        pipeline,
        pipeline2,
        relational,
        relational2,
        stream,
    )

    out: Registry = {}
    for mod in (stream, relational, relational2, pipeline, pipeline2):
        for name, entry in mod.QUERIES.items():
            assert name not in out, f"duplicate query name {name}"
            out[name] = entry
    return out

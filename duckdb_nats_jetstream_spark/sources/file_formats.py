"""Side-table ingest parity with the reference's host engine.

The reference runs inside DuckDB, so its users freely join NATS scans
against CSV/JSON side tables (read_csv / read_json_auto). A user switching
to this engine keeps that ability — with the schema discipline a cluster
run demands baked in:

- **Explicit schema beats inference at scale.** Schema inference is an
  extra full/partial pass over the input before the real job. These
  helpers accept a DDL string / StructType; when omitted they infer, but
  bound the inference cost (``samplingRatio`` for JSON) and log nothing
  silently: inference at 100 TB is a deliberate choice, not a default.
- **Malformed rows are data, not crashes.** Default mode is PERMISSIVE
  with a ``_corrupt_record`` column the caller can route to a quarantine
  sink; FAILFAST is one argument away for ingest gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    mode: str = "PERMISSIVE",
    **options: str,
) -> DataFrame:
    reader = (
        spark.read.option("header", str(header).lower())
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(_with_corrupt_col(schema, mode))
        return reader.csv(path)
    # inferred-schema path: Spark only materializes the corrupt-record
    # column when the schema DECLARES it, and an inferred schema never
    # does — malformed rows would silently become all-NULL rows, voiding
    # the module's quarantine contract. Infer first (a pass Spark makes
    # anyway), then re-read with the inferred schema + corrupt column.
    from pyspark.sql import types as T

    inferred = (
        spark.read.options(**options)
        .option("header", str(header).lower())
        .option("inferSchema", "true")
        .csv(path)
        .schema
    )
    if mode.upper() == "PERMISSIVE" and CORRUPT_COL not in inferred.fieldNames():
        inferred = inferred.add(T.StructField(CORRUPT_COL, T.StringType(), True))
    return reader.schema(inferred).csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    mode: str = "PERMISSIVE",
    sampling_ratio: float = 1.0,
    **options: str,
) -> DataFrame:
    """JSON Lines reader (one object per line — the only JSON layout that
    splits across workers; multiLine JSON is a single-task read and is
    deliberately not the default here)."""
    reader = (
        spark.read.option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("samplingRatio", str(sampling_ratio))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(_with_corrupt_col(schema, mode))
    return reader.json(path)


def read_orc(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """ORC side tables (DuckDB users reach these via the host engine too).
    ORC is self-describing columnar like parquet: no schema/corrupt-record
    machinery needed, and Spark's reader gives the same scale properties —
    splittable stripes, column pruning, min/max predicate pushdown."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def _with_corrupt_col(schema: str, mode: str) -> str:
    """PERMISSIVE mode only materializes _corrupt_record if the schema
    declares it; add it so malformed rows are observable.

    Presence is checked against the PARSED field names — substring
    matching would let any column merely containing '_corrupt_record'
    (e.g. ``my_corrupt_record_flag``) suppress the real column and
    silently void the quarantine contract."""
    if mode.upper() != "PERMISSIVE":
        return schema
    from pyspark.sql import types as T

    fields = T.StructType.fromDDL(schema).fieldNames()
    if CORRUPT_COL not in fields:
        return f"{schema}, {CORRUPT_COL} string"
    return schema

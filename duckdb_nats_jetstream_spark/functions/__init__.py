from duckdb_nats_jetstream_spark.functions.json_extract import json_extract  # noqa: F401
from duckdb_nats_jetstream_spark.functions.typed_extract import typed_extract  # noqa: F401

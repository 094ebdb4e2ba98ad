from duckdb_nats_jetstream_spark.sources.message_scan import (  # noqa: F401
    message_scan,
    EVENTS_ORACLE_SCAN_SQL,
)

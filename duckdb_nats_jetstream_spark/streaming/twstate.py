"""``transformWithStateInPandas`` — Spark 4.x's typed stateful-processor API
(SPARK-46815), the successor slot to :mod:`streaming.stateful`'s
``applyInPandasWithState``. Where GroupState hands you one opaque tuple,
a ``StatefulProcessor`` composes named ValueState/ListState/MapState
handles, timers, and TTLs, all checkpointed per key.

The reference has no streaming state at all (its roadmap stops at durable
consumers, ref:docs/GUIDE.md:461-482); this module exists so a pipeline on
this engine can pick the current API for new stateful operators while
``stateful.py`` keeps the GroupState twin for comparison.

Requires the RocksDB state store provider (transformWithState is only
implemented there) — :func:`with_rocksdb_state` flips the session conf and
returns the previous value so tests can restore it.

Runtime dependency: PySpark's transformWithState driver/worker protocol is
protobuf-based, so the ``protobuf`` Python package must be installed on
driver and executors (``ImportError: google.protobuf`` from the driver
worker otherwise). :func:`is_available` probes for it; the test suite
skips when absent, as in this container.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"

OUTPUT_SCHEMA = "subject string, n_msgs long, n_bytes long"


def is_available() -> bool:
    """True when the transformWithState wire protocol can run (the
    ``protobuf`` python package is importable)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def with_rocksdb_state(spark) -> str | None:
    prev = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, ROCKSDB_PROVIDER)
    return prev


class RunningTotalsProcessor(StatefulProcessor):
    """Per-subject running message/byte totals in one ValueState — the
    minimal always-on ingest monitor over a message log."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n_msgs long, n_bytes long")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        n, b = self._totals.get() if self._totals.exists() else (0, 0)
        for pdf in rows:
            n += len(pdf)
            b += int(pdf["n_bytes"].sum())
        self._totals.update((n, b))
        yield pd.DataFrame({"subject": [key[0]], "n_msgs": [n], "n_bytes": [b]})

    def close(self) -> None:
        pass


def streaming_subject_totals(stream: DataFrame) -> DataFrame:
    """Update-mode running totals per subject; each microbatch emits the
    new cumulative row for every subject it touched."""
    src = stream.select("subject", F.length("payload").cast("long").alias("n_bytes"))
    return src.groupBy("subject").transformWithStateInPandas(
        RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

"""DEPRECATED shim — the signature-store incremental dedup moved into
:mod:`duckdb_nats_jetstream_spark.operators.dedup` at the r08 rotation
window (docs/R08_PLAN.md item 3): the store-backed twin is the
100 TB-correct API (SCALING.md batch 24), so it lives beside
``incremental_near_dups``, sharing one candidate/verify/aggregate block.
This re-export survives exactly one round for external importers; delete
in r09."""

from __future__ import annotations

from duckdb_nats_jetstream_spark.operators.dedup import (  # noqa: F401
    build_signature_store,
    incremental_near_dups_stored,
)

"""Bind-time validation errors, mirroring the reference's constraint matrix
(ref:src/nats_scan.cpp:207-285 — missing stream, seq+time mixed, json+proto
both set, proto_extract without schema, unknown field paths).

The reference throws at DuckDB bind time; we raise before job submission so a
bad scan never reaches the cluster.
"""

from __future__ import annotations


class BindError(ValueError):
    """Raised for invalid scan/extraction parameter combinations."""


def require(condition: bool, message: str) -> None:
    if not condition:
        raise BindError(message)

"""Named query registry — the driver-verified capability surface.

Each module exports ``QUERIES: dict[name -> (spark_fn, oracle_sql | None)]``
where ``spark_fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the
DuckDB-equivalent ANSI SQL (None for genuinely non-SQL-expressible ops, which
the driver checks rows-only).
"""

from __future__ import annotations

import os
import warnings
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
#: Oracle slot: a literal SQL string, None (rows-only), or a ZERO-ARG
#: CALLABLE returning either — used by oracles that are expensive to build
#: (DuckDB k-means codebook training) so module import stays side-effect
#: free; ``full_registry`` resolves callables lazily, keyed on the oracle
#: SF dir so a late ``SPARK_GRAFT_ORACLE_SF_DIR`` change can't serve a
#: stale codebook.
OracleSql = str | None | Callable[[], str | None]
Registry = dict[str, tuple[QueryFn, str | None]]

_ORACLE_CACHE: dict[tuple[Callable[[], str | None], str], str | None] = {}


def _resolve_oracle(sql: OracleSql) -> str | None:
    if not callable(sql):
        return sql
    key = (sql, os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", ""))
    if key not in _ORACLE_CACHE:
        try:
            _ORACLE_CACHE[key] = sql()
        except Exception as exc:  # noqa: BLE001 — degrade THIS entry only
            warnings.warn(
                f"oracle SQL builder {getattr(sql, '__qualname__', sql)!r} "
                f"failed ({exc!r}); query degrades to rows-only",
                stacklevel=2,
            )
            _ORACLE_CACHE[key] = None
    return _ORACLE_CACHE[key]


#: Names hoisted to the FRONT of the registry. The driver's correctness gate
#: checks a bounded prefix (~50 entries) of the registry in insertion order,
#: so ordering IS the verification budget (r01/r02 lesson — queries past the
#: cut get no row at all, and rows-only queries inside the prefix burn a slot
#: on a "no_oracle" non-verdict).
#:
#: Round-4 allocation — REGISTRATION FREEZE (r03 verdict ask #1): zero new
#: queries this round; the entire ~50-row prefix is spent on verification
#: debt, in order:
#:   1. _NEVER_CHECKED_R03 — the 14 oracle-backed queries that have NEVER
#:      had a driver row (registered late in r03, landed past the cut).
#:      All 14 hold bit-exact local parity at sf0.001/0.01/0.1
#:      (tests/test_oracle_parity.py); this converts that local claim into
#:      driver fact.
#:   2. _ROTATE_SCAN — the scan surface whose last driver rows are r01,
#:      pre-dating r02's timestamp canonicalization of the very path they
#:      scan (ordered per the verdict: scan_base/time_range/seq_range/
#:      json_extract/asof_join/windowed_rollup/session_window/gapfill
#:      first).
#:   3. _ROTATE_RELATIONAL — relational queries whose only rows are r01;
#:      the first ~21 make the ~50 budget, the rest head the r05 rotation.
#: Rows-only (no-oracle) queries sit at the VERY END of the registry
#: (_ROWS_ONLY_LAST — now including multimodal_resize, whose one-time
#: execution proof was banked in r03): a "no_oracle" row is a wasted slot.
#: Prefix arithmetic: 14 + 15 + 21 = 50.
_NEVER_CHECKED_R03 = [
    "text_pmi_topk",
    "sim_pq_topk",
    "scan_path_mining",
    "scan_hopping_rollup",
    "rel_kmv_intersection",
    "rel_hll_counts",
    "rel_mad_outliers",
    "rel_hist_quantiles",
    "scan_funnel_windowed",
    "scan_daily_dashboard",
    "docs_span_scrub",
    "docs_curation_v3",
    "scan_cumulative_uniques",
    "dedup_graph_triangles",
]
#: scan surface whose last rows predate the r02 ts canonicalization —
#: verdict-mandated order (the 8 queries the canonicalization touched
#: most directly first)
_ROTATE_SCAN = [
    "scan_base",
    "scan_time_range",
    "scan_seq_range",
    "scan_json_extract",
    "scan_asof_join",
    "scan_windowed_rollup",
    "scan_session_window",
    "scan_gapfill",
    "scan_subject_filter",
    "scan_json_cast_agg",
    "scan_gap_detection",
    "scan_salted_agg",
    "scan_payload_sizes",
    "scan_proto_roundtrip",
    "scan_proto_repeated",
]
#: relational queries whose only rows are from r01
_ROTATE_RELATIONAL = [
    "rel_filter_matrix",
    "rel_pricing_summary",
    "rel_rank_functions",
    "rel_market_share",
    "rel_nation_revenue",
    "rel_cast_projection",
    "rel_top_revenue_orders",
    "rel_cte_sql_api",
    "rel_rollup",
    "rel_intersect_except",
    "rel_disjunctive_join",
    "rel_waiting_suppliers",
    "rel_array_hof",
    "rel_array_agg",
    "rel_customer_order_histogram",
    "rel_small_qty_revenue",
    "rel_large_orders",
    "rel_top_supplier",
    "rel_dormant_rich_customers",
    "rel_unpivot",
    "rel_approx_aggs",
    "rel_price_histogram",
    "rel_string_functions",
    "rel_pivot_status",
    "rel_percentiles",
    "rel_scalar_functions",
    "rel_semi_anti_customers",
    "rel_count_distinct",
    "rel_conditional_agg",
    "rel_first_order_per_customer",
    "rel_order_date_gaps",
]
#: rows-only queries (no oracle): the driver records "no_oracle" for these,
#: so inside the prefix they waste a verification slot — keep them LAST.
#: multimodal_resize's one-time execution proof is banked (green-by-nature
#: row in CORRECTNESS_r03); from r04 on it lives back here.
_ROWS_ONLY_LAST: list[str] = ["multimodal_phash", "multimodal_resize"]


def full_registry() -> Registry:
    from duckdb_nats_jetstream_spark.queries import (
        pipeline,
        pipeline2,
        pipeline3,
        pipeline4,
        pipeline5,
        relational,
        relational2,
        stream,
    )

    merged: Registry = {}
    for mod in (
        pipeline,
        pipeline2,
        pipeline3,
        pipeline4,
        pipeline5,
        relational2,
        stream,
        relational,
    ):
        for name, (fn, sql) in mod.QUERIES.items():
            assert name not in merged, f"duplicate query name {name}"
            merged[name] = (fn, _resolve_oracle(sql))

    prefix = _NEVER_CHECKED_R03 + _ROTATE_SCAN + _ROTATE_RELATIONAL
    out: Registry = {}
    for name in prefix:
        out[name] = merged[name]
    for name, entry in merged.items():
        if name not in _ROWS_ONLY_LAST:
            out.setdefault(name, entry)
    for name in _ROWS_ONLY_LAST:
        out[name] = merged[name]
    return out

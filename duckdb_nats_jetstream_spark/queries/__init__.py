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
#: Round-5 allocation — REGISTRATION FREEZE continues (r04 verdict ask #5):
#: zero new queries; the prefix finishes the rotation program so every
#: oracle query ends the round with a ≤2-round-old green row, in order:
#:   1. _EDITED_SINCE_GREEN_R05 — scan_cumulative_uniques was green r04 but
#:      its source changed this round (r04 ADVICE NULL-filter fix), which
#:      re-queues it for driver verification per the freshness contract.
#:   2. _ROTATE_R01_ONLY — the 10 relational queries whose ONLY driver rows
#:      are r01 (r04 verdict ask #1's mandated head of the prefix).
#:   3. _ROTATE_R02 — 39 of the 48 queries whose last green row is r02,
#:      scan family first (nats_source_scan / scan_time_range_compat /
#:      scan_typed_extract — the verdict's named examples), then position
#:      order. The 9 that miss the cut (scan_sessionization + the r02
#:      relational tail) head the r06 rotation.
#: Rows-only (no-oracle) queries sit at the VERY END of the registry
#: (_ROWS_ONLY_LAST): a "no_oracle" row is a wasted slot.
#: Prefix arithmetic: 1 + 10 + 39 = 50.
_EDITED_SINCE_GREEN_R05 = [
    "scan_cumulative_uniques",
]
#: relational queries whose only driver rows are r01 (oldest debt first)
_ROTATE_R01_ONLY = [
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
#: r02-green rotation: scan family first, then registry position order
_ROTATE_R02 = [
    "nats_source_scan",
    "scan_time_range_compat",
    "scan_typed_extract",
    "corpus_clean",
    "text_stats",
    "text_token_frequency",
    "text_tfidf_topk",
    "docs_hash_sample",
    "decon_ngram_overlap",
    "docs_stratified_sample",
    "docs_winsorize",
    "docs_pack_sequences",
    "text_udtf_tokens",
    "text_lang_confusion",
    "text_quality",
    "text_repetition",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_components",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "sim_cosine_topk",
    "sim_srp_bucket_stats",
    "sim_srp_topk",
    "profile_events",
    "scan_latest_per_key",
    "text_bigram_topk",
    "rel_cube_segment_nation",
    "rel_promo_revenue",
    "rel_volume_shipping",
    "rel_profit_by_nation_year",
    "rel_returned_items",
    "rel_priority_shipping",
    "rel_order_priority_exists",
    "rel_supplier_diversity",
    "rel_nation_balance_share",
    "rel_excess_volume_suppliers",
    "scan_interval_join",
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

    prefix = _EDITED_SINCE_GREEN_R05 + _ROTATE_R01_ONLY + _ROTATE_R02
    out: Registry = {}
    for name in prefix:
        out[name] = merged[name]
    for name, entry in merged.items():
        if name not in _ROWS_ONLY_LAST:
            out.setdefault(name, entry)
    for name in _ROWS_ONLY_LAST:
        out[name] = merged[name]
    return out

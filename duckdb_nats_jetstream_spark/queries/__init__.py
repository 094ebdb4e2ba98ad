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
#: Round-11 allocation — the ENV-GATED registration freeze continues
#: (spark-protobuf jar, google.protobuf, and nats-py re-checked ABSENT at
#: the r11 open): no proto/NATS queries. The r10 verdict's rotation ask
#: (#3) is paid IN FULL here: the 45-query stale tail (10 r06 greens +
#: 35 r07 greens — the oldest evidence in the ledger) fits the 50-slot
#: budget exactly once, so this prefix is pure rotation: the 45 tail
#: entries head it in oldest-first order, followed by the 5 oldest r08
#: greens. Post-r11 the histogram should contain nothing older than
#: r08-green. There are no never-green oracle entries (the two
#: multimodal rows-only queries stay in _ROWS_ONLY_LAST by design) and
#: no honest re-queues at the r11 OPEN (the r10 snapshot tree is the
#: code every entry's evidence vouched for). The r11 session's edits
#: re-derived this list via ``python tools/registry_status.py
#: --plan-check`` (PLAN_HASH SCHEME 8 — see tools/README.md): three
#: entries now head the tail — ``sim_hybrid_rrf`` (the rrf_fuse →
#: rrf_fuse_many generalization changed its fold plan; honest re-queue),
#: ``sim_hybrid_rrf3`` (NEW: three-signal fusion with the phrase-BM25
#: generator), and ``nats_source_scan`` (the replay transport's
#: stats-based time-bound resolution; never clearable — Python data
#: source), and ``dedup_embedding_cosine`` (the r11 two-decade sweep's
#: pinned-dial fix: n_blocks now auto-derives, which adds a count() job
#: and changes the blocking constant — a REAL plan change, honest
#: re-queue). Everything else the r11 session edited cleared on
#: scheme-8 plan+closure equality with the regenerated 162/162
#: PARITY_EVIDENCE stamp (the _bm25_from_base factoring, the retrieval/
#: sampling/hll/kmv oracle quote-escaping — byte-identical SQL for
#: quote-free inputs — and the semantic.py auto-dial signatures whose
#: defaults pin the old behavior). The four head entries displace the
#: five r08 greens (text_token_frequency, text_tfidf_topk,
#: docs_hash_sample, text_stats, corpus_clean — the fifth displaced by
#: ``sim_hard_negatives``, the round's second new registration:
#: label-aware hard-negative mining, never-green so it heads the
#: prefix), so the post-r11 histogram still contains nothing older
#: than r08-green.
#: Staleness remains DEPENDENCY-AWARE (semantic hash of every reachable
#: package module);
#: ``tests/test_registry_freshness.py::test_prefix_matches_recommendation``
#: asserts this list equals the tool's derivation, and
#: ``test_plan_evidence_entries_are_valid`` re-validates every clearing
#: (fingerprint-at-clear, hash equality, own-segment guard) on each run.
#: Rows-only (no-oracle) queries sit at the VERY END of the registry
#: (_ROWS_ONLY_LAST): a "no_oracle" row is a wasted slot.
_PREFIX_R11 = [
    "sim_hybrid_rrf",
    "sim_hybrid_rrf3",
    "nats_source_scan",
    "dedup_embedding_cosine",
    "sim_hard_negatives",
    "rel_hist_quantiles",
    "scan_daily_dashboard",
    "scan_sessionization",
    "rel_trailing_spend",
    "rel_distinct_segments",
    "rel_union_entities",
    "rel_balance_ratio",
    "rel_top_parts",
    "rel_above_avg_customers",
    "rel_parts_like",
    "docs_domain_shift",
    "docs_chunk_sequences",
    "text_char_diversity",
    "sim_quantize_int8",
    "rel_forecast_revenue",
    "docs_chunk_dedup",
    "decon_bloom",
    "docs_train_order",
    "scan_funnel",
    "scan_funnel_windowed",
    "rel_mad_outliers",
    "text_pmi_topk",
    "scan_path_mining",
    "scan_hopping_rollup",
    "rel_kmv_intersection",
    "docs_span_scrub",
    "rel_grouping_sets",
    "rel_min_cost_supplier",
    "rel_excess_volume_suppliers",
    "scan_session_window",
    "scan_windowed_rollup",
    "scan_base",
    "scan_seq_range",
    "scan_time_range",
    "scan_subject_filter",
    "scan_json_extract",
    "scan_json_cast_agg",
    "scan_subject_wildcard",
    "scan_variant_extract",
    "scan_payload_sizes",
    "scan_gap_detection",
    "rel_disjunctive_join",
    "rel_waiting_suppliers",
    "rel_array_hof",
    "rel_array_agg",
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
        pipeline6,
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
        pipeline6,
        relational2,
        stream,
        relational,
    ):
        for name, (fn, sql) in mod.QUERIES.items():
            assert name not in merged, f"duplicate query name {name}"
            merged[name] = (fn, _resolve_oracle(sql))

    prefix = _PREFIX_R11
    out: Registry = {}
    for name in prefix:
        out[name] = merged[name]
    for name, entry in merged.items():
        if name not in _ROWS_ONLY_LAST:
            out.setdefault(name, entry)
    for name in _ROWS_ONLY_LAST:
        out[name] = merged[name]
    return out

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
#: Round-12 allocation — the ENV-GATED registration freeze continues
#: (spark-protobuf jar, google.protobuf, and nats-py re-checked ABSENT at
#: the r12 open): no proto/NATS queries. The r12 open landed the
#: fold_gram row-tiled in-place kernel (docs/R12_PLAN.md §4; bit-equality
#: vs the untiled form pinned in tests/test_vector_np.py), an
#: execution-only edit to functions/vector_np.py. ``--plan-check``
#: refused to clear exactly the TEN queries whose Arrow closures capture
#: the kernel (the pickled UDF body is inside the plan hash):
#: dedup_embedding_cosine, sim_ivf_topk, sim_srp_bucket_stats,
#: sim_srp_topk, sim_knn_join, sim_bucket_centroids, dedup_semantic,
#: sim_kmeans, dedup_semantic_kmeans, sim_pq_topk — those honest
#: re-queues head this prefix, followed by the round's SIX new
#: registrations (never-green): ``sim_hybrid_rrf_ann`` (the
#: IVF-candidate hybrid, r11 verdict ask #6), ``sim_contrastive_triplets``
#: (anchor/positive/hard-negative rows for a triplet loss),
#: ``docs_quota_topk`` (per-language-capped quality top-k),
#: ``text_bm25_rm3`` (RM3 pseudo-relevance-feedback expansion — the
#: oracle re-derives the expansion terms offline and embeds them, the
#: IVF-codebook pattern), ``docs_token_budget`` (budget-constrained
#: selection over a range-chunked distributed prefix sum), and
#: ``docs_token_budget_mix`` (group-restarted prefix sum: per-language
#: token allocations). Every other fingerprint-touched query cleared on
#: scheme-8 plan-hash equality backed by the regenerated 169/169
#: PARITY_EVIDENCE stamp on this exact tree. The remaining 34 slots are
#: pure rotation, oldest-green first: all 25 r08 greens plus the 9
#: oldest r09 greens (each new registration displaced the NEWEST
#: rotation entry — the tail r09 greens — never an r08 one), so the
#: post-r12 histogram still contains nothing older than r09-green, per
#: the r11 verdict's ask #4.
#: Staleness remains DEPENDENCY-AWARE (semantic hash of every reachable
#: package module);
#: ``tests/test_registry_freshness.py::test_prefix_matches_recommendation``
#: asserts this list equals the tool's derivation, and
#: ``test_plan_evidence_entries_are_valid`` re-validates every clearing
#: (fingerprint-at-clear, hash equality, own-segment guard) on each run.
#: Rows-only (no-oracle) queries sit at the VERY END of the registry
#: (_ROWS_ONLY_LAST): a "no_oracle" row is a wasted slot.
_PREFIX_R12 = [
    "dedup_embedding_cosine",
    "sim_ivf_topk",
    "sim_srp_bucket_stats",
    "sim_srp_topk",
    "sim_knn_join",
    "sim_bucket_centroids",
    "dedup_semantic",
    "sim_kmeans",
    "dedup_semantic_kmeans",
    "sim_pq_topk",
    "sim_hybrid_rrf_ann",
    "sim_contrastive_triplets",
    "docs_quota_topk",
    "text_bm25_rm3",
    "docs_token_budget",
    "docs_token_budget_mix",
    "corpus_clean",
    "text_stats",
    "text_token_frequency",
    "text_tfidf_topk",
    "docs_hash_sample",
    "decon_ngram_overlap",
    "text_lang_confusion",
    "text_quality",
    "rel_customer_order_histogram",
    "rel_small_qty_revenue",
    "rel_large_orders",
    "rel_top_supplier",
    "rel_dormant_rich_customers",
    "rel_market_share",
    "rel_unpivot",
    "rel_intersect_except",
    "rel_approx_aggs",
    "rel_rank_functions",
    "rel_rollup",
    "rel_cte_sql_api",
    "rel_pricing_summary",
    "rel_top_revenue_orders",
    "rel_nation_revenue",
    "rel_filter_matrix",
    "rel_cast_projection",
    "dedup_exact_groups",
    "dedup_simhash",
    "sim_cosine_topk",
    "docs_winnow_fingerprints",
    "dedup_winnow",
    "dedup_winnow_capped",
    "text_udtf_tokens",
    "multimodal_features",
    "scan_latest_per_key",
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

    prefix = _PREFIX_R12
    out: Registry = {}
    for name in prefix:
        out[name] = merged[name]
    for name, entry in merged.items():
        if name not in _ROWS_ONLY_LAST:
            out.setdefault(name, entry)
    for name in _ROWS_ONLY_LAST:
        out[name] = merged[name]
    return out

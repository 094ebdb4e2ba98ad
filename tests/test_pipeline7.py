"""Batch-7 queries: classifier query shape + curation-v4 capstone
invariants (the oracle gate pins exact values; these pin the semantic
contracts composition could silently break)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR

from duckdb_nats_jetstream_spark.queries.pipeline7 import (
    _V4_BUDGETS,
    _V4_DEFAULT_BUDGET,
    _V4_PER_GROUP,
    docs_curation_v4,
    text_quality_classifier,
)


def test_classifier_query_shape(spark):
    rows = text_quality_classifier(spark, SF_DIR).collect()
    top = [r for r in rows if r.side == "top"]
    bottom = [r for r in rows if r.side == "bottom"]
    assert len(top) == 10 and len(bottom) == 10
    # extremes are coherent: the weakest top margin beats the strongest
    # bottom margin (corpus is 500 docs >> 20)
    assert min(r.margin for r in top) >= max(r.margin for r in bottom)
    # margins are finite doubles (the fold never divides by zero on
    # fixture text)
    assert all(r.margin is not None for r in rows)


def test_curation_v4_invariants(spark):
    out = docs_curation_v4(spark, SF_DIR).collect()
    assert out, "capstone selected nothing"
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        budget = _V4_BUDGETS.get(lang, _V4_DEFAULT_BUDGET)
        # stage-1 quota: no language exceeds its per-group cap
        assert len(rows) <= _V4_PER_GROUP, lang
        # stage-2 budget: every inclusive running total fits the
        # language's allocation
        assert all(r.cum_tokens <= budget for r in rows), lang
        # the budget cut binds (dials were chosen so every stratum is a
        # strict subset at sf0.01 — a vacuous budget would mean the
        # composition silently skipped stage 2)
        assert max(r.cum_tokens for r in rows) > budget - max(
            r.n_tokens for r in rows
        ), lang
    # stage-3 split: valid labels, and component-atomic by construction
    # (same grp → same split, since split is a pure function of grp)
    assert {r.split for r in out} <= {"train", "val", "test"}
    grp_split = {}
    for r in out:
        assert grp_split.setdefault(r.grp, r.split) == r.split
    # all three splits appear (500-doc fixture; md5 thresholds 79.7/10/10)
    assert len({r.split for r in out}) == 3


def test_curation_v4_split_consistent_with_leakage_split(spark):
    """Interface-drift guard: for documents the capstone kept, the split
    hash must agree with the standalone leakage-split rule whenever the
    doc is a singleton in BOTH pipelines (non-singleton components may
    differ legitimately — v4 components are computed over the kept
    subset, the standalone over the full corpus)."""
    from duckdb_nats_jetstream_spark.queries.pipeline3 import (
        docs_leakage_safe_split,
    )

    v4 = {r.doc_id: (r.grp, r.split) for r in docs_curation_v4(spark, SF_DIR).collect()}
    full = {
        r.doc_id: (r.grp, r.split)
        for r in docs_leakage_safe_split(spark, SF_DIR).collect()
    }
    checked = 0
    for doc_id, (grp, split) in v4.items():
        fgrp, fsplit = full[doc_id]
        if grp == doc_id and fgrp == doc_id:  # singleton in both
            assert split == fsplit, doc_id
            checked += 1
    assert checked > 0

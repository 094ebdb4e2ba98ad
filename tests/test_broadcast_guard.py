"""The runtime-sized broadcast hint (``operators/broadcast_guard``) and
its integration into the two statistics-shaped hint sites
(``winsorize``, ``stratified_hash_topn``).

The property pinned here is the hint-vs-cardinality rule measured in
SCALING.md batch 8: below the cap the join must be a BroadcastHashJoin
(the fast map-side path); above the cap broadcast must be FORBIDDEN and
the spill-safe sort-merge strategy pinned (degrade, don't OOM the
driver) — and in both regimes the RESULT is bit-identical.
"""

from __future__ import annotations

import pytest

from duckdb_nats_jetstream_spark.operators.broadcast_guard import (
    sized_broadcast,
)
from duckdb_nats_jetstream_spark.operators.sampling import (
    stratified_hash_topn,
)
from duckdb_nats_jetstream_spark.operators.winsorize import winsorize
from duckdb_nats_jetstream_spark.tables import read_table
from tests.test_plans import physical_plan


def _docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


def test_under_cap_broadcasts(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bounds = docs.groupBy("source").count()
    joined = docs.join(sized_broadcast(bounds, max_rows=1_000), "source")
    assert "BroadcastHashJoin" in physical_plan(joined)


def test_over_cap_forbids_broadcast(spark, sf_dir):
    """Above the cap the guard must PIN a non-broadcast strategy: with the
    hint merely dropped, Catalyst's static size estimate still
    auto-broadcasts the checkpointed relation (observed in-plan)."""
    docs = _docs(spark, sf_dir)
    bounds = docs.groupBy("source").count()
    joined = docs.join(sized_broadcast(bounds, max_rows=1), "source")
    plan = physical_plan(joined)
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" in plan
    # the relation was still materialized once (checkpoint scan, not a
    # recompute of the aggregate)
    assert "Scan ExistingRDD" in plan


def test_none_cap_is_plain_hint_and_lazy(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bounds = docs.groupBy("source").count()
    joined = docs.join(sized_broadcast(bounds, max_rows=None), "source")
    plan = physical_plan(joined)
    assert "BroadcastHashJoin" in plan
    # lazy path: no checkpoint materialization happened
    assert "Scan ExistingRDD" not in plan


def test_negative_cap_rejected(spark, sf_dir):
    with pytest.raises(ValueError, match="max_rows"):
        sized_broadcast(_docs(spark, sf_dir), max_rows=-1)


def test_result_identical_across_regimes(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bounds = docs.groupBy("source").count()
    under = docs.join(sized_broadcast(bounds, 1_000), "source")
    over = docs.join(sized_broadcast(bounds, 1), "source")
    assert under.exceptAll(over).isEmpty()
    assert over.exceptAll(under).isEmpty()


def test_winsorize_guard_parity(spark, sf_dir):
    """Forcing the over-cap regime (cap=0) must not change a single row."""
    docs = _docs(spark, sf_dir)
    hinted = winsorize(docs, "n_chars", ["source"], max_broadcast_keys=None)
    guarded = winsorize(docs, "n_chars", ["source"], max_broadcast_keys=0)
    assert "BroadcastHashJoin" not in physical_plan(guarded)
    assert hinted.exceptAll(guarded).isEmpty()
    assert guarded.exceptAll(hinted).isEmpty()


def test_stratified_guard_parity(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    default = stratified_hash_topn(docs, "source", 5)
    no_hint = stratified_hash_topn(docs, "source", 5, max_broadcast_groups=0)
    assert default.exceptAll(no_hint).isEmpty()
    assert no_hint.exceptAll(default).isEmpty()


def test_no_cache_leak(spark, sf_dir):
    """The guard materializes via localCheckpoint, which must not leave a
    SQL cache entry behind (the registry-wide sweep asserts the same for
    every query; this pins it at the operator level)."""
    docs = _docs(spark, sf_dir)
    bounds = docs.groupBy("source").count()
    docs.join(sized_broadcast(bounds, 1_000), "source").count()
    docs.join(sized_broadcast(bounds, 1), "source").count()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_injectable_materializer(spark, sf_dir):
    """Cluster deployments swap localCheckpoint for reliable storage (r06
    ADVICE): the guard must route materialization through the injected
    callable and still hint/pin from its realized count."""
    docs = _docs(spark, sf_dir)
    bounds = docs.groupBy("source").count()
    calls = []

    def tracking(df):
        calls.append(df)
        return df.localCheckpoint(eager=False)

    small = sized_broadcast(bounds, 1_000, materializer=tracking)
    assert len(calls) == 1 and calls[0] is bounds
    joined = docs.join(small, "source")
    assert "BroadcastHashJoin" in physical_plan(joined)

    # identity materializer: no checkpoint, count runs the plan directly;
    # over-cap still pins merge
    pinned = sized_broadcast(bounds, 0, materializer=lambda d: d)
    assert "BroadcastHashJoin" not in physical_plan(docs.join(pinned, "source"))

"""Ordered multi-stage funnel over an event log — two physical strategies
with identical semantics (stage k's timestamp = min event time of type k
strictly after stage k-1, optionally within ``max_gap`` of it):

- ``algorithm="cascade"`` (default, the 100 TB deployment path): k
  algebraic min-aggregations chained by per-user joins. Every operator is
  skew-safe — partial min combines MAP-SIDE before the shuffle (a hot key
  reduces to one row per map partition), and the event⋈stage joins are
  sort-merge joins AQE's skew splitting can break up. Costs k pushdown
  scans of the (user, ts, type) projection and 2(k-1)+1 shuffles, all
  linear.
- ``algorithm="fold"``: the log is scanned ONCE — one user-keyed
  ``collect_list`` gathers each user's time-sorted event array and every
  stage timestamp is an ordered array lookup. Fewer shuffles, but
  collect_list has NO map-side partial: a hot user's entire event set lands
  in one reducer task. Measured at 100× events with a 90%-one-user skew
  (tools/stress_skew.py, SCALING.md batch 4): a 34× straggler task (8.5 s
  vs 0.25 s median) that AQE cannot split — which is why it is not the
  default. Right when the per-user event count is known-bounded (sessions,
  devices) where it's the faster plan.

Both produce bit-identical results (pinned by a pytest parity check); the
DuckDB oracle runs the cascade formulation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def _stage_predicate(
    ts_col: str, prev_col: str, max_gap: str | None
):
    cond = F.col(ts_col) > F.col(prev_col)
    if max_gap is not None:
        cond = cond & (
            F.col(ts_col) <= F.col(prev_col) + F.expr(f"INTERVAL {max_gap}")
        )
    return cond


def _funnel_cascade(
    ev: DataFrame,
    stages: Sequence[str],
    user_col: str,
    ts_col: str,
    type_col: str,
    max_gap: str | None,
) -> DataFrame:
    """Skew-safe cascade: t1 = min ts of stage 1 per user (algebraic);
    t_k = min ts of stage k qualifying against t_{k-1} (join + algebraic
    min). Joins are null-safe on the user key so a NULL-user group behaves
    exactly like the fold's NULL groupBy key."""
    stage_rels: list[tuple[str, DataFrame]] = []
    prev, prev_s = None, None
    for i, stage in enumerate(stages, start=1):
        name = f"t{i}"
        stage_ev = ev.filter(F.col(type_col) == stage).select(user_col, ts_col)
        if prev_s is None:
            s = stage_ev.groupBy(user_col).agg(F.min(ts_col).alias(name))
        else:
            # chain from the PREVIOUS stage relation (one row per converted
            # user — exactly the non-null set), not the accumulating output:
            # keeps each stage's lineage one join deep instead of re-deriving
            # the whole prior cascade per stage
            prev_rel = prev_s.select(F.col(user_col).alias("__u"), prev)
            s = (
                stage_ev.join(
                    prev_rel, F.col(user_col).eqNullSafe(F.col("__u")), "inner"
                )
                .filter(_stage_predicate(ts_col, prev, max_gap))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias(name))
            )
        stage_rels.append((name, s))
        prev, prev_s = name, s
    out = ev.select(user_col).distinct()
    for name, s in stage_rels:
        out = out.join(
            s.select(F.col(user_col).alias("__u"), name),
            F.col(user_col).eqNullSafe(F.col("__u")),
            "left",
        ).drop("__u")
    return out


def _funnel_fold(
    ev: DataFrame,
    stages: Sequence[str],
    user_col: str,
    ts_col: str,
    type_col: str,
    max_gap: str | None,
) -> DataFrame:
    out = ev.groupBy(user_col).agg(
        F.array_sort(F.collect_list(F.struct(ts_col, type_col))).alias("__a")
    )

    def _first(stage: str):
        # exactly-one-arg lambda (PySpark HOFs infer arity from the signature)
        return lambda x: x[type_col] == stage

    def _first_after(stage: str, prev_col: str):
        if max_gap is None:
            return lambda x: (x[type_col] == stage) & (x[ts_col] > F.col(prev_col))
        deadline = F.col(prev_col) + F.expr(f"INTERVAL {max_gap}")
        return lambda x: (
            (x[type_col] == stage)
            & (x[ts_col] > F.col(prev_col))
            & (x[ts_col] <= deadline)
        )

    prev = None
    for i, stage in enumerate(stages, start=1):
        pred = _first(stage) if prev is None else _first_after(stage, prev)
        name = f"t{i}"
        # try_element_at: NULL on an empty match (ANSI mode makes plain
        # element_at THROW on out-of-bounds — a broken chain is data, not
        # an error)
        out = out.withColumn(
            name, F.try_element_at(F.filter("__a", pred), F.lit(1))[ts_col]
        )
        prev = name
    return out.drop("__a")


def funnel_user_stages(
    df: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap: str | None = None,
    algorithm: str = "cascade",
) -> DataFrame:
    """Per-user stage timestamps ``(user, t1..tk)``; ``t_k`` is NULL once
    the chain breaks (strict ``>`` between consecutive stages). With
    ``max_gap`` (an INTERVAL string like ``"2 hours"``), each stage must
    also land within that gap of the previous one — the conversion-window
    variant every funnel product exposes. NOTE: a too-late event does not
    fail the funnel outright — a later in-window event of the same stage
    can still convert (min matching ts within the window, the standard
    semantics).

    ``algorithm``: ``"cascade"`` (default — skew-safe, see module
    docstring) or ``"fold"`` (single-shuffle array fold; hot-key fragile).
    """
    if algorithm not in ("cascade", "fold"):
        raise ValueError(f"unknown funnel algorithm: {algorithm!r}")
    ev = df.filter(F.col(type_col).isin(*stages)).select(
        user_col, ts_col, type_col
    )
    impl = _funnel_cascade if algorithm == "cascade" else _funnel_fold
    return impl(ev, stages, user_col, ts_col, type_col, max_gap)


def funnel_summary(per_user: DataFrame, n_stages: int) -> DataFrame:
    """One-row stage counts + stage-to-stage conversion rates."""
    counts = [F.count(f"t{i}").alias(f"n_stage{i}") for i in range(1, n_stages + 1)]
    convs = [
        (F.count(f"t{i + 1}").cast("double") / F.count(f"t{i}").cast("double")).alias(
            f"conv_{i + 1}"
        )
        for i in range(1, n_stages)
    ]
    return per_user.agg(*counts, *convs)

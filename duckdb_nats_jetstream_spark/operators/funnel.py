"""Ordered multi-stage funnel over an event log — two physical strategies
with identical semantics (stage k's timestamp = min event time of type k
strictly after stage k-1, optionally within ``max_gap`` of it):

- ``algorithm="cascade"`` (default, the 100 TB deployment path): k
  algebraic min-aggregations chained by per-user joins, assembled by one
  tagged-union pivot aggregation. Every operator is skew-safe — partial
  min/max combines MAP-SIDE before each shuffle (a hot key reduces to one
  row per map partition), and the chain joins either broadcast their
  one-row-per-user side or, past broadcast scale, salt it explicitly via
  ``n_salts`` (AQE's skew splitting can NOT rescue these joins — the
  aggregate under the join child defeats ``OptimizeSkewedJoin``'s
  pattern, measured in SCALING.md Round-6 batch 5). Costs k pushdown
  scans of the (user, ts, type) projection; every shuffle is linear and
  map-side-combinable.
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
    n_salts: int | None = None,
    salt_col: str | None = None,
) -> DataFrame:
    """Skew-safe cascade: t1 = min ts of stage 1 per user (algebraic);
    t_k = min ts of stage k qualifying against t_{k-1} (join + algebraic
    min). Joins are null-safe on the user key so a NULL-user group behaves
    exactly like the fold's NULL groupBy key.

    Two scale decisions beyond the r05 cascade (both A/B-measured at
    100× data, uniform and 90%-hot-key — SCALING.md Round-6):

    - **Union + pivot assembly** (default). The final (user, t1..tk)
      table is one tagged union of the k one-row-per-user stage
      relations plus the raw user column (no ``distinct`` — the same
      groupBy that pivots also dedups, saving a corpus shuffle), then a
      single ``max(when)`` aggregation — one exchange instead of the
      k+1 joins (and their exchanges) the r05 cascade paid. Measured
      ~15% faster on uniform 100× with identical results.
    - **Salted chain joins** (``n_salts``, opt-in). Each chained stage
      joins stage-k events (a skew-prone fact) against the previous
      stage's per-user aggregate. That aggregate sits directly under
      the join child, so if that side is ever too large to broadcast,
      AQE's ``OptimizeSkewedJoin`` pattern cannot match and will NOT
      split a hot user's partition (measured, SCALING.md Round-6 batch
      5: the straggler survives skewJoin=on at 11.3×). While the
      per-user relation broadcasts — every measured scale here — the
      trap is latent and salting is pure overhead (measured 2× on
      uniform 100×), so the default is unsalted. Set ``n_salts`` (e.g.
      8-32) when user cardinality × 16 bytes exceeds the broadcast
      threshold AND keys are skewed: the fact side salts by
      ``xxhash64(ts[, salt_col]) % n_salts``, the one-row-per-user side
      explodes ×n_salts, splitting the hot key deterministically — no
      AQE dependency, no checkpoint. The follow-up ``groupBy(user)``
      min stays algebraic (map-side partial). Pass ``salt_col`` (any
      per-event id column, e.g. the log's ``event_id``) when a hot
      user's events can TIE on timestamp (second-granularity logs,
      duplicate events): ts alone then maps the ties to one salt bucket
      and the skew survives. The salt must stay DETERMINISTIC per row
      — a row-position expression (monotonically_increasing_id, rand)
      inside a shuffle join key makes the map stage indeterminate, and
      a partial stage retry can migrate rows between reducers."""
    ts_type = dict(ev.dtypes)[ts_col]
    stage_rels: list[DataFrame] = []
    prev, prev_s = None, None
    stage_cols = [user_col, ts_col] + (
        [salt_col] if salt_col is not None and n_salts is not None else []
    )
    for i, stage in enumerate(stages, start=1):
        name = f"t{i}"
        stage_ev = ev.filter(F.col(type_col) == stage).select(*stage_cols)
        if prev_s is None:
            s = stage_ev.groupBy(user_col).agg(F.min(ts_col).alias(name))
        elif n_salts is None:
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
        else:
            # deterministic per-row salt: ts plus (optionally) a per-event
            # id column so a hot user's TIED timestamps still spread. A
            # row-position expression here (monotonically_increasing_id,
            # rand) would make the join's map stage indeterminate — see
            # the docstring.
            salt_inputs = [ts_col] + ([salt_col] if salt_col else [])
            salted = stage_ev.withColumn(
                "__salt",
                F.pmod(F.xxhash64(*salt_inputs), F.lit(n_salts)).cast("int"),
            )
            prev_rel = prev_s.select(
                F.col(user_col).alias("__u"), prev
            ).withColumn(
                "__s2",
                F.explode(F.array(*[F.lit(j) for j in range(n_salts)])),
            )
            s = (
                salted.join(
                    prev_rel,
                    F.col(user_col).eqNullSafe(F.col("__u"))
                    & (F.col("__salt") == F.col("__s2")),
                    "inner",
                )
                .filter(_stage_predicate(ts_col, prev, max_gap))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias(name))
            )
        stage_rels.append(s)
        prev, prev_s = name, s

    # tagged union: slot 0 carries every event's user (the groupBy dedups),
    # slot i carries stage i's per-user timestamp
    parts = [
        ev.select(
            F.col(user_col).alias("__fu"),
            F.lit(None).cast(ts_type).alias("__fts"),
            F.lit(0).alias("__fi"),
        )
    ]
    for i, s in enumerate(stage_rels, start=1):
        parts.append(
            s.select(
                F.col(user_col).alias("__fu"),
                F.col(f"t{i}").alias("__fts"),
                F.lit(i).alias("__fi"),
            )
        )
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    return (
        un.groupBy("__fu")
        .agg(
            *[
                F.max(F.when(F.col("__fi") == i, F.col("__fts"))).alias(f"t{i}")
                for i in range(1, len(stages) + 1)
            ]
        )
        .withColumnRenamed("__fu", user_col)
    )


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
    n_salts: int | None = None,
    salt_col: str | None = None,
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
    ``n_salts`` (cascade only): salt the chain joins for deployments
    where the per-user relation exceeds the broadcast threshold AND user
    keys are skewed — see ``_funnel_cascade`` for the measured rationale.
    """
    if algorithm not in ("cascade", "fold"):
        raise ValueError(f"unknown funnel algorithm: {algorithm!r}")
    if n_salts is not None and n_salts < 1:
        # a zero/negative salt count would explode an EMPTY salt array —
        # every chained join silently empties and t2..tk come back NULL
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if salt_col is not None and (n_salts is None or algorithm != "cascade"):
        # salt_col only has an effect on the salted cascade path; a caller
        # passing it expecting tie-spreading skew protection must not get
        # a silent no-op (r07 ADVICE)
        raise ValueError(
            "salt_col requires n_salts and algorithm='cascade' "
            f"(got n_salts={n_salts}, algorithm={algorithm!r})"
        )
    if n_salts is not None and algorithm != "cascade":
        # same silent-no-op class for n_salts itself: the fold path never
        # reads it — a caller asking for salted skew protection on fold
        # would get the unsalted single-shuffle fold (r08 review)
        raise ValueError(
            f"n_salts is a cascade-only knob (got algorithm={algorithm!r})"
        )
    keep = [user_col, ts_col, type_col] + (
        [salt_col] if salt_col is not None and n_salts is not None else []
    )
    ev = df.filter(F.col(type_col).isin(*stages)).select(*keep)
    if algorithm == "cascade":
        return _funnel_cascade(
            ev, stages, user_col, ts_col, type_col, max_gap, n_salts, salt_col
        )
    return _funnel_fold(ev, stages, user_col, ts_col, type_col, max_gap)


def funnel_summary(per_user: DataFrame, n_stages: int) -> DataFrame:
    """One-row stage counts + stage-to-stage conversion rates.

    ``try_divide``, not ``/``: a stage nobody reached makes the rate
    ``0.0/0.0``, which Spark's default ANSI mode THROWS on — a funnel
    with a dead stage is data, not an error (NULL rate, matching
    DuckDB's divide-by-zero NULL; r10 review)."""
    counts = [F.count(f"t{i}").alias(f"n_stage{i}") for i in range(1, n_stages + 1)]
    convs = [
        F.try_divide(
            F.count(f"t{i + 1}").cast("double"), F.count(f"t{i}").cast("double")
        ).alias(f"conv_{i + 1}")
        for i in range(1, n_stages)
    ]
    return per_user.agg(*counts, *convs)

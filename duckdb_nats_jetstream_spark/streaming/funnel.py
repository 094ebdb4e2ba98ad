"""Streaming stateful funnel — the constant-state streaming twin of
``operators/funnel.funnel_user_stages``.

Per user, the state is just ``(stage_reached, t_last_us)`` — two scalars
forever, however long the log. Each micro-batch advances the stage machine
greedily in timestamp order: an event of the NEXT stage's type with
``ts > t_last`` advances, and greedy-first-match equals the batch
semantics exactly (the first qualifying event IS the min qualifying
timestamp). Every advancement emits ``(user, stage_no, stage, ts)``, so
the output is the melted form of the batch operator's ``(user, t1..tk)``
row — pinned bit-for-bat by ``tests/test_stream_funnel.py`` on a replayed
log.

Ordering contract (same as `streaming/anomaly.py`): rows are sorted
within each micro-batch; across batches a user's events must arrive with
non-decreasing timestamps (true for the append-only replay log). An event
that arrives after the machine already passed its stage does not rewind —
monitoring semantics, documented.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("stage_no", T.IntegerType()),
        T.StructField("stage", T.StringType()),
        T.StructField("ts", T.LongType()),  # µs — stays integer across engines
    ]
)

# CHECKPOINT COMPATIBILITY: t_act (below) widened this schema in the r10
# review — checkpoints written by earlier versions must be discarded (see
# the module note in streaming/stateful.py).
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("stage_reached", T.IntegerType()),
        T.StructField("t_last", T.LongType()),
        # µs of the user's last USABLE (timestamped) event — the TTL
        # anchor. Stored in state because GroupState does NOT carry a
        # previously-armed timeout across invocations: every invocation
        # must re-arm, and re-arming from the current WATERMARK on a
        # null-ts-only batch slid the deadline forward forever (r10
        # review) — re-arming from stored t_act keeps it fixed.
        T.StructField("t_act", T.LongType()),
    ]
)


def _funnel_fn(stages: Sequence[str], idle_timeout_ms: int | None = None):
    stages = list(stages)
    k = len(stages)

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            # idle past the event-time TTL: nothing to flush (every stage
            # advancement was already emitted in its own micro-batch) —
            # just release the state row. remove() without re-arming, or
            # availableNow's state-cleanup loop never terminates.
            state.remove()
            return
        stage_reached, t_last, t_act = (
            state.get if state.exists else (0, -1, -1)
        )

        events: list[tuple[int, str]] = []
        for pdf in pdfs:
            # null event times arrive as NaN (nullable source field /
            # failed cast upstream) — int(NaN) would kill the task and
            # the whole streaming query (r09 review). An event with no
            # time cannot be ordered into a funnel: drop it.
            events.extend(
                (int(t), e)
                for t, e in zip(pdf["t_us"], pdf["event_type"])
                if pd.notna(t)
            )
        events.sort()
        if not events and not state.exists:
            return  # only null-ts rows for a user with no state: no-op

        rows = []
        for t_us, etype in events:
            if stage_reached >= k:
                break
            want = stages[stage_reached]
            if etype == want and (stage_reached == 0 or t_us > t_last):
                stage_reached += 1
                t_last = t_us
                rows.append((user_id, stage_reached, want, t_us))
        if events:
            t_act = max(t_act, events[-1][0])  # sorted: last IS the max
        state.update((stage_reached, t_last, t_act))
        if idle_timeout_ms is not None:
            # evict when the WATERMARK passes the user's last activity +
            # TTL. Spark requires the timeout timestamp to sit strictly
            # past the current watermark, so a user whose deadline already
            # expired gets the minimum legal value (next batch times out).
            #
            # Re-armed EVERY invocation from the STORED t_act (GroupState
            # does not carry a timeout across invocations): a null-ts-only
            # batch re-arms the same fixed deadline instead of sliding it
            # forward from the current watermark forever — the unbounded
            # state growth the TTL exists to prevent (r10 review;
            # regression-pinned with a null-only-batches eviction test).
            deadline = t_act // 1000 + idle_timeout_ms
            state.setTimeoutTimestamp(
                max(deadline, state.getCurrentWatermarkMs() + 1)
            )
        if rows:
            yield pd.DataFrame(rows, columns=["user_id", "stage_no", "stage", "ts"])

    return fn


def streaming_funnel(
    stream_df: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    idle_timeout: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Stage-advancement events ``(user_id, stage_no, stage, ts_us)`` from a
    streaming event source. Filters to the funnel's event types before the
    state operator, so state traffic is only funnel-relevant rows.

    State is (two scalars) × (distinct users ever seen) — measured flat at
    ~320 B/user (SCALING.md batch 9), but with the default
    ``idle_timeout=None`` it never evicts, which on an open-ended user
    space (100 TB of web logs keyed by session id) grows without bound.
    Pass ``idle_timeout`` (e.g. ``"7 days"``) to evict users idle past
    that EVENT-TIME horizon: an evicted user who reappears restarts from
    stage 0 — the right trade for monitoring funnels whose conversion
    window is much shorter than the log. The eviction clock is the
    stream's watermark, applied HERE on the event-time column (a caller's
    upstream ``withWatermark`` would not survive this function's
    projection), and ``watermark`` must be given EXPLICITLY alongside
    ``idle_timeout``: it is not just the eviction clock — events behind
    the global watermark are DROPPED before the state operator, while the
    default NoTimeout path (no watermark at all) processes any
    interleaving that is per-user ordered. Size it to the worst
    cross-user timestamp disorder the source can deliver (globally
    ordered replay logs can pass ``"0 seconds"``)."""
    idle_ms: int | None = None
    if idle_timeout is not None:
        import pandas as pd

        idle_ms = int(pd.Timedelta(idle_timeout).total_seconds() * 1000)
        if idle_ms <= 0:
            raise ValueError(f"idle_timeout must be positive: {idle_timeout!r}")
        if watermark is None:
            raise ValueError(
                "idle_timeout requires an explicit watermark: the global "
                "watermark both drives eviction AND drops events behind "
                "it, so its lateness tolerance is a semantic choice the "
                "caller must make (use '0 seconds' only for globally "
                "ordered sources)"
            )
    elif watermark is not None:
        raise ValueError("watermark is only meaningful with idle_timeout")
    cols = [
        F.col(user_col).cast("long").alias("user_id"),
        F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP))").alias("t_us"),
        F.col(type_col).alias("event_type"),
    ]
    if idle_ms is not None:
        cols.append(F.col(ts_col).cast("timestamp").alias("__event_ts"))
    ev = stream_df.filter(F.col(type_col).isin(*stages)).select(*cols)
    if idle_ms is not None:
        ev = ev.withWatermark("__event_ts", watermark)
    return ev.groupBy("user_id").applyInPandasWithState(
        _funnel_fn(stages, idle_ms),
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if idle_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )

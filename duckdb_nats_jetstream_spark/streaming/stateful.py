"""Custom stateful streaming operators via ``applyInPandasWithState`` — the
slot the reference's roadmap leaves open (it has no streaming state at all;
ref:docs/GUIDE.md:461-482 lists durable consumers and live tail as future
work). Spark's GroupState gives checkpointed per-key state with timeouts.

``streaming_sessionize`` is the streaming twin of the batch
``scan_sessionization`` query: per-user sessions close when the *event-time*
watermark passes ``last message + gap`` (EventTimeTimeout), so closed
streaming sessions equal their batch twins exactly; at most one still-open
session per user remains unemitted when input ends.

Gotcha (cost a debugging loop): re-arming a timeout on every invocation
keeps availableNow's "cleaning up state" phase alive forever. The timeout
branch must flush WITHOUT re-arming — here it keeps a counter-only state
row (``state.update((session_no, 0, None, None))``, no timeout armed) so
session numbering stays monotone across timeout-closed sessions; an
operator with no cross-session state (e.g. streaming dedup) should
``state.remove()`` instead. Either way: never re-arm.

CHECKPOINT COMPATIBILITY: the r10 review changed this module's state
semantics (the sessionizer's keep-counter row above) and widened
``streaming/funnel.py``'s ``_STATE_SCHEMA`` with ``t_act`` — streaming
checkpoints written by pre-r10 versions of these operators must be
DISCARDED (a restarted query would fail on the schema change or misread
old state rows). Spark's state store does not migrate custom
applyInPandasWithState schemas.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_no", T.LongType()),
        T.StructField("n_msgs", T.LongType()),
        T.StructField("first_seq", T.LongType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_no", T.LongType()),
        T.StructField("n_msgs", T.LongType()),
        T.StructField("first_seq", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

_EPOCH = _dt.datetime(1970, 1, 1)


def _us_to_ts(us: int) -> _dt.datetime:
    return _EPOCH + _dt.timedelta(microseconds=us)


def _sessionize_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        cols = ["user_id", "session_no", "n_msgs", "first_seq", "last_ts"]

        if state.hasTimedOut:
            # watermark passed last_ts + gap: flush the open session but
            # KEEP the session counter (an empty-session state row with no
            # timeout armed — arming would keep availableNow's cleanup
            # loop alive forever). Dropping the whole state here reset
            # session_no to 1 after every timeout-closed session, emitting
            # DUPLICATE (user_id, session_no) keys where the batch twin
            # numbers sessions monotonically (r10 review). Cost: one
            # 4-long state row per ever-seen user persists — the price of
            # exact batch-equal numbering, same order as any per-user
            # lifetime state.
            session_no, n_msgs, first_seq, last_ts_us = state.get
            state.update((session_no, 0, None, None))
            if n_msgs:
                yield pd.DataFrame(
                    [(user_id, session_no, n_msgs, first_seq, _us_to_ts(last_ts_us))],
                    columns=cols,
                )
            return

        if state.exists:
            session_no, n_msgs, first_seq, last_ts_us = state.get
        else:
            session_no, n_msgs, first_seq, last_ts_us = 0, 0, None, None

        events = []
        for pdf in pdfs:
            for seq, ts in zip(pdf["seq"], pdf["ts_nats"]):
                # a null ts (NaT) would otherwise become the sentinel
                # value -2^63 → a bogus 1677 session boundary and an
                # OverflowError at emit (r09 review). A message with no
                # event time cannot be placed in a session: drop it.
                stamp = pd.Timestamp(ts)
                if pd.isna(stamp):
                    continue
                events.append((int(stamp.value) // 1000, int(seq)))
        events.sort()

        rows = []
        for ts_us, seq in events:
            if last_ts_us is None or ts_us - last_ts_us > gap_us:
                if n_msgs:  # close the previous session
                    rows.append(
                        (user_id, session_no, n_msgs, first_seq, _us_to_ts(last_ts_us))
                    )
                session_no += 1
                n_msgs, first_seq = 0, seq
            n_msgs += 1
            last_ts_us = ts_us
        if last_ts_us is None:
            # every row in this batch had a null ts and no session is
            # open: nothing to track and no timeout to arm (arming on
            # None would TypeError)
            return
        state.update((session_no, n_msgs, first_seq, last_ts_us))
        # close via event time: fires when the watermark passes last + gap
        state.setTimeoutTimestamp(last_ts_us // 1000 + gap_minutes * 60 * 1000)
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    return fn


def streaming_sessionize(
    stream_df: DataFrame,
    gap_minutes: int = 30,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Per-user gap sessions over a streaming message scan.

    ``watermark_delay`` is the allowed CROSS-BATCH event-time disorder:
    under EventTimeTimeout Spark drops any input row older than the
    watermark before the state function sees it, so with the default
    ``"0 seconds"`` an event that arrives a micro-batch later than a
    newer event is silently excluded — fine for seq-ordered message-log
    replays (ts monotone with seq), wrong for disordered feeds. Closed
    sessions equal the batch twin exactly WHEN disorder ≤ the delay; set
    e.g. ``f"{gap_minutes} minutes"`` for gap-bounded disorder, at the
    cost of sessions closing that much later.
    """
    return (
        stream_df.withWatermark("ts_nats", watermark_delay)
        .selectExpr(
            "CAST(regexp_extract(subject, '\\\\.u(\\\\d+)$', 1) AS BIGINT) AS user_id",
            "seq",
            "ts_nats",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_minutes),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

"""Streaming EWMA rate baseline + anomaly flag — the stateful twin of the
batch ``scan_ewma_trend`` query.

Per subject, the state is four scalars (current hour, its running count,
the EWMA over previously CLOSED hours, and a has-baseline bit) — constant
memory per key forever, the canonical bounded-state shape. When an event
for a later hour arrives, the open hour closes: its count folds into the
EWMA with dyadic α=0.25 (``0.25·cnt + 0.75·ewma`` — the identical IEEE
sequence the batch fold evaluates, so closed-hour streaming values equal
the batch prefix exactly), and the closed hour is emitted with an anomaly
flag (count > 3× the pre-fold baseline). Like the batch query, only
OBSERVED hours participate — silent hours neither emit nor decay.

Ordering contract: events are sorted within each micro-batch; across
batches the source must deliver a subject's hours non-decreasing (true for
the append-only replay log). A late hour folds into the current hour's
count rather than rewriting history — documented, matching the metric's
monitoring use."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_SCHEMA = T.StructType(
    [
        T.StructField("subject", T.StringType()),
        T.StructField("hour", T.LongType()),
        T.StructField("n_msgs", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cur_hour", T.LongType()),
        T.StructField("cur_cnt", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
        T.StructField("has_ewma", T.BooleanType()),
    ]
)


def _ewma_fn(alpha: float, spike_factor: float):
    one_minus = 1.0 - alpha

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (subject,) = key
        if state.hasTimedOut:  # pragma: no cover — NoTimeout configured
            state.remove()
            return
        if state.exists:
            cur_hour, cur_cnt, ewma, has_ewma = state.get
        else:
            cur_hour, cur_cnt, ewma, has_ewma = None, 0, 0.0, False

        hours: list = []
        for pdf in pdfs:
            # null event times arrive as NaN (nullable ts_nats upstream) —
            # int(NaN) raises and kills the whole streaming query (the r09
            # funnel/sessionize crash class; this module was missed in
            # that sweep — r10 review). An event with no time belongs to
            # no hour: drop it.
            hours.extend(int(h) for h in pdf["h"] if pd.notna(h))
        hours.sort()

        rows = []
        for h in hours:
            if cur_hour is None:
                cur_hour, cur_cnt = h, 1
            elif h <= cur_hour:  # same hour, or late data folded forward
                cur_cnt += 1
            else:
                # close cur_hour: emit with the PRE-fold baseline, then fold
                baseline = ewma if has_ewma else float(cur_cnt)
                rows.append(
                    (
                        subject,
                        cur_hour,
                        cur_cnt,
                        alpha * cur_cnt + one_minus * ewma if has_ewma
                        else float(cur_cnt),
                        has_ewma and cur_cnt > spike_factor * baseline,
                    )
                )
                ewma = rows[-1][3]
                has_ewma = True
                cur_hour, cur_cnt = h, 1
        state.update((cur_hour, cur_cnt, ewma, has_ewma))
        if rows:
            yield pd.DataFrame(
                rows, columns=["subject", "hour", "n_msgs", "ewma", "is_anomaly"]
            )

    return fn


def streaming_ewma_anomaly(
    stream_df: DataFrame,
    alpha: float = 0.25,
    spike_factor: float = 3.0,
) -> DataFrame:
    """Per-subject closed-hour EWMA snapshots with spike flags; the still-
    open hour per subject stays in state (like the batch query's last
    point, which has no successor to close it)."""
    toks = stream_df.select(
        "subject",
        F.expr("unix_micros(ts_nats) div 3600000000").alias("h"),
    )
    return toks.groupBy("subject").applyInPandasWithState(
        _ewma_fn(alpha, spike_factor),
        outputStructType=EWMA_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

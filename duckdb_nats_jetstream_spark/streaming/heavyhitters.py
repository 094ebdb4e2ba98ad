"""Streaming heavy hitters with bounded state (Misra–Gries summaries).

The batch engine answers "top subjects by message count" with one hash
aggregation; a stream can't hold per-token counts forever — cardinality is
unbounded. The Misra–Gries sketch keeps at most ``k`` counters per state
key and guarantees, after ``n`` items, (a) every token with true count
> n/(k+1) is present, and (b) each kept counter underestimates its true
count by at most n/(k+1). That bound is what the test asserts.

Scale shape: tokens are grouped by ``pmod(xxhash64(token), n_parts)`` so
every occurrence of a token lands in ONE state partition (the guarantee
then holds per partition with its local n) and the shuffle fans out across
the cluster; state per partition is a fixed k counters regardless of input
volume. Output mode is ``update`` — each micro-batch re-emits the
partitions it touched; readers take the latest snapshot per partition.

Not SQL-expressible (stateful sketch), so no oracle entry; the batch twin
for verification is the exact ``groupBy(token).count()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HH_SCHEMA = T.StructType(
    [
        T.StructField("part", T.IntegerType()),
        T.StructField("token", T.StringType()),
        T.StructField("mg_count", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _mg_merge(counters: dict, token: str, c: int, k: int) -> None:
    """Fold ``c`` occurrences of ``token`` into a Misra–Gries summary of at
    most ``k`` counters (batched decrement step — equivalent to c unit
    inserts, proof: decrementing all k+1 counters together preserves every
    error bound)."""
    counters[token] = counters.get(token, 0) + c
    if len(counters) > k:
        d = min(counters.values())
        for t in list(counters):
            counters[t] -= d
            if counters[t] <= 0:
                del counters[t]


def _hh_fn(k: int):
    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (part,) = key
        if state.hasTimedOut:  # pragma: no cover — NoTimeout configured
            state.remove()
            return
        if state.exists:
            tokens, counts, n_seen = state.get
            counters = dict(zip(tokens, counts))
        else:
            counters, n_seen = {}, 0

        for pdf in pdfs:
            # batch-local pre-aggregation: one _mg_merge per distinct token.
            # dropna=False so a NULL token is COUNTED into n_seen (the
            # guarantee bound is asserted against n_seen — silently
            # excluding processed rows under-counts it; r10 review) but
            # never becomes a candidate: NULL is not a reportable key, and
            # the batch verification twin's NULL group is filtered the
            # same way in the tests.
            for token, c in pdf["token"].value_counts(dropna=False).items():
                n_seen += int(c)
                if not pd.isna(token):
                    _mg_merge(counters, token, int(c), k)

        state.update((list(counters), [counters[t] for t in counters], n_seen))
        yield pd.DataFrame(
            [(part, t, c, n_seen) for t, c in sorted(counters.items())],
            columns=["part", "token", "mg_count", "n_seen"],
        )

    return fn


def streaming_heavy_hitters(
    stream_df: DataFrame,
    token_col: str = "subject",
    k: int = 8,
    n_parts: int = 8,
) -> DataFrame:
    """Misra–Gries heavy-hitter summaries over a streaming column: at most
    ``k`` counters per hash partition, ``update``-mode snapshots."""
    toks = stream_df.select(
        F.col(token_col).alias("token"),
        F.pmod(F.xxhash64(F.col(token_col)), F.lit(n_parts))
        .cast("int")
        .alias("part"),
    )
    return toks.groupBy("part").applyInPandasWithState(
        _hh_fn(k),
        outputStructType=HH_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

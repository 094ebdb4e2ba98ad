"""User-defined function registration surface: scalar (vectorized pandas)
UDF, grouped-agg pandas UDAF, and a Python UDTF — the extension points the
reference has no equivalent of (its only function is the table function
itself; host-DuckDB UDFs are out of its scope, SURVEY.md §2.B "not
present"), exposed here because an engine users switch *to* needs them.

Performance stance (the reason each shape was chosen):

- scalar + grouped-agg functions are **Arrow-vectorized pandas UDFs** —
  whole columns cross the Python boundary as Arrow buffers, numpy does the
  math; never a row-at-a-time Python UDF on a hot path;
- the UDTF yields rows lazily per input row (Spark streams the generator
  into the lateral join); the heavy tokenize work stays a one-liner on
  an already-normalized string.

Cross-engine exactness: money goes through ``np.rint(x * 100)`` — the
stored values are clean 2-decimal doubles, so ``x*100`` is never a
halfway case and rint (half-even) agrees with DuckDB's ``round``
(half-away) on every input; sums are then exact int64.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf("long")
def cents(x: pd.Series) -> pd.Series:
    """Scalar vectorized UDF: dollars (2-decimal double) → exact cents.

    Nullable ``Int64``, not numpy int64: a NULL dollar arrives as NaN and
    ``np.rint(NaN).astype('int64')`` silently yields INT64_MIN — a garbage
    sentinel that would fold into downstream sums. ``.round()`` is numpy
    rint (half-even), preserving the module-docstring exactness argument.
    """
    return (x * 100).round().astype("Int64")


@pandas_udf("long")
def cents_sum(x: pd.Series) -> int | None:
    """Grouped-agg pandas UDAF: exact total cents of a money column.
    SQL SUM semantics: NULLs are skipped; an all-NULL (or empty) group
    sums to NULL, never to an INT64_MIN-corrupted total."""
    v = (x * 100).round().astype("Int64")
    if v.notna().sum() == 0:
        return None
    return int(v.sum())


@udtf(returnType="token: string")
class SplitTokens:
    """Python UDTF: one output row per whitespace token of the normalized
    input (lower + collapse whitespace + trim — mirrors
    ``functions.text.tokens``)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for t in " ".join(text.lower().split()).split(" "):
            yield (t,)


def register_udx(spark: SparkSession) -> None:
    """Register all three under stable SQL names (idempotent)."""
    spark.udf.register("udx_cents", cents)
    spark.udf.register("udx_cents_sum", cents_sum)
    spark.udtf.register("udx_split_tokens", SplitTokens)

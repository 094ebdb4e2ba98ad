"""Mergeable equi-width histogram sketch for quantile estimation.

The fixed-grid member of the sketch family (count-min → frequencies,
`operators/sketch.py`; HyperLogLog → cardinality, `operators/hll.py`;
Misra–Gries → heavy hitters, `streaming/heavyhitters.py`): values hash into
a FIXED bin grid ``[lo, hi) / n_bins``, so the sketch relation is ≤ n_bins
rows whatever the input, the build aggregation map-side-combines to ≤ n_bins
rows per partition, and shard sketches merge bin-wise with ``sum`` —
per-day/per-stream partials roll up without re-reading anything (the same
mergeability contract the count-min cell table tests pin).

Quantile estimates interpolate inside the covering bin — the classic
equi-width histogram estimator (error bounded by bin width; narrow the grid
or switch to `operators/quantiles.exact_group_quantiles` when the band
matters). Cross-engine exactness: bins are ``floor((x − lo) / width)`` —
one subtraction, one division, one floor, all correctly-rounded IEEE ops —
counts are integers, and the cumulative scan folds the ≤ n_bins rows in
ascending bin order in both engines, so the interpolation arithmetic sees
identical doubles.

Reference scope: beyond the reference extension (scan + extraction only,
ref:src/nats_scan.cpp:700-790); north-star analytics surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from duckdb_nats_jetstream_spark.operators.similarity import sql_lit_f64


def hist_bins(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    *group_cols: str | F.Column,
) -> DataFrame:
    """The sketch relation ``(bin, cnt)`` — per group when ``group_cols``
    are given (≤ n_bins rows per group). Values outside [lo, hi) clamp to
    the edge bins (they stay counted — quantiles of a clipped tail are
    still bounded by the edge bin's range); NULLs are excluded, matching
    what every SQL quantile aggregate does."""
    width = (hi - lo) / n_bins
    b = F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(width))
    bin_ = F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1)).cast("long")
    sel = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, bin_.alias("bin")
    )
    return sel.groupBy(*sel.columns).agg(F.count(F.lit(1)).alias("cnt"))


def merge_hist(*sketches: DataFrame) -> DataFrame:
    """Union of histogram sketches = count sum per (group_cols…, bin).

    Grouped sketches (built with ``group_cols``) merge per group — see
    :func:`operators.hll.merge_keyed_sketch` (shared union-merge)."""
    from duckdb_nats_jetstream_spark.operators.hll import merge_keyed_sketch

    return merge_keyed_sketch(sketches, "cnt", F.sum)


def hist_quantiles(
    sketch: DataFrame,
    qs: Sequence[float],
    lo: float,
    hi: float,
    n_bins: int,
    *group_cols: str,
) -> DataFrame:
    """Quantile-estimate rows from a sketch relation — one row per group
    (e.g. a day column; no groups → a single global row).

    For each q: target = q·(N−1) ranks into the cumulative bin counts; the
    estimate interpolates position inside the covering bin:
    ``lo + width·(bin + (target − cum_before) / cnt_bin)``.
    """
    width = (hi - lo) / n_bins
    packed = (
        sketch.select(*group_cols, F.struct("bin", "cnt").alias("bc"))
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("bc")).alias("arr"))
    )
    packed = packed.select(
        *group_cols,
        "arr",
        F.aggregate(
            "arr", F.lit(0).cast("long"), lambda a, x: a + x["cnt"]
        ).alias("n"),
    )

    def _fold(q: float):
        # factory: the merge lambda must take exactly (acc, x) — PySpark
        # HOFs infer arity from the signature, so no default-arg captures
        target = F.lit(float(q)) * (F.col("n") - 1).cast("double")
        init = F.struct(
            F.lit(0.0).alias("cum"), F.lit(None).cast("double").alias("est")
        )

        def step(acc, x):
            cnt_d = x["cnt"].cast("double")
            return F.struct(
                (acc["cum"] + cnt_d).alias("cum"),
                F.when(acc["est"].isNotNull(), acc["est"])
                .when(
                    acc["cum"] + cnt_d > target,
                    F.lit(lo)
                    + F.lit(width)
                    * (x["bin"].cast("double") + (target - acc["cum"]) / cnt_d),
                )
                .otherwise(F.lit(None).cast("double"))
                .alias("est"),
            )

        return F.aggregate("arr", init, step)["est"]

    cols = [_fold(q).alias(f"q_{str(q).replace('.', '_')}") for q in qs]
    return packed.select(*group_cols, F.col("n").alias("n"), *cols)


def sql_hist_bins(
    value_expr: str, table: str, lo: float, hi: float, n_bins: int
) -> str:
    """DuckDB mirror of :func:`hist_bins` (CTE body)."""
    width = (hi - lo) / n_bins
    return f"""
  SELECT CAST(least(greatest(floor((CAST({value_expr} AS DOUBLE) - {sql_lit_f64(lo)}) / {sql_lit_f64(width)}), 0), {n_bins - 1}) AS BIGINT) AS bin,
         count(*) AS cnt
  FROM {table}
  WHERE {value_expr} IS NOT NULL
  GROUP BY 1
"""


def sql_hist_quantiles(
    qs: Sequence[float], lo: float, hi: float, n_bins: int, sketch_cte: str = "hist"
) -> str:
    """DuckDB mirror of :func:`hist_quantiles`: same ascending-bin fold.
    DuckDB's ``list_reduce`` accumulator must share the element type, so the
    elements carry (cum, est, b, c) and the fold threads cum/est through.
    The target ``q·(n−1)`` references the total from a CTE — identical
    doubles to the Spark side's ``lit(q) * (n - 1)``."""
    width = (hi - lo) / n_bins
    q_exprs = []
    for q in qs:
        name = f"q_{str(q).replace('.', '_')}"
        # Two DuckDB lambda quirks pinned by tests/test_pipeline5_ops.py:
        # (1) outer column references inside list_reduce lambdas misresolve,
        #     so the total rides along in every element ('n' field);
        # (2) the struct-pack's fields evaluate SEQUENTIALLY and later fields
        #     see earlier fields' updated values through `acc` — so 'est'
        #     (which needs the PRE-update running count) must come before
        #     'cum' in field order. Spark's F.aggregate is purely functional
        #     and indifferent to the order.
        target = f"({sql_lit_f64(q)} * (x.n - 1))"
        q_exprs.append(
            f"""
       (list_reduce(
          list_prepend({{'est': CAST(NULL AS DOUBLE), 'cum': CAST(0 AS DOUBLE),
                         'b': CAST(0 AS DOUBLE), 'c': CAST(0 AS DOUBLE),
                         'n': CAST(0 AS DOUBLE)}}, arr),
          (acc, x) -> {{
            'est': CASE WHEN acc.est IS NOT NULL THEN acc.est
                        WHEN acc.cum + x.c > {target}
                        THEN {sql_lit_f64(lo)} + {sql_lit_f64(width)} * (x.b + ({target} - acc.cum) / x.c)
                        ELSE CAST(NULL AS DOUBLE) END,
            'cum': acc.cum + x.c,
            'b': x.b, 'c': x.c, 'n': x.n
          }})).est AS {name}"""
        )
    joined = ",".join(q_exprs)
    return f"""
  SELECT CAST(tot.n AS BIGINT) AS n, {joined}
  FROM (SELECT list({{'est': CAST(NULL AS DOUBLE), 'cum': CAST(cnt AS DOUBLE),
                      'b': CAST(bin AS DOUBLE), 'c': CAST(cnt AS DOUBLE),
                      'n': CAST(tot.n AS DOUBLE)}}
               ORDER BY bin) AS arr
        FROM {sketch_cte}, (SELECT sum(cnt) AS n FROM {sketch_cte}) tot) packed,
       (SELECT sum(cnt) AS n FROM {sketch_cte}) tot
"""

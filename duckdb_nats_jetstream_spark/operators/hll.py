"""HyperLogLog cardinality sketch built from relational primitives.

Flajolet et al. 2007 ("HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm"), done Spark-shaped: the sketch is a
*relation* of ``(register, max_rank)`` rows — m = 256 registers addressed by
the first two md5 hex chars, rank = leading-zero count of the remaining 120
bits plus one — and every HLL operation maps onto a relational op:

- **build**: one map (md5 → register/rank split) + one ``groupBy(register).
  max(rank)`` hash aggregation. Map-side partial max means the shuffle moves
  ≤ m rows per input partition regardless of input size — the whole point of
  sketching at 100 TB.
- **merge** (sketch union across shards/days): the SAME aggregation over the
  union of register relations — max is associative/commutative, so
  incremental daily merges and one global build are bit-identical
  (:func:`merge_registers`; the count-min cell table in
  ``operators.sketch`` follows the same pattern with ``sum``).
- **estimate**: fold the ≤ 256-row register relation into the harmonic-mean
  denominator. The fold runs over the register array *sorted by register
  index* in both engines, so double summation order — the one place IEEE
  non-associativity could diverge — is pinned (same trick as every fold-dot
  in ``functions/vector.py``).

Exactness notes for the oracle gate:
- register / rank extraction is integer + string ops on the md5 hex — no
  floats until the estimate;
- ``2^-rank`` is computed as ``1.0 / CAST(shiftleft(1L, rank) AS DOUBLE)``
  — exact powers of two (rank is capped at 60 to stay in int64; unreachable
  in practice: P[rank > 60] ≈ n · 2⁻⁶⁰);
- the bias constant α·m² evaluates from the same literals in the same
  textual op order both sides → identical doubles;
- the raw estimate is reported WITHOUT the small-range linear-counting
  correction (it needs ``ln``, which is not correctly-rounded-identical
  across engines — the same reason the tf-idf query uses raw idf). The
  zero-register count ``n_zero`` is emitted so a consumer can apply any
  correction downstream.

Reference scope: beyond the reference extension (scan + extraction only,
ref:src/nats_scan.cpp:700-790); north-star analytics surface, paired with
the count-min sketch (`operators/sketch.py`) as the mergeable-summary family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: number of registers (2 hex chars of addressing → 16² = 256, a power of 2)
M = 256
_HEX = "0123456789abcdef"


def _nibble(c: F.Column) -> F.Column:
    """hex char → 0..15 (Spark ``conv``; the DuckDB mirror uses ``strpos``
    over the hex alphabet — same integers)."""
    return F.conv(c, 16, 10).cast("long")


def register_rank_cols(value_col: str, salt: str = "hll:") -> tuple[F.Column, F.Column]:
    """The two row-local sketch expressions ``(register, rank)`` — shared by
    the batch build and the streaming windowed build so both produce
    identical registers by construction."""
    h = F.md5(F.concat(F.lit(salt), F.col(value_col).cast("string")))
    reg = _nibble(F.substring(h, 1, 2))
    rest = F.substring(h, 3, 30)
    lead0 = F.length(F.regexp_extract(rest, "^(0*)", 1))
    first_nz = _nibble(F.substring(rest, (lead0 + 1).cast("int"), 1))
    nlz_in_nibble = (
        F.when(first_nz >= 8, 0)
        .when(first_nz >= 4, 1)
        .when(first_nz >= 2, 2)
        .otherwise(3)
    )
    rank = F.when(
        lead0 >= 30, F.lit(60)  # all 120 bits zero (P ≈ 2⁻¹²⁰): cap
    ).otherwise(F.least(lead0 * 4 + nlz_in_nibble + 1, F.lit(60)))
    return reg.cast("long"), rank.cast("long")


def hll_registers(
    df: DataFrame, value_col: str, salt: str = "hll:"
) -> DataFrame:
    """The sketch relation ``(register, max_rank)`` for the distinct values
    of ``value_col`` — ≤ 256 rows whatever the input size. NULLs don't
    count toward cardinality (SQL ``COUNT(DISTINCT)`` semantics) and are
    filtered before hashing — otherwise ``md5(concat(...))`` nulls through
    and a bogus NULL register row pollutes the sketch."""
    reg, rank = register_rank_cols(value_col, salt)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(reg.alias("register"), rank.alias("rank"))
        .groupBy("register")
        .agg(F.max("rank").alias("max_rank"))
    )


def merge_keyed_sketch(sketches, value_col: str, agg) -> DataFrame:
    """Shared union-merge for keyed sketch relations (HLL registers,
    histogram bins): the merge key is every column except ``value_col``,
    so group columns survive the merge instead of collapsing distinct
    groups; ``agg`` (e.g. ``F.max`` / ``F.sum``) folds the stacked value."""
    out = sketches[0]
    keys = [c for c in out.columns if c != value_col]
    for s in sketches[1:]:
        if set(s.columns) != set(out.columns):
            # not assert: library validation must survive ``python -O``
            raise ValueError(
                f"sketch schema mismatch: {s.columns} vs {out.columns}"
            )
        out = out.unionByName(s)
    return out.groupBy(*keys).agg(agg(value_col).alias(value_col))


def merge_registers(*sketches: DataFrame) -> DataFrame:
    """Union of HLL sketches = max per (group_cols…, register)."""
    return merge_keyed_sketch(sketches, "max_rank", F.max)


def hll_estimate(registers: DataFrame, *group_cols: str) -> DataFrame:
    """Estimate rows from a register relation: raw HLL estimate, register
    occupancy, and the harmonic denominator (register-index fold order).
    With ``group_cols`` (e.g. a window column), one estimate per group —
    each group folds its own ≤ m registers."""
    term = F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), max_rank)").cast(
        "double"
    )
    grouped = registers.select(
        *group_cols, F.struct(F.col("register"), term.alias("term")).alias("rt")
    ).groupBy(*group_cols)
    packed = grouped.agg(
        F.array_sort(F.collect_list("rt")).alias("arr"),
        F.count("*").alias("n_present"),
    )
    # absent registers contribute 2⁻⁰ = 1.0 each: fold starts at n_zero
    denom = F.aggregate(
        F.col("arr"),
        (F.lit(M) - F.col("n_present")).cast("double"),
        lambda acc, x: acc + x["term"],
    )
    alpha_m2 = (
        F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(M)))
    ) * F.lit(float(M * M))
    return packed.select(
        *group_cols,
        F.lit(M).cast("long").alias("m"),
        F.col("n_present").cast("long").alias("n_present"),
        (F.lit(M) - F.col("n_present")).cast("long").alias("n_zero"),
        denom.alias("denom"),
        (alpha_m2 / denom).alias("raw_estimate"),
    )


def sql_register_rank_exprs(value_expr: str, salt: str = "hll:") -> tuple[str, str]:
    """DuckDB mirrors of :func:`register_rank_cols` — the two row-local
    expressions, for composing grouped/windowed register builds."""
    # '' escaping: a salt with a quote must quote, not break, the SQL
    h = f"md5('{salt.replace(chr(39), chr(39) * 2)}' || CAST({value_expr} AS VARCHAR))"
    nib = "strpos('{hex}', {c}) - 1".format
    reg = (
        f"(({nib(hex=_HEX, c=f'substr({h}, 1, 1)')}) * 16 + "
        f"({nib(hex=_HEX, c=f'substr({h}, 2, 1)')}))"
    )
    rank = f"""CASE WHEN length(regexp_extract(substr({h}, 3, 30), '^(0*)', 1)) >= 30
                THEN 60
                ELSE least(
                  length(regexp_extract(substr({h}, 3, 30), '^(0*)', 1)) * 4
                  + (CASE
                       WHEN strpos('{_HEX}', substr(substr({h}, 3, 30),
                         length(regexp_extract(substr({h}, 3, 30), '^(0*)', 1)) + 1, 1)) - 1 >= 8 THEN 0
                       WHEN strpos('{_HEX}', substr(substr({h}, 3, 30),
                         length(regexp_extract(substr({h}, 3, 30), '^(0*)', 1)) + 1, 1)) - 1 >= 4 THEN 1
                       WHEN strpos('{_HEX}', substr(substr({h}, 3, 30),
                         length(regexp_extract(substr({h}, 3, 30), '^(0*)', 1)) + 1, 1)) - 1 >= 2 THEN 2
                       ELSE 3
                     END) + 1,
                  60)
           END"""
    return reg, rank


def sql_hll_registers(value_expr: str, table: str, salt: str = "hll:") -> str:
    """DuckDB mirror of :func:`hll_registers` (a CTE body, no trailing ;)."""
    reg, rank = sql_register_rank_exprs(value_expr, salt)
    return f"""
  SELECT CAST(register AS BIGINT) AS register,
         CAST(max(rank) AS BIGINT) AS max_rank
  FROM (
    SELECT {reg} AS register,
           {rank} AS rank
    FROM {table}
    WHERE {value_expr} IS NOT NULL
  ) t
  GROUP BY register
"""


def sql_hll_estimate(registers_cte: str = "regs") -> str:
    """DuckDB mirror of :func:`hll_estimate` over a register CTE — same
    register-ordered fold, same literal arithmetic."""
    return f"""
  SELECT CAST({M} AS BIGINT) AS m,
         CAST(n_present AS BIGINT) AS n_present,
         CAST({M} - n_present AS BIGINT) AS n_zero,
         denom,
         ((0.7213 / (1.0 + 1.079 / {float(M)})) * {float(M * M)}) / denom
           AS raw_estimate
  FROM (
    SELECT count(*) AS n_present,
           list_reduce(
             list_prepend(CAST({M} - count(*) AS DOUBLE),
                          list(1.0 / CAST((CAST(1 AS BIGINT) << max_rank) AS DOUBLE)
                               ORDER BY register)),
             (acc, x) -> acc + x) AS denom
    FROM {registers_cte}
  ) s
"""

"""Cross-engine exact aggregation helpers.

The driver's correctness gate hashes result *values* against a DuckDB oracle.
Floating-point SUM/AVG over doubles is order-dependent, and Spark and DuckDB
accumulate in different orders — so naive double sums hash-mismatch in the
last ulp. These helpers make money-like aggregates *exactly* reproducible in
both engines:

    sum:  SUM(CAST(x AS DECIMAL(18,2)))  → exact decimal, order-independent
          → CAST AS DOUBLE (deterministic nearest rounding, same both sides)
    avg:  exact decimal sum cast to double, divided by COUNT (one IEEE fdiv,
          identical both sides)

The decimal cast per value is deterministic (nearest-.01 of the stored
double), so Spark and DuckDB agree bit-for-bit. The SQL mirror of each helper
is in the docstring; oracle queries must use it verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEC = "decimal(18,2)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, alias: str) -> Column:
    """SQL mirror: ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS alias``"""
    return F.sum(_c(col).cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """SQL mirror:
    ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x) AS alias``"""
    c = _c(col)
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def net_price() -> Column:
    """``price * (1 - discount)`` computed entirely in decimal.

    Casting the *product of doubles* to decimal is NOT cross-engine stable:
    2-decimal price × 2-decimal discount yields exact 4-decimal values whose
    2-decimal rounding is a halfway case, and Spark (binary-exact HALF_UP)
    and DuckDB (decimal-literal rounding) resolve those differently. Casting
    the raw stored values first (never halfway — they're clean 2-decimal
    doubles) and multiplying in decimal keeps both engines exact and equal.

    SQL mirror: ``CAST(l_extendedprice AS DECIMAL(18,2)) *
    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))``
    """
    one = F.lit(1).cast("decimal(18,4)")
    return F.col("l_extendedprice").cast(DEC) * (
        one - F.col("l_discount").cast("decimal(18,4)")
    )


#: SQL mirror of :func:`net_price`
NET_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"
)


def decsum(expr: Column, alias: str) -> Column:
    """Sum an already-exact decimal expression, output double.

    SQL mirror: ``CAST(SUM(<expr>) AS DOUBLE) AS alias``"""
    return F.sum(expr).cast("double").alias(alias)

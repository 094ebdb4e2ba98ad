"""Local replica of the driver's correctness gate: run each registered Spark
query and its DuckDB oracle on the same parquet tables, compare row count,
column names, and order-insensitive values (exact equality — the driver
hashes, so a last-ulp float difference is a failure here too)."""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if hasattr(v, "isoformat"):  # datetime/date — normalize tz-naive µs
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


#: DuckDB result types that pandas renders as float/object — the driver's
#: pandas-side hash then disagrees with Spark's int64 even when every value
#: is equal (learned from r01 rel_udaf_cents: 25/25 identical rows, hash
#: mismatch). fetchall() (below) can't see this, so check the declared
#: relation types explicitly.
_HASH_RISKY_TYPES = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"}


def _type_risks(con, sql: str, name: str) -> list[str]:
    try:
        rel = con.sql(sql)
    except Exception:
        return []  # execution errors surface via the normal path
    return [
        f"{name}: oracle column '{c}' is {t} — pandas renders it as "
        f"float/object and the driver hash will mismatch; CAST it in the SQL"
        for c, t in zip(rel.columns, [str(t) for t in rel.types])
        if t in _HASH_RISKY_TYPES or t.startswith("DECIMAL")
    ]


def compare(spark_df, con, sql: str, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = list(_type_risks(con, sql, name))
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns
    res = con.execute(sql)
    oracle_cols = [d[0] for d in res.description]
    oracle_rows = res.fetchall()

    if sorted(spark_cols) != sorted(oracle_cols):
        problems.append(f"{name}: columns {sorted(spark_cols)} != {sorted(oracle_cols)}")
        return problems
    if len(spark_rows) != len(oracle_rows):
        problems.append(f"{name}: rowcount {len(spark_rows)} != {len(oracle_rows)}")

    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    o_order = sorted(range(len(oracle_cols)), key=lambda i: oracle_cols[i])
    # sort key tolerant of NULLs mixed with values (rollup/grouping sets)
    key = lambda t: tuple((v is None, str(type(v)), str(v)) for v in t)  # noqa: E731
    s_vals = sorted(
        (tuple(_norm(r[i]) for i in order) for r in (tuple(x) for x in spark_rows)),
        key=key,
    )
    o_vals = sorted(
        (tuple(_norm(r[i]) for i in o_order) for r in oracle_rows), key=key
    )
    if s_vals != o_vals:
        diffs = [
            (a, b) for a, b in zip(s_vals, o_vals) if a != b
        ][:3]
        extra = abs(len(s_vals) - len(o_vals))
        problems.append(f"{name}: value mismatch, first diffs={diffs} (+{extra} len diff)")
    return problems

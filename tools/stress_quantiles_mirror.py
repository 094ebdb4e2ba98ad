"""Quantiles family vs the DuckDB mirror AT the batch-20 crossover scale
(r08 verdict ask #8): a full-query-shaped `exact_group_quantiles` run on
10M near-distinct scored values, both engines reading the SAME parquet.

Context: `docs_quality_quantiles` is the one family whose single-node
mirror wins at sf0.1/sf1 (PERF.md footnote) — per-group value sets there
sit far below the ~10M-value crossover batch 20 measured value-level
(Spark-exact vs Spark-naive). This script pins the footnote at QUERY
level against the actual mirror engine: the query's quantile stage
(same groups-from-`source` shape, same ps=[.25,.5,.9], same symmetric
interpolation the oracle checks) over a 10M-row (source, qs) relation,
vs DuckDB's `quantile_cont` on the identical file with all cores.

The input is materialized parquet (not an in-session range) so BOTH
engines pay the same scan, and the qs values are a deterministic
hash-derived double — near-all distinct, the honest value-map case.
Value parity across engines is asserted before timing is reported.

Run:  python tools/stress_quantiles_mirror.py   (~2-3 min)
→ paste table into SCALING.md / PERF.md.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402

UI_PORT = 4101
N = 10_000_000
G = 5
PS = [0.25, 0.5, 0.9]
DATA = os.path.join(REPO, ".stress", f"qs_scored_{N}.parquet")


def build_data() -> None:
    if os.path.exists(DATA):
        return
    os.makedirs(os.path.dirname(DATA), exist_ok=True)
    import duckdb

    # deterministic near-distinct doubles; 5 sources with skewed sizes
    # (source s0 holds ~half the rows — the grouped-selection path must
    # not straggle on it). NB: odd r must cycle through ALL of s1..s4 —
    # `1 + (r % 4)` on odd r only ever yields 2 or 4 (r09 review catch),
    # so the cycle is driven by r//2.
    duckdb.sql(
        f"""
        COPY (
          SELECT 's' || CAST(CASE WHEN r % 2 = 0 THEN 0
                                  ELSE 1 + ((r // 2) % {G - 1}) END AS VARCHAR)
                   AS source,
                 CAST(hash(r) % 1000000007 AS DOUBLE) AS qs
          FROM (SELECT unnest(range({N})) AS r)
        ) TO '{DATA}' (FORMAT parquet)
        """
    )
    print(f"built {DATA}", file=sys.stderr)


def main() -> None:
    build_data()

    from duckdb_nats_jetstream_spark.operators.quantiles import (
        exact_group_quantiles,
    )

    spark = _sparkui.build_session("stress-quantiles-mirror", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")

    scored = spark.read.parquet(DATA)
    scored.count()  # warm scan/page cache so both engines start warm

    t0 = time.perf_counter()
    rows = exact_group_quantiles(scored, "source", "qs", PS).collect()
    spark_wall = time.perf_counter() - t0
    spark_vals = {
        r["source"]: [r["q_0"], r["q_1"], r["q_2"]] for r in rows
    }

    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW scored AS SELECT * FROM '{DATA}'")
    con.execute("SELECT count(*) FROM scored").fetchall()  # warm
    t0 = time.perf_counter()
    duck_rows = con.execute(
        "SELECT source, "
        + ", ".join(f"quantile_cont(qs, {p}) AS q{i}" for i, p in enumerate(PS))
        + ", count(*) AS n FROM scored GROUP BY source ORDER BY source"
    ).fetchall()
    duck_wall = time.perf_counter() - t0
    duck_vals = {r[0]: list(r[1:4]) for r in duck_rows}

    assert set(spark_vals) == set(duck_vals), (spark_vals, duck_vals)
    assert len(spark_vals) == G, (
        f"expected {G} groups, generator produced {sorted(spark_vals)}"
    )
    n_checked = 0
    for s in spark_vals:
        for a, b in zip(spark_vals[s], duck_vals[s]):
            assert a == b, f"value mismatch {s}: {a} != {b}"
            n_checked += 1
    print(f"parity: all {n_checked} group×p values bit-equal across engines",
          file=sys.stderr)

    print(
        "\n| relation | rows | spark exact_group_quantiles | duckdb "
        "quantile_cont (all cores) | ratio |"
    )
    print("|---|---|---|---|---|")
    print(
        f"| (source, qs) parquet | {N/1e6:.0f}M | {spark_wall:.1f}s "
        f"| {duck_wall:.1f}s | {spark_wall/duck_wall:.2f}× |"
    )


if __name__ == "__main__":
    main()

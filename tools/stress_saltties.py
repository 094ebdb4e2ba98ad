"""Timestamp-tie salt stress (round 7 — the r06 ADVICE scenario, measured).

The funnel's salted chain join splits a hot user across ``n_salts``
buckets by hashing the event timestamp. The ADVICE case: a hot user
whose events TIE on timestamp (second-granularity logs, duplicate
events) — ts-only salting maps them all to ONE bucket and the skew
survives. The fix is ``salt_col`` (any per-event id, deterministic —
a row-position salt would make the join's map stage indeterminate).

This measures exactly that: 1M events, one user owns 90%, every hot
event at the SAME timestamp. For each variant, the chain-join stage's
median/max task runtime (UI REST) and wall clock.

Run:  python tools/stress_saltties.py
"""

from __future__ import annotations

import json
import sys
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402

UI_PORT = 4087
N = 1_000_000
N_SALTS = 8


def main() -> None:
    from pyspark.sql import functions as F

    spark = _sparkui.build_session("stress-saltties", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")
    # keep the per-user side OFF the broadcast path so the chain joins
    # actually shuffle — that is the regime salting exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    from duckdb_nats_jetstream_spark.operators.funnel import funnel_user_stages

    ev = (
        spark.range(N)
        .select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id"))
            .alias("user_id"),
            # hot user: ONE shared timestamp; cold users: spread
            F.when(
                F.col("id") % 10 < 9,
                F.lit("2024-01-01 12:00:00").cast("timestamp"),
            )
            .otherwise(
                F.timestamp_seconds(F.lit(1704067200) + F.col("id") % 86400)
            )
            .alias("ts"),
            F.element_at(
                F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("event_type"),
        )
        .localCheckpoint()  # freeze the input so variants measure joins only
    )

    results = {}
    for label, kwargs in (
        ("ts_only_salt", dict(n_salts=N_SALTS)),
        ("salt_col_event_id", dict(n_salts=N_SALTS, salt_col="event_id")),
    ):
        before = _sparkui.stage_ids(UI_PORT)
        t0 = time.time()
        out = funnel_user_stages(
            ev, ["view", "click", "purchase"], algorithm="cascade", **kwargs
        )
        n = out.count()
        wall = time.time() - t0
        skews = []
        for sid, att in sorted(_sparkui.stage_ids(UI_PORT) - before):
            try:
                med, mx = _sparkui.task_skew(UI_PORT, sid, att)
                if mx > 0.2:
                    skews.append((sid, round(med, 2), round(mx, 2)))
            except Exception:
                pass
        worst = max((mx / max(med, 0.01) for _s, med, mx in skews), default=1.0)
        results[label] = {
            "wall_s": round(wall, 2),
            "rows": n,
            "stages_med_max_s": skews,
            "worst_straggler_x": round(worst, 1),
        }
        print(f"{label}: {wall:.2f}s, worst straggler {worst:.1f}x, "
              f"stages {skews}", file=sys.stderr)

    assert results["ts_only_salt"]["rows"] == results["salt_col_event_id"]["rows"]
    print("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()

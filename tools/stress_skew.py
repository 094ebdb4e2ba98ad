"""Skewed-key stress batch (r04 verdict ask #6): measure what a hot key
does to the user-keyed shuffle family at scale.

Skew, not volume, is what kills user-keyed shuffles at 100 TB: AQE's skew
splitting only rescues sort-merge JOINS — a skewed GROUP BY whose aggregate
has no map-side partial (collect_list) or a skewed window (row_number over
the hot user) concentrates the hot key in ONE reducer task no matter how
many executors exist. This harness builds a 100× events table where 90% of
all rows belong to a single user, runs the three verdict-named queries at
uniform-100× and skewed-100×, and reports per-run wall time plus the
max/median task runtime of the heaviest stage — the direct measurement of
"is one straggler task doing all the work".

Expected shapes (the hypotheses this measures):
- ``scan_salted_agg``   — two-phase salted aggregation: flat max/median.
- ``scan_funnel``       — collect_list groupBy(user): the hot user's array
  lands in ONE task (no map-side partial for collect_list).
- ``scan_latest_per_key`` — row_number window over user: the hot user's
  rows sort in ONE task; the measurement decides whether a max_by
  aggregation (map-side partial max per key) must replace the window.

Data lives under ``/root/repo/.stress/{uniform100,skew100}/`` (gitignored,
regenerated on demand; built atomically like stress_scale).

Run:  python tools/stress_skew.py   (~2-4 min)  → paste table into
SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC_DIR = "/root/testdata/sf0.1"
UNIFORM_DIR = os.path.join(REPO, ".stress", "uniform100")
SKEW_DIR = os.path.join(REPO, ".stress", "skew100")
#: 100× events (10M rows): at 10× the hot partition is ~20 MB and the
#: straggler signal drowns in task-startup noise — 100× makes the hot
#: user's ~9M rows vs a ~3k-row median partition measurable.
REPLICAS = 100
HOT_FRACTION = 0.9  # 90% of rows land on user_id = 1
UI_PORT = 4078

QUERIES = os.environ.get(
    "SPARK_GRAFT_SKEW_QUERIES",
    "scan_salted_agg,scan_funnel,scan_latest_per_key",
).split(",")


def _build_events(out_dir: str, skewed: bool) -> None:
    """100× events under ``out_dir`` (atomic build; dims symlinked at 1×).
    ``skewed=True`` reassigns 90% of rows (hash-deterministic) to user_id=1;
    ``skewed=False`` keeps per-replica-distinct users. Same row count and
    columns either way, so uniform-vs-skewed isolates the key distribution."""
    import duckdb

    expected = [f for f in os.listdir(SRC_DIR) if f.endswith(".parquet")]
    if os.path.isdir(out_dir) and all(
        os.path.lexists(os.path.join(out_dir, f)) for f in expected
    ):
        return
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    tmp_dir = out_dir + ".tmp"
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir)
    uid = (
        f"""CASE WHEN hash(e.event_id + r.k * 10000000) % 100
                      < {int(HOT_FRACTION * 100)}
                 THEN 1
                 ELSE e.user_id + r.k * 10000000 END"""
        if skewed
        else "e.user_id + r.k * 10000000"
    )
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT e.event_id + r.k * 10000000 AS event_id,
                 e.ts,
                 {uid} AS user_id,
                 e.event_type, e.value, e.props
          FROM '{SRC_DIR}/events.parquet' e,
               (SELECT unnest(range({REPLICAS})) AS k) r
          ORDER BY event_id
        ) TO '{tmp_dir}/events.parquet' (FORMAT parquet)
        """
    )
    for fname in expected:
        if not os.path.lexists(os.path.join(tmp_dir, fname)):
            os.symlink(
                os.path.join(SRC_DIR, fname), os.path.join(tmp_dir, fname)
            )
    os.rename(tmp_dir, out_dir)
    print(f"built {out_dir}: {REPLICAS}x events, skewed={skewed}",
          file=sys.stderr)


def _ui(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1/{path}") as r:
        return json.load(r)


def _app_id() -> str:
    return _ui("applications")[0]["id"]


def _stage_ids() -> set[tuple[int, int]]:
    return {
        (st["stageId"], st["attemptId"])
        for st in _ui(f"applications/{_app_id()}/stages?status=complete")
    }


def _task_skew(stage_id: int, attempt: int) -> tuple[float, float]:
    """(median_s, max_s) executor run time across the stage's tasks."""
    s = _ui(
        f"applications/{_app_id()}/stages/{stage_id}/{attempt}/taskSummary"
        "?quantiles=0.5,1.0"
    )
    med, mx = s["executorRunTime"]
    return med / 1000.0, mx / 1000.0


def run_one(spark, name: str, sf_dir: str) -> dict:
    from duckdb_nats_jetstream_spark.queries import full_registry

    fn, _sql = full_registry()[name]
    before = _stage_ids()
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    new = _stage_ids() - before
    # the heaviest stage (by max task time) is where a straggler would live
    worst_med, worst_max = 0.0, 0.0
    for sid, att in new:
        try:
            med, mx = _task_skew(sid, att)
        except Exception:  # noqa: BLE001 — tiny stages may lack summaries
            continue
        if mx > worst_max:
            worst_med, worst_max = med, mx
    return {
        "wall_s": round(wall, 2),
        "task_med_s": round(worst_med, 2),
        "task_max_s": round(worst_max, 2),
        "straggler_x": round(worst_max / worst_med, 1) if worst_med > 0 else None,
        "n_stages": len(new),
    }


def main() -> None:
    _build_events(UNIFORM_DIR, skewed=False)
    _build_events(SKEW_DIR, skewed=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("stress-skew")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from duckdb_nats_jetstream_spark.session import read_table

    read_table(spark, UNIFORM_DIR, "events").count()  # warm

    rows = []
    for name in QUERIES:
        ru = run_one(spark, name, UNIFORM_DIR)
        rs = run_one(spark, name, SKEW_DIR)
        rows.append((name, ru, rs))
        print(f"{name}: uniform {ru}  skewed {rs}", file=sys.stderr)

    print("\n| query | uniform-100× wall | skew-100× wall | uniform task med/max | skew task med/max | skew straggler× |")
    print("|---|---|---|---|---|---|")
    for name, ru, rs in rows:
        print(
            f"| {name} | {ru['wall_s']}s | {rs['wall_s']}s "
            f"| {ru['task_med_s']}/{ru['task_max_s']}s "
            f"| {rs['task_med_s']}/{rs['task_max_s']}s "
            f"| {rs['straggler_x']} |"
        )


if __name__ == "__main__":
    main()

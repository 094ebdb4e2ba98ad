"""Scan-pushdown stress batch (22): range predicates must prune I/O, and
the LAYOUT is the index — sorted row groups make the pruning real.

`sources/message_scan.py` claims its sequence/timestamp range predicates
reach the parquet scan as PushedFilters, giving "row-group min/max
pruning — the distributed analogue of the reference's cursor bounds +
broker binary search" (message_scan.py:168-173, mirroring
ref:src/nats_scan.cpp:546-595). Plan pins prove the filters are PUSHED;
this batch measures whether pushing them actually SKIPS bytes — and
shows the claim is a property of the log's physical order, not of the
predicate: the same pushed filter on a shuffled copy of the same rows
prunes nothing, because every row group's min/max spans the whole
domain.

Experiment: 10M-row synthetic `events` log (the sf schema), written
range-partitioned+sorted by event_id (JetStream arrival order, 64
contiguous files ≈ one row group each) with TIMESTAMP_MICROS encoding,
plus two negative controls — a hash-SCRAMBLED copy (same rows, no
order) and a sorted copy with Spark's DEFAULT INT96 timestamp encoding:

- full scan vs a ~1/64 seq-range slice vs a matching time-range slice
  through `message_scan`, instrumented by stage `inputRecords` — rows
  DECODED by the scan; a pruned row group decodes zero. (`inputBytes`
  is not usable: the local-fs vectorized reader under-reports it —
  0.39 MB for a full read of the 180 MB table — see
  `_sparkui.input_records`.)
- sorted+micros: both narrow scans must decode <10% of the rows
  (expected ≈1.6%: the 1-2 row groups overlapping the slice);
- scrambled: the same pushed seq filter must decode >99% — every page's
  min/max spans the whole domain, the LAYOUT is the index;
- sorted+INT96: the time filter must decode >99% — INT96 is written
  without usable min/max statistics, so the ENCODING alone defeats
  pruning that the seq filter (plain long) still gets on the same file;
- correctness closed-form: every variant returns exactly
  end_seq - start_seq + 1 rows; the time window equals its seq window.

Run:  python tools/stress_pushdown.py   (~3 min) → paste into SCALING.md.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402 — needs REPO on sys.path

UI_PORT = 4102
N = 10_000_000
N_FILES = 64
STRESS_DIR = os.path.join(REPO, ".stress")
BASE = dt.datetime(2026, 1, 1)


def fixture(spark, name: str, sorted_layout: bool, ts96: bool = False) -> str:
    """10M-row events table under <dir>/events.parquet (atomic build)."""
    from pyspark.sql import functions as F

    d = os.path.join(STRESS_DIR, name)
    path = os.path.join(d, "events.parquet")
    if os.path.exists(path):
        return d
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType",
        "INT96" if ts96 else "TIMESTAMP_MICROS",
    )
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    df = spark.range(N).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(int(BASE.timestamp())) + F.col("id")
        ).alias("ts"),
        (F.xxhash64("id") % 100_000).alias("user_id"),
        F.concat(F.lit("type_"), (F.col("id") % 7).cast("string")).alias(
            "event_type"
        ),
        ((F.xxhash64("id", F.lit(1)) % 10_000) / 100.0).alias("value"),
        F.concat(
            F.lit('{"k":'), (F.col("id") % 1000).cast("string"), F.lit("}")
        ).alias("props"),
    )
    if sorted_layout:
        df = df.repartitionByRange(N_FILES, "event_id").sortWithinPartitions(
            "event_id"
        )
    else:
        # full row-level scramble: order by a hash so every PAGE spans the
        # whole id domain. (A round-robin repartition is NOT enough: it
        # moves contiguous run chunks, and parquet's page-level column
        # index still pruned 74% of a chunky layout — measured.)
        df = df.orderBy(F.xxhash64("id"))
    df.write.mode("overwrite").parquet(tmp)
    os.makedirs(d, exist_ok=True)
    os.rename(tmp, path)
    return d


def main() -> None:
    from duckdb_nats_jetstream_spark.sources.message_scan import message_scan

    spark = _sparkui.build_session("stress-pushdown", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")

    sorted_dir = fixture(spark, "scanlog_sorted", True)
    shuffled_dir = fixture(spark, "scanlog_shuffled", False)
    int96_dir = fixture(spark, "scanlog_sorted_int96", True, ts96=True)

    # a mid-log ~1/64 slice; seq = event_id + 1, inclusive bounds
    lo_seq, hi_seq = 5_000_001, 5_156_250  # 156,250 rows = N / 64
    t_lo = BASE + dt.timedelta(seconds=lo_seq - 1)
    t_hi = BASE + dt.timedelta(seconds=hi_seq - 1)

    def run(sf_dir: str, **kw):
        from pyspark.sql import functions as F

        before = _sparkui.stage_ids(UI_PORT)
        t0 = time.time()
        # consume real columns: a bare count() plans an EMPTY projection
        # (row counts come from row-group metadata — observed 0.4 MB
        # inputBytes for the whole 10M-row table), which would make every
        # read_frac meaningless. Summing payload+subject lengths forces the
        # scan to read data pages for each surviving row group.
        row = (
            message_scan(spark, sf_dir, "events", **kw)
            .agg(
                F.count("*").alias("n"),
                F.sum(F.length("payload") + F.length("subject")).alias("s"),
            )
            .collect()[0]
        )
        assert row.s is not None
        wall = time.time() - t0
        return row.n, _sparkui.input_records(UI_PORT, before), wall

    run(sorted_dir)  # warmup (JVM + footer cache behavior identical after)

    out = {}
    n_full, r_full, w_full = run(sorted_dir)
    assert n_full == N and r_full >= N
    out["full_scan_decoded"] = r_full

    n_seq, r_seq, w_seq = run(sorted_dir, start_seq=lo_seq, end_seq=hi_seq)
    assert n_seq == hi_seq - lo_seq + 1, n_seq
    n_time, r_time, _ = run(sorted_dir, start_time=t_lo, end_time=t_hi)
    assert n_time == n_seq, (n_time, n_seq)  # same rows via either bound
    out["sorted"] = {
        "seq_decoded": r_seq,
        "seq_decode_frac": round(r_seq / r_full, 4),
        "time_decoded": r_time,
        "time_decode_frac": round(r_time / r_full, 4),
    }
    print(f"sorted: {out['sorted']} (full decoded {r_full})",
          file=sys.stderr)
    assert out["sorted"]["seq_decode_frac"] < 0.10, out
    assert out["sorted"]["time_decode_frac"] < 0.10, out

    n_sh, r_sh, _ = run(shuffled_dir, start_seq=lo_seq, end_seq=hi_seq)
    assert n_sh == n_seq, (n_sh, n_seq)  # same answer, different bill
    out["shuffled"] = {
        "seq_decoded": r_sh,
        "seq_decode_frac": round(r_sh / N, 4),
    }
    print(f"shuffled: {out['shuffled']}", file=sys.stderr)
    assert out["shuffled"]["seq_decode_frac"] > 0.99, out

    out["prune_ratio_sorted_vs_shuffled"] = round(r_sh / max(r_seq, 1), 1)

    # encoding control: same sorted layout, INT96 timestamps — the seq
    # filter (plain long column) still prunes, the time filter cannot
    n_96s, r_96s, _ = run(int96_dir, start_seq=lo_seq, end_seq=hi_seq)
    n_96t, r_96t, _ = run(int96_dir, start_time=t_lo, end_time=t_hi)
    assert n_96s == n_seq and n_96t == n_seq, (n_96s, n_96t, n_seq)
    out["sorted_int96"] = {
        "seq_decode_frac": round(r_96s / N, 4),
        "time_decode_frac": round(r_96t / N, 4),
    }
    print(f"sorted_int96: {out['sorted_int96']}", file=sys.stderr)
    assert out["sorted_int96"]["seq_decode_frac"] < 0.10, out
    assert out["sorted_int96"]["time_decode_frac"] > 0.99, out
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()

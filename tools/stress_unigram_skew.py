"""Unigram-surprisal frequency attach: window-on-token vs persisted
hash-agg + join-back under a Zipf-shaped (stopword) vocabulary
(r14 change #1 — the r13-verdict §2.5 skew claim, measured).

The r13 round attached the corpus token frequency with ``sum(c) OVER
(PARTITION BY token)``. A window has NO map-side partial reduction: every
(doc, token, c) row of a token must land in the ONE reducer task that owns
its window group. Token keys are Zipf-distributed in real corpora — a
stopword appears in nearly every document — so that group is ~|docs| rows
no matter the cluster size: the §2.5 straggler the r13 verdict flagged.
The r14 form (persisted dtc → vocab HASH aggregate with map-side combine →
join-back) reduces each map partition's tokens locally and never buffers a
per-token group.

Two corpora, one headline each:

- **zipf** (synthetic, the regime under test): every doc carries a few
  doc-unique tokens plus the stopword 'the' — the stopword's dtc group is
  |docs| rows in ONE window task while rare tokens spread evenly, so the
  window form's worst task is ~K× its median (K grows with the stopword's
  dtc share; at a real corpus's per-doc vocabulary the ratio is far
  larger). The join form stays flat on the same data.
- **fixture replica** (50× sf0.1 documents): the fixture vocabulary is 31
  NEAR-UNIFORM tokens, i.e. every token is equally "hot" and groups
  balance across the 32 reducers — both forms measure flat there, which
  is WHY the r13 local bench could not see the hazard it was shipping
  (and why this harness synthesizes the Zipf shape instead of replicating
  the fixture further). Re-run that variant with
  ``SPARK_GRAFT_UNIGRAM_CORPUS=fixture``.

Correctness asserted in-run: the two forms' (doc_id, n_tokens,
bits_total) rows are bit-identical (two-way exceptAll) before RESULT
prints.

Data lives under ``/root/repo/.stress/unizipf{N}/`` (gitignored, atomic
build). Run:  python tools/stress_unigram_skew.py  (~2-4 min) → RESULT
json for SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402 — needs REPO on sys.path

SRC_DIR = "/root/testdata/sf0.1"
CORPUS = os.environ.get("SPARK_GRAFT_UNIGRAM_CORPUS", "zipf")
#: zipf corpus size (docs) — 250k gives the stopword a 250k-row window
#: group vs a ~23k-row median reducer share (3 rare tokens/doc over 32
#: reducers): a ~10× single-task concentration, measurable yet quick
N_DOCS = int(os.environ.get("SPARK_GRAFT_UNIGRAM_DOCS", "250000"))
#: doc-unique (rare-tail) tokens per document
RARE_PER_DOC = 3
REPLICAS = int(os.environ.get("SPARK_GRAFT_UNIGRAM_REPLICAS", "50"))
N_FILES = 32  # parallel scan — a 1-task scan drowns the shuffle signal
UI_PORT = 4119  # unique per tools/README.md convention


def _build_zipf(out_dir: str) -> None:
    """N_DOCS synthetic documents: RARE_PER_DOC doc-unique tokens + the
    stopword 'the' repeated 3× (the repeat exercises the c>1 arm; dtc
    still collapses it to ONE row per doc, which is the point — the
    window group is |docs| rows regardless of the stopword's in-doc
    count). Written as N_FILES part files; atomic build."""
    import duckdb

    done = os.path.join(out_dir, "documents.parquet")
    if os.path.isdir(done) and len(os.listdir(done)) == N_FILES:
        return
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    tmp = out_dir + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(os.path.join(tmp, "documents.parquet"))
    con = duckdb.connect()
    per = N_DOCS // N_FILES
    rare = " || ' ' || ".join(
        f"'u' || CAST(doc_id AS VARCHAR) || '_{i}'"
        for i in range(RARE_PER_DOC)
    )
    for k in range(N_FILES):
        con.execute(
            f"""
            COPY (
              SELECT doc_id,
                     {rare} || ' the the the' AS text
              FROM (SELECT unnest(range({k * per}, {(k + 1) * per}))
                      AS doc_id)
              ORDER BY doc_id
            ) TO '{tmp}/documents.parquet/part-{k:05d}.parquet'
              (FORMAT parquet)
            """
        )
    os.rename(tmp, out_dir)
    print(f"built {out_dir}: {N_DOCS} zipf docs / {N_FILES} files",
          file=sys.stderr)


def _build_fixture_replica(out_dir: str) -> None:
    """REPLICAS× the sf0.1 fixture documents (doc_id offset per replica,
    text unchanged), one part file per replica so the scan parallelizes."""
    import duckdb

    done = os.path.join(out_dir, "documents.parquet")
    if os.path.isdir(done) and len(os.listdir(done)) == REPLICAS:
        return
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    tmp = out_dir + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(os.path.join(tmp, "documents.parquet"))
    con = duckdb.connect()
    for k in range(REPLICAS):
        con.execute(
            f"""
            COPY (
              SELECT d.doc_id + {k} * 10000000 AS doc_id, d.text
              FROM '{SRC_DIR}/documents.parquet' d
              ORDER BY doc_id
            ) TO '{tmp}/documents.parquet/part-{k:05d}.parquet'
              (FORMAT parquet)
            """
        )
    os.rename(tmp, out_dir)
    print(f"built {out_dir}: {REPLICAS}x fixture documents", file=sys.stderr)


def _measure(spark, build_df, label: str) -> dict:
    before = _sparkui.stage_ids(UI_PORT)
    t0 = time.perf_counter()
    build_df().write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    worst_med, worst_max = _sparkui.worst_task(UI_PORT, before)
    out = {
        "wall_s": round(wall, 2),
        "shuffle_mb": round(
            _sparkui.shuffle_write_bytes(UI_PORT, before) / 1e6, 1
        ),
        "task_med_s": round(worst_med, 2),
        "task_max_s": round(worst_max, 2),
        "straggler_x": round(worst_max / worst_med, 1) if worst_med else None,
    }
    print(f"{label}: {out}", file=sys.stderr)
    return out


def main() -> None:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from duckdb_nats_jetstream_spark.functions import text as TX
    from duckdb_nats_jetstream_spark.queries.pipeline5 import (
        _unigram_bit_scores,
    )

    if CORPUS == "zipf":
        out_dir = os.path.join(REPO, ".stress", f"unizipf{N_DOCS}")
        _build_zipf(out_dir)
        tag = f"zipf{N_DOCS}"
    else:
        out_dir = os.path.join(REPO, ".stress", f"unidocs{REPLICAS}")
        _build_fixture_replica(out_dir)
        tag = f"fixture{REPLICAS}x"

    spark = _sparkui.build_session("stress-unigram-skew", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")

    def tok():
        # plain reader: the corpus is a DIRECTORY of part files
        # (tables.read_table's pyarrow footer probe wants a flat file;
        # these corpora carry no ns-timestamp columns)
        return (
            spark.read.parquet(os.path.join(out_dir, "documents.parquet"))
            .select(
                "doc_id", F.explode(TX.tokens(F.col("text"))).alias("token")
            )
        )

    # warm-up: one full pass so both measured forms read hot page cache
    n_tok = tok().count()

    def window_form():
        # the r13 shape, inlined verbatim (it no longer exists in the
        # package): window-attached frequency + map-only total
        dtc = tok().groupBy("doc_id", "token").agg(F.count("*").alias("c"))
        n_attached = dtc.withColumn(
            "n", F.sum("c").over(W.partitionBy("token"))
        )
        total = tok().agg(F.count(F.lit(1)).alias("total"))
        bits = F.length(F.bin(F.expr("total div n"))) - 1
        return (
            n_attached.crossJoin(F.broadcast(total))
            .select("doc_id", "c", bits.cast("long").alias("bits"))
            .groupBy("doc_id")
            .agg(
                F.sum("c").cast("long").alias("n_tokens"),
                F.sum(F.col("c") * F.col("bits")).cast("long").alias(
                    "bits_total"
                ),
            )
        )

    def join_form():
        # the r14 shape — the REAL helper (persisted dtc, hash-agg vocab,
        # join-back, eager † lifecycle)
        return _unigram_bit_scores(tok())

    w = _measure(spark, window_form, f"window[{tag}]")
    j = _measure(spark, join_form, f"join[{tag}]")

    # correctness: a perf number for a wrong answer is worthless —
    # bit-parity of every (doc_id, n_tokens, bits_total) row, both ways
    a, b = window_form(), join_form()
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), (
        "window and join forms disagree"
    )

    print(
        "RESULT "
        + json.dumps(
            {
                "corpus": tag,
                "token_rows": n_tok,
                "window": w,
                "join": j,
                "parity": True,
            }
        )
    )


if __name__ == "__main__":
    main()

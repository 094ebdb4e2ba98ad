"""Two-decade scale sweep: sf0.1 → sf1.0 → sf10 (1× → 10× → 100×).

Every exponent in SCALING.md so far spans ONE decade (batch 29's full
sweep at the 10× replica). One decade cannot distinguish "truly flat /
linear" from "superlinear term still hiding under the per-job floor":
a k·N² term with small k can look sublinear at 10× and dominate at
100×. This harness measures ONE headline query per operator family at
all three scales and reports the per-decade exponents

    e1 = log10(wall_sf1 / wall_sf0.1)      (first decade)
    e2 = log10(wall_sf10 / wall_sf1)       (second decade)

Flags: ``e2 > 1.2`` (super-linear second decade) or ``e2 - e1 > 0.4``
(curvature — growth ACCELERATING with scale, the signature of a hidden
quadratic term even when both exponents are individually modest).

Replica (``.stress/sf10full/``): the same construction as
``stress_fullsweep.build_full_replica`` with 100 replicas — distinct
key ranges (+k·1e6 doc/vec ids, +k·1e7 event/user and TPC-H keys, so
PK/FK fan-out is preserved), per-replica text suffix (near-dup
structure scales instead of collapsing to exact copies), per-replica
embedding perturbation (ANN worst case: every vector gains 99 near
neighbors), events grow the user population over the SAME month.
region/nation stay 1×, as they would at 100 TB. ~1.7 GB on disk.

Skips (documented): ``dedup_winnow`` (uncapped oracle form, pinned to
the oracle fixture — SCALING batch 27); ``sim_knn_join`` (exact k-NN:
output pairs grow ~quadratically BY DEFINITION — batch 29 measured the
intrinsic growth; the ANN variants swept here are the scale path).

One session for all runs (batch-29 precedent: registry queries manage
their own persist→localCheckpoint→unpersist lifecycle); per-scale
byte+count warm-up; suspects get a warm re-measure on both sides of
the flagged decade so cold-start can't fake curvature.

Run:  python tools/stress_decades.py [--only a,b]   (~20-40 min)
      → writes .stress/DECADES.json, prints the SCALING.md table.
Port 4118 (tools/README.md convention).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402
from tools import stress_fullsweep as fs  # noqa: E402
from tools import stress_scale  # noqa: E402

SRC_DIR = stress_scale.SRC_DIR  # /root/testdata/sf0.1
SF1_DIR = fs.FULL_DIR  # .stress/sf1.0full
SF10_DIR = os.path.join(REPO, ".stress", "sf10full")
REPLICAS = 100
KEY_OFF = 10_000_000
UI_PORT = 4118
TIMEOUT_S = 900
OUT_JSON = os.path.join(REPO, ".stress", "DECADES.json")

#: one headline per family (SURVEY §2 north-star blocks + §2.B shapes)
HEADLINES = [
    "dedup_minhash_lsh",  # banded LSH dedup
    "dedup_components",  # connected components (O(log d) rounds)
    "docs_span_scrub",  # duplicated-span scrub (Lee et al.)
    "dedup_semantic",  # SRP-blocked SemDeDup
    "sim_srp_topk",  # SRP-LSH ANN
    "sim_ivf_topk",  # IVF ANN
    "sim_kmeans",  # distributed Lloyd iterations
    "text_bm25_topk",  # map-only retrieval
    "sim_hybrid_rrf3",  # 3-signal fusion (r11)
    "text_gopher_filters",  # map-only text quality
    "docs_quality_quantiles",  # exact distributed quantiles
    "docs_curation_v3",  # heaviest multi-stage capstone
    "docs_curation_v4",  # selection-layer capstone (r13: quota→budget→split)
    "text_quality_classifier",  # hashed-feature linear margin (r13, map-only)
    "docs_dsir_select",  # DSIR importance selection (r13: 2 hashed LMs + broadcast weights)
    "text_bigram_bits",  # held-out bigram-LM scoring (r13: co-keyed model joins)
    "docs_pack_sequences",  # sequence packing
    "scan_funnel",  # events funnel (skew-safe cascade)
    "rel_pricing_summary",  # TPC-H Q1 aggregation shape
    "rel_nation_revenue",  # TPC-H join shape (dims broadcast)
    "rel_hll_counts",  # sketch family
]


def build_decade_replica() -> None:
    import shutil

    import duckdb

    expected = [f for f in os.listdir(SRC_DIR) if f.endswith(".parquet")]
    if os.path.isdir(SF10_DIR) and all(
        os.path.exists(os.path.join(SF10_DIR, f)) for f in expected
    ):
        return
    if os.path.isdir(SF10_DIR):
        shutil.rmtree(SF10_DIR)
    tmp = SF10_DIR + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    con = duckdb.connect()
    rep = f"(SELECT unnest(range({REPLICAS})) AS k) r"
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + r.k * 1000000 AS doc_id,
                 d.text || ' r' || r.k AS text,
                 d.lang, d.source, d.n_chars + 3 + len(CAST(r.k AS VARCHAR)) - 1
                   AS n_chars
          FROM '{SRC_DIR}/documents.parquet' d, {rep}
          ORDER BY doc_id
        ) TO '{tmp}/documents.parquet' (FORMAT parquet)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + r.k * 1000000 AS vec_id,
                 list_transform(
                   e.embedding,
                   (x, i) -> CAST(CASE WHEN i = len(e.embedding)
                                       THEN x + r.k * 1e-3
                                       ELSE x END AS FLOAT)
                 ) AS embedding,
                 e.label
          FROM '{SRC_DIR}/embeddings.parquet' e, {rep}
          ORDER BY vec_id
        ) TO '{tmp}/embeddings.parquet' (FORMAT parquet)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.event_id + r.k * {KEY_OFF} AS event_id,
                 e.ts,
                 e.user_id + r.k * {KEY_OFF} AS user_id,
                 e.event_type, e.value, e.props
          FROM '{SRC_DIR}/events.parquet' e, {rep}
          ORDER BY event_id
        ) TO '{tmp}/events.parquet' (FORMAT parquet)
        """
    )
    for table, keys in fs._TPCH_REPLICATED.items():
        replaced = ", ".join(f"t.{k} + r.k * {KEY_OFF} AS {k}" for k in keys)
        con.execute(
            f"""
            COPY (
              SELECT t.* REPLACE ({replaced})
              FROM '{SRC_DIR}/{table}.parquet' t, {rep}
              ORDER BY {keys[0]}
            ) TO '{tmp}/{table}.parquet' (FORMAT parquet)
            """
        )
    for fname in expected:
        if not os.path.lexists(os.path.join(tmp, fname)):
            os.symlink(
                os.path.realpath(os.path.join(SRC_DIR, fname)),
                os.path.join(tmp, fname),
            )
    os.rename(tmp, SF10_DIR)
    print(f"built {SF10_DIR}: {REPLICAS}x replicas", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="", help="comma-separated subset")
    args = ap.parse_args()

    fs.build_full_replica()  # sf1.0full (reused 10× midpoint)
    build_decade_replica()

    from tools.plan_hash import _registry_fns

    fns = _registry_fns(REPO)
    names = [n for n in args.only.split(",") if n] or HEADLINES

    # borrow fullsweep's watchdogged runner on OUR port/timeout
    fs.UI_PORT = UI_PORT
    fs.TIMEOUT_S = TIMEOUT_S

    spark = _sparkui.build_session("stress-decades", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")
    from duckdb_nats_jetstream_spark.tables import read_table

    for d in (SRC_DIR, SF1_DIR, SF10_DIR):
        read_table(spark, d, "documents").count()  # footer+worker warm

    def _exp(a, b):
        if a.get("err") or b.get("err"):
            return None
        return round(
            math.log10(max(b["wall_s"], 0.05) / max(a["wall_s"], 0.05)), 2
        )

    def _min_run(name, sf_dir, prev=None):
        r = fs.run_one(spark, fns[name], name, sf_dir)
        if prev is not None and not prev["err"] and prev["wall_s"] < r["wall_s"]:
            return prev
        return r

    results: dict[str, dict] = {}
    for i, name in enumerate(names):
        # the session's FIRST execution of a plan pays codegen — at sf0.1
        # that cost rivals the query itself and fakes negative e1 /
        # positive curvature, so the 1× point is always best-of-2 (cheap)
        r0 = _min_run(name, SRC_DIR, fs.run_one(spark, fns[name], name, SRC_DIR))
        r1 = fs.run_one(spark, fns[name], name, SF1_DIR)
        r2 = fs.run_one(spark, fns[name], name, SF10_DIR)
        e1, e2 = _exp(r0, r1), _exp(r1, r2)
        if e2 is not None and (e2 > 0.8 or (e1 is not None and e2 - e1 > 0.3)):
            # suspect: warm re-measure of ALL THREE points, keep the mins —
            # only genuine growth may cross the flags
            r0 = _min_run(name, SRC_DIR, r0)
            r1 = _min_run(name, SF1_DIR, r1)
            r2 = _min_run(name, SF10_DIR, r2)
            e1, e2 = _exp(r0, r1), _exp(r1, r2)
        curved = (
            e1 is not None and e2 is not None and (e2 > 1.2 or e2 - e1 > 0.4)
        )
        results[name] = {
            "sf0.1": r0,
            "sf1.0": r1,
            "sf10": r2,
            "e1": e1,
            "e2": e2,
            "flag": curved,
        }
        err = r0.get("err") or r1.get("err") or r2.get("err")
        print(
            f"[{i + 1}/{len(names)}] {name}: {r0['wall_s']}s -> {r1['wall_s']}s"
            f" -> {r2['wall_s']}s e1={e1} e2={e2}"
            f"{' ERR ' + str(err) if err else ''}{' <<<' if curved else ''}",
            file=sys.stderr,
        )

    os.makedirs(os.path.dirname(OUT_JSON), exist_ok=True)
    with open(OUT_JSON, "w", encoding="utf-8") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
        fh.write("\n")

    flagged = [n for n, r in results.items() if r.get("flag")]
    print(
        "RESULT "
        + json.dumps(
            {
                "swept": len(results),
                "flagged": flagged,
                "max_e2": max(
                    (r["e2"] for r in results.values() if r["e2"] is not None),
                    default=None,
                ),
            }
        )
    )
    print("\n| query | sf0.1 | sf1.0 | sf10 | e1 | e2 | shuffle MB @sf10 |")
    print("|---|---|---|---|---|---|---|")
    for n, r in results.items():
        print(
            f"| {n} | {r['sf0.1']['wall_s']} s | {r['sf1.0']['wall_s']} s "
            f"| {r['sf10']['wall_s']} s | {r['e1']} | {r['e2']} "
            f"| {r['sf10']['shuffle_write_mb']} |"
        )


if __name__ == "__main__":
    main()

"""Simulate the round driver's correctness gate as closely as possible:
a PLAIN default SparkSession (no tuned configs — catches timezone /
shuffle-partition / memory assumptions that the pytest fixture's tuned
session would mask), sf0.01 tables, the first ``N`` registry entries in
insertion order, each compared to its DuckDB oracle with the exact-value
harness from ``tests/oracle_harness``.

Run before round end: every query shown here is one the driver WILL
check; a failure here is a red CORRECTNESS row next round.

    python tools/driver_sim.py [N=50 | all | name ...]

Passing explicit query names (r13 optimization round) checks just those
entries — the per-edit oracle gate while optimizing; PARITY_EVIDENCE is
only written by a full ``all`` run.

``all`` runs the FULL registry; if every oracle-backed query is green it
writes ``PARITY_EVIDENCE.json`` — a committed artifact tying the run to
the exact package tree (``package_tree_fingerprint``) so plan-hash
clearings of materialization-gated edits carry mechanical independent
evidence instead of prose (r08 ADVICE; see ``tools/registry_status.py``
``--plan-check`` stamping).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else "50"
    explicit_names: list[str] | None = None
    if arg == "all" or arg.isdigit():
        # r13 ADVICE: `driver_sim.py 50 docs_boilerplate` used to silently
        # ignore the trailing names, making a user believe specific queries
        # were checked — reject the mixed form loudly instead.
        if len(sys.argv) > 2:
            raise SystemExit(
                f"driver_sim: a numeric/'all' first argument takes no "
                f"further arguments (got {sys.argv[2:]}) — pass EITHER a "
                f"prefix size OR explicit query names"
            )
        n = 10**9 if arg == "all" else int(arg)
    else:
        explicit_names = sys.argv[1:]
        n = len(explicit_names)

    # Fingerprint the package tree BEFORE the (long) run: evidence must
    # vouch for the tree the queries actually executed against, and an
    # edit made mid-run would otherwise be stamped as tested (r09 review).
    from tools.registry_status import package_tree_fingerprint

    tree_fp_before = package_tree_fingerprint()

    from pyspark.sql import SparkSession

    from duckdb_nats_jetstream_spark.queries import full_registry
    from tests.oracle_harness import compare, duckdb_conn

    spark = SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    ).getOrCreate()  # deliberately untuned — driver conditions
    spark.sparkContext.setLogLevel("ERROR")

    registry = full_registry()
    con = duckdb_conn(SF_DIR)
    if explicit_names is not None:
        unknown = [q for q in explicit_names if q not in registry]
        if unknown:
            print(f"unknown queries: {unknown}")
            sys.exit(2)
        names = explicit_names
    else:
        names = list(registry)[:n]
    failures = 0
    for i, name in enumerate(names):
        fn, sql = registry[name]
        t0 = time.perf_counter()
        try:
            df = fn(spark, SF_DIR)
            if sql is None:
                cnt = df.count()
                print(f"{i+1:3d} {name}: rows-only ({cnt} rows) "
                      f"[{time.perf_counter()-t0:.1f}s]")
                continue
            problems = compare(df, con, sql, name)
        except Exception:
            print(f"{i+1:3d} {name}: ERROR\n{traceback.format_exc()}")
            failures += 1
            continue
        status = "ok" if not problems else "FAIL " + "; ".join(problems)
        failures += bool(problems)
        print(f"{i+1:3d} {name}: {status} [{time.perf_counter()-t0:.1f}s]")
    print(f"\n{len(names) - failures}/{len(names)} green under driver conditions")
    if len(names) == len(registry) and failures == 0:
        import json

        if package_tree_fingerprint() != tree_fp_before:
            print(
                "package tree CHANGED during the run — refusing to write "
                "PARITY_EVIDENCE.json (the green run tested the old tree); "
                "re-run on a quiescent tree"
            )
            sys.exit(1)
        evidence = {
            "all_green": True,
            "n_queries": len(names),
            "sf_dir": SF_DIR,
            "tree_fingerprint": tree_fp_before,
        }
        with open(os.path.join(REPO, "PARITY_EVIDENCE.json"), "w",
                  encoding="utf-8") as fh:
            json.dump(evidence, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print("wrote PARITY_EVIDENCE.json (full registry green on this tree)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

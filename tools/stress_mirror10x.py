"""DuckDB-mirror walls at the 10× replica (≈ sf1) for the heavy dedup
family — the missing column of PERF.md's r08 sf1 spot-bench table.

The sf0.1 bench already shows the Spark dedup family 15–34× ahead of its
DuckDB oracle mirrors; this harness asks whether that gap HOLDS at 10×
the data on the same single node, completing the goal statement's
"matches-or-beats single-node throughput at the same data scale" with a
measured sf1 datapoint. Each mirror runs the EXACT oracle SQL from the
registry (the correctness-gate SQL, not a hand-tuned variant) in its own
subprocess with a hard wall-clock cap — a mirror that cannot finish
inside the cap is itself the datapoint.

Run AFTER tools/stress_scale.py has built ``.stress/sf1.0``:

    python tools/stress_mirror10x.py   (~10-40 min) → paste into PERF.md
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STRESS_DIR = os.environ.get(
    "SPARK_GRAFT_MIRROR_DIR", os.path.join(REPO, ".stress", "sf1.0")
)
TIMEOUT_S = int(os.environ.get("SPARK_GRAFT_MIRROR_TIMEOUT", "900"))
NAMES = os.environ.get(
    "SPARK_GRAFT_MIRROR_QUERIES",
    "dedup_prune,dedup_components,dedup_graph_triangles,dedup_minhash_lsh,"
    "docs_leakage_safe_split,docs_span_scrub",
).split(",")

_CHILD = """
import json, sys, time
import duckdb
sql = sys.stdin.read()
con = duckdb.connect()
con.execute("SET threads TO 32")
con.execute("SET enable_progress_bar = false")
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '%s/{t}.parquet'" % sys.argv[1]
    )
t0 = time.time()
n = len(con.execute(sql).fetchall())
print(json.dumps({"wall_s": round(time.time() - t0, 1), "rows": n}))
"""


def main() -> None:
    if not os.path.isdir(STRESS_DIR):
        sys.exit("build the replica first: python tools/stress_scale.py")
    from duckdb_nats_jetstream_spark.queries import full_registry

    registry = full_registry()
    out = []
    for name in NAMES:
        _fn, sql = registry[name]
        if sql is None:
            out.append({"query": name, "error": "rows-only (no oracle)"})
            continue
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _CHILD, STRESS_DIR],
                input=sql,
                capture_output=True,
                text=True,
                timeout=TIMEOUT_S,
            )
            r = {"error": proc.stderr.strip()[-200:] or "no output"}
            if proc.returncode == 0:
                # belt and braces vs duckdb's progress bar (disabled in
                # the child, but \r-interleaved output burned one run):
                # the child's JSON is the LAST {...} in stdout
                import re as _re

                hits = _re.findall(r"\{[^{}]*\}", proc.stdout)
                if hits:
                    r = json.loads(hits[-1])
        except subprocess.TimeoutExpired:
            r = {"wall_s": f">{TIMEOUT_S}", "timeout": True}
        r["query"] = name
        out.append(r)
        print(f"{name}: {r} [{round(time.time() - t0, 1)}s incl. startup]",
              file=sys.stderr)
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()

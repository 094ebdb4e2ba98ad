"""Optimized-plan hasher for the rotation ledger (r07 verdict ask #3 /
docs/R08_PLAN.md item 2).

Builds each named registry query against a fixed SF dir and emits a
JSON map ``name -> {"hash", "clearable", ...}`` where:

- ``hash`` is sha256 over the query's **optimized logical plan** string
  with exprIds renumbered in first-appearance order (``#12`` -> ``#e0``;
  raw exprIds are session-global counters and differ run to run), plus
  the sorted leaf-scan file list (logical plan strings don't render the
  parquet location, so two same-shaped scans of different tables would
  otherwise collide).
- ``clearable`` says whether plan-hash equality is SOUND evidence that
  an edit cannot have changed the query's results:
  * plans containing Python-eval nodes (pandas UDFs, mapInPandas,
    Python data sources, UDTFs) are NOT clearable — the plan string
    names the function but not its body, so a body edit is invisible;
  * plans truncated by materialization (``LogicalRDD`` /
    ``ExistingRDD``) are NOT clearable — the leaf hides the upstream
    plan entirely. To keep checkpoint-heavy operators hashable, the
    build runs with ``DataFrame.localCheckpoint``/``checkpoint``
    patched to identity: checkpointing never changes VALUES, so the
    un-truncated logical plan is the honest behavior fingerprint (and
    the build skips executing the checkpoint jobs). Only genuine
    RDD-backed inputs still hit the marker.

Scheme changes (anything that alters what a hash covers) bump
``PLAN_HASH_SCHEME``; the ledger drops stored baselines recorded under
a different scheme automatically.

Known instability (safe direction): ``RewriteDistinctAggregates`` orders
its Expand/gid groups by hash-set iteration, which is NONDETERMINISTIC
per session for aggregates with ≥2 distinct children (observed on
``profile_events``: gid 1↔3 swapped between two builds, semantically
identical plans). A flap can only fail to match the baseline — so the
affected query falls back to an honest driver re-queue, never a wrong
clear. Left un-normalized deliberately: structural gid canonicalization
would add real complexity to shave an occasional wasted prefix slot.

Run as a SUBPROCESS (one SparkSession per snapshot; plan building
executes any eager localCheckpoint inside query builders, so this
touches data — keep the SF dir small):

    python tools/plan_hash.py --out /tmp/hashes.json [--sf DIR] \
        [--names name1,name2,...]          # default: all registry names

``tools/registry_status.py --plan-check`` drives this; determinism
across processes is pinned by ``tests/test_plan_hash.py``.
"""

from __future__ import annotations

import argparse
import hashlib
import importlib
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: bump when the hash domain changes (stored baselines become incomparable)
#: 1: raw build (checkpoint-truncated plans hash the LogicalRDD leaf)
#: 2: localCheckpoint/checkpoint patched to identity during the build
#:    (defective: patched only the abstract base; classic DataFrame
#:    overrides both methods, so plans stayed truncated)
#: 3: the patch covers every concrete DataFrame class
PLAN_HASH_SCHEME = 3

#: default snapshot data — plan SHAPE only matters, so the smallest SF
DEFAULT_SF = "/root/testdata/sf0.001"

_PY_MARKERS = ("python", "pandas", "udtf")
_RDD_MARKERS = ("LogicalRDD", "ExistingRDD")


def normalized_plan(df) -> str:
    """Optimized-plan string with exprIds renumbered in first-appearance
    order — deterministic across sessions for equal plans (verified:
    identical hash from cold and counter-shifted sessions)."""
    s = df._jdf.queryExecution().optimizedPlan().toString()
    ids: dict[str, str] = {}

    def sub(m: re.Match) -> str:
        k = m.group(1)
        if k not in ids:
            ids[k] = f"#e{len(ids)}"
        return ids[k]

    return re.sub(r"#(\d+)", sub, s)


def plan_hash(df) -> dict:
    """hash + clearability for one built DataFrame (see module doc)."""
    plan = normalized_plan(df)
    rdd_free = not any(m in plan for m in _RDD_MARKERS)
    try:
        files = sorted(df.inputFiles())
    except Exception:
        files = []
        rdd_free = False  # can't pin scan locations — not sound evidence
    try:
        j = df._jdf.queryExecution().optimizedPlan().toJSON().lower()
        python_free = not any(m in j for m in _PY_MARKERS)
    except Exception:
        python_free = False
    h = hashlib.sha256()
    h.update(plan.encode())
    h.update(b"\0")
    h.update("\n".join(files).encode())
    return {
        "hash": h.hexdigest(),
        "clearable": rdd_free and python_free,
        "python_free": python_free,
        "rdd_free": rdd_free,
    }


def _identity_checkpoints():
    """Context manager: DataFrame.localCheckpoint/checkpoint -> identity.
    Checkpointing is value-neutral (it only truncates lineage), so for
    plan HASHING the un-truncated plan is both more honest (nothing
    hides behind a LogicalRDD leaf) and cheaper (no jobs run)."""
    from contextlib import contextmanager

    from pyspark.sql import DataFrame

    # PySpark 4 splits DataFrame into an abstract base and per-backend
    # concrete classes, each defining its OWN localCheckpoint — patching
    # only the base silently does nothing (scheme-2 defect). Patch every
    # class that defines the methods.
    classes = [DataFrame]
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _ClassicDF

        classes.append(_ClassicDF)
    except ImportError:
        pass

    @contextmanager
    def _cm():
        saved = [
            (c, c.__dict__.get("localCheckpoint"), c.__dict__.get("checkpoint"))
            for c in classes
        ]
        for c in classes:
            c.localCheckpoint = (
                lambda self, eager=True, storageLevel=None: self
            )
            c.checkpoint = lambda self, eager=True: self
        try:
            yield
        finally:
            for c, lc, cp in saved:
                for name, fn in (("localCheckpoint", lc), ("checkpoint", cp)):
                    if fn is None:
                        # the class inherited it before — remove our shim
                        if name in c.__dict__:
                            delattr(c, name)
                    else:
                        setattr(c, name, fn)

    return _cm()


def _registry_fns(repo: str):
    """name -> builder fn, WITHOUT resolving oracle SQL (some oracle
    builders train DuckDB models; plans don't need them)."""
    sys.path.insert(0, repo)
    qdir = os.path.join(repo, "duckdb_nats_jetstream_spark", "queries")
    fns = {}
    for fname in sorted(os.listdir(qdir)):
        if not fname.endswith(".py") or fname == "__init__.py":
            continue
        mod = importlib.import_module(
            f"duckdb_nats_jetstream_spark.queries.{fname[:-3]}"
        )
        for name, (fn, _sql) in getattr(mod, "QUERIES", {}).items():
            fns[name] = fn
    return fns


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_PLANHASH_SF", DEFAULT_SF))
    ap.add_argument("--names", default="")
    ap.add_argument("--repo", default=REPO)
    args = ap.parse_args()

    fns = _registry_fns(args.repo)
    names = [n for n in args.names.split(",") if n] or list(fns)

    from duckdb_nats_jetstream_spark.session import get_spark

    spark = get_spark("plan-hash")
    out: dict[str, dict] = {}
    try:
        for name in names:
            if name not in fns:
                out[name] = {"error": "unknown query"}
                continue
            try:
                with _identity_checkpoints():
                    out[name] = plan_hash(fns[name](spark, args.sf))
            except Exception as exc:  # noqa: BLE001 — per-query isolation
                out[name] = {"error": f"{type(exc).__name__}: {exc}"}
    finally:
        spark.stop()
    with open(args.out, "w", encoding="utf-8") as fh:
        json.dump(
            {"sf_dir": args.sf, "scheme": PLAN_HASH_SCHEME, "hashes": out},
            fh, indent=1, sort_keys=True,
        )
        fh.write("\n")
    errs = [n for n, v in out.items() if "error" in v]
    print(f"hashed {len(out) - len(errs)}/{len(out)} queries", file=sys.stderr)
    for n in errs:
        print(f"  ERROR {n}: {out[n]['error']}", file=sys.stderr)


if __name__ == "__main__":
    main()

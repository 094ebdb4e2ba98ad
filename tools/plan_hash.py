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

Known residual risks (documented, accepted — r08 review):

- the exprId regex ``#(\\d+)`` cannot distinguish an exprId from a
  string literal that happens to contain ``...#<digits>`` (catalyst
  renders string literals unquoted), so an edit changing ONLY such a
  literal in a dependency-module constant could normalize identically.
  Requires the literal to sit at the same first-appearance position and
  to be the edit's only effect — and the own-segment guard already
  limits clearing to dependency-module edits. Narrow enough to accept.
- identity-checkpointing means the hash covers the LOGICAL plan, not
  materialization state: an edit whose behavior is gated on real
  materialization (e.g. code branching on ``inputFiles()`` emptiness,
  like the r08 ``tables.spread`` fix itself) is invisible to the hash.
  Clearing such plumbing edits needs independent evidence — recorded
  MECHANICALLY since r09 (r08 ADVICE): ``tools/driver_sim.py all``
  writes ``PARITY_EVIDENCE.json`` (full oracle run, all green, tied to
  a package-tree fingerprint), and ``--plan-check`` stamps each
  clearing whose tree matches with a ``parity`` field — clearings
  resting on plan hashes alone are printed per-name at check time.

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
#: 4: maxToStringFields raised so wide Project/Aggregate tails are in
#:    the hash (scheme 3 hashed "... N more fields" elisions)
#: 5: lambda-variable name suffixes normalized (pyspark's session-global
#:    fresh-name counter made every higher-order-function plan hash
#:    session-position-dependent — 40 spurious mismatches in the first
#:    scheme-4 batch run)
PLAN_HASH_SCHEME = 5

#: default snapshot data — plan SHAPE only matters, so the smallest SF
DEFAULT_SF = "/root/testdata/sf0.001"

_PY_MARKERS = ("python", "pandas", "udtf")
_RDD_MARKERS = ("LogicalRDD", "ExistingRDD")


def normalized_plan(df) -> str:
    """Optimized-plan string with session-counter artifacts normalized —
    deterministic across sessions for equal plans (verified: identical
    hash from cold and counter-shifted sessions):

    - exprIds (``#123``) renumbered in first-appearance order;
    - lambda-variable NAME suffixes stripped: pyspark names higher-order
      -function variables ``<param>_<n>`` with a session-global counter
      (``lambda x_1#e8`` in a cold session is ``lambda x_32#e8`` after 31
      other lambdas), and every occurrence renders with the ``lambda ``
      prefix, so the suffix can be dropped exactly there — the
      (renumbered) exprId still uniquely identifies the variable, and
      real columns with numeric suffixes (``sig_0`` …) never carry the
      prefix and are untouched.
    """
    s = df._jdf.queryExecution().optimizedPlan().toString()
    ids: dict[str, str] = {}

    def sub(m: re.Match) -> str:
        k = m.group(1)
        if k not in ids:
            ids[k] = f"#e{len(ids)}"
        return ids[k]

    s = re.sub(r"#(\d+)", sub, s)
    return re.sub(r"(?<=lambda )(\w+?)_\d+(?=#)", r"\1_v", s)


def plan_hash(df) -> dict:
    """hash + clearability for one built DataFrame (see module doc).

    ``reasons`` names each distinct cause of unclearability — the flags
    alone misdirected debugging (``rdd_free=False`` used to cover four
    unrelated causes, sending the operator hunting for a LogicalRDD that
    wasn't there — r09 review)."""
    plan = normalized_plan(df)
    reasons: list[str] = []
    if any(m in plan for m in _RDD_MARKERS):
        reasons.append("rdd_leaf")  # materialized leaf hides the plan
    if "more fields" in plan:
        # toString truncates expression lists at
        # spark.sql.debug.maxToStringFields — a truncated tail is outside
        # the hash, so equality would be unsound (r08 review). main()
        # raises the conf; this guard catches any other session.
        reasons.append("tostring_truncated")
    try:
        files = sorted(df.inputFiles())
    except Exception:
        files = []
        reasons.append("input_files_failed")  # can't pin scan locations
    if not files and "input_files_failed" not in reasons:
        # all-LocalRelation plans render only output ATTRIBUTES, not the
        # embedded data, so an edit changing createDataFrame contents
        # would hash identically; with no scan locations to pin either,
        # equality is not sound evidence (r08 ADVICE).
        reasons.append("no_scan_files")
    try:
        j = df._jdf.queryExecution().optimizedPlan().toJSON().lower()
        python_free = not any(m in j for m in _PY_MARKERS)
    except Exception:
        python_free = False
    if not python_free:
        reasons.append("python_eval_node")
    rdd_free = not any(
        r in reasons
        for r in ("rdd_leaf", "tostring_truncated", "input_files_failed",
                  "no_scan_files")
    )
    h = hashlib.sha256()
    h.update(plan.encode())
    h.update(b"\0")
    h.update("\n".join(files).encode())
    return {
        "hash": h.hexdigest(),
        "clearable": not reasons,
        "python_free": python_free,
        "rdd_free": rdd_free,
        "reasons": reasons,
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
            # mirror full_registry's duplicate guard: silently letting the
            # alphabetically-last module win could hash the WRONG
            # function's plan into a baseline (r09 review)
            assert name not in fns, f"duplicate query name: {name}"
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
    # plan strings must be complete: the default maxToStringFields=25
    # elides wide Project/Aggregate tails as "... N more fields", which
    # would put real expressions outside the hash (plan_hash() also
    # refuses to clear any plan that still shows the marker)
    spark.conf.set("spark.sql.debug.maxToStringFields", "1000000")
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

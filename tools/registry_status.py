"""Derive per-query driver-verification status → ``REGISTRY_STATUS.json``.

The per-round driver checks only a bounded prefix (~50 entries) of the
query registry, so "which queries actually have a green driver row, and has
their implementation changed since?" is the round-over-round rotation
ledger. This tool makes that ledger mechanical instead of judge
archaeology (r03 verdict ask #3):

- ``last_green_round``: the latest ``CORRECTNESS_r{N}.json`` in which the
  query has a fully green row (rows/schema/hash all True).
- ``checked_rounds``: every round that produced any row (green, red, err,
  or no_oracle) for the query.
- ``fingerprint_at_last_green``: sha256 of the query function's source
  segment **at that round's code commit** (the parent of the driver's
  ``round N: verdict/...`` commit), extracted by AST so the hash is
  byte-stable regardless of import machinery. ``None`` when the function
  didn't exist at that ref under its current module/name.

``tests/test_registry_freshness.py`` compares these fingerprints against
the working tree: a query that was never green, or whose source changed
since its last green row, must sit inside the driver prefix (or carry an
explicit acknowledged-deferral reason). Heuristic scope: the fingerprint
covers the query function's own source, not helpers it calls nor its
oracle SQL literal — coarse enough to be stable, fine enough that editing
a query re-queues it for verification.

Run at round start, right after the driver lands ``CORRECTNESS_r{N}.json``
and before making code changes:  ``python tools/registry_status.py``.
"""

from __future__ import annotations

import ast
import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: round -> git ref of the CODE the driver verified that round (the parent
#: of the driver's own "round N: verdict/..." bookkeeping commit). Append
#: one line per round.
ROUND_CODE_REFS: dict[int, str] = {
    1: "54117e5^",
    2: "03338e3^",
    3: "8dde30a^",
    4: "b02af6b^",
    5: "64d3d88^",
}


def _module_relpath(module: str) -> str:
    return module.replace(".", "/") + ".py"


def _source_at(ref: str | None, relpath: str) -> str | None:
    """Module source at a git ref (None → working tree)."""
    if ref is None:
        path = os.path.join(REPO, relpath)
        try:
            with open(path, encoding="utf-8") as fh:
                return fh.read()
        except OSError:
            return None
    proc = subprocess.run(
        ["git", "show", f"{ref}:{relpath}"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    return proc.stdout if proc.returncode == 0 else None


def _fn_fingerprint(module_src: str | None, fn_name: str) -> str | None:
    """sha256 of the top-level ``def fn_name`` source segment."""
    if module_src is None:
        return None
    try:
        tree = ast.parse(module_src)
    except SyntaxError:
        return None
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == fn_name:
            seg = ast.get_source_segment(module_src, node)
            if seg is not None:
                return hashlib.sha256(seg.encode()).hexdigest()
    return None


def _green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
    )


def build_status() -> dict:
    sys.path.insert(0, REPO)
    from duckdb_nats_jetstream_spark.queries import full_registry

    registry = full_registry()
    names = list(registry)

    rounds: dict[int, dict] = {}
    for n in sorted(ROUND_CODE_REFS):
        path = os.path.join(REPO, f"CORRECTNESS_r{n:02d}.json")
        if os.path.exists(path):
            with open(path, encoding="utf-8") as fh:
                rounds[n] = json.load(fh)

    module_src_cache: dict[tuple[str | None, str], str | None] = {}

    def src(ref: str | None, relpath: str) -> str | None:
        key = (ref, relpath)
        if key not in module_src_cache:
            module_src_cache[key] = _source_at(ref, relpath)
        return module_src_cache[key]

    status: dict[str, dict] = {}
    for pos, name in enumerate(names):
        fn, sql = registry[name]
        relpath = _module_relpath(fn.__module__)
        checked = [n for n, rows in rounds.items() if name in rows]
        green = [n for n in checked if _green(rounds[n][name])]
        last_green = max(green) if green else None
        fp_then = (
            _fn_fingerprint(
                src(ROUND_CODE_REFS[last_green], relpath), fn.__qualname__
            )
            if last_green is not None
            else None
        )
        status[name] = {
            "position": pos,
            "module": relpath,
            "function": fn.__qualname__,
            "oracle": sql is not None,
            "checked_rounds": checked,
            "last_green_round": last_green,
            "fingerprint_at_last_green": fp_then,
        }
    return status


def recommend_prefix(
    status: dict,
    budget: int = 50,
    ack_deferred: frozenset[str] | set[str] = frozenset(),
) -> list[str]:
    """Derive the driver-prefix ORDER from the ledger (r05 verdict ask #3).

    Policy (the rotation discipline the prefixes were hand-curated to,
    now mechanical so a transcription slip can't burn driver slots):

    1. **Re-queue first**: oracle-backed queries that were never green, or
       whose working-tree fingerprint differs from the one at their last
       green row (their code changed → the old green no longer vouches for
       them). Ordered by ledger position. Names in ``ack_deferred`` are
       demoted to bucket 2 (an explicit, cited deferral).
    2. **Oldest-green-first rotation**: remaining oracle-backed queries by
       (last_green_round, ledger position).

    Rows-only queries never appear (a "no_oracle" row wastes the slot).
    Uses WORKING-TREE fingerprints, so the recommendation — and the
    freshness test comparing the registry against it — shifts the moment a
    verified query's source is edited.
    """
    # one read + one ast.parse per MODULE (not per query): ~10 modules
    # carry ~180 query functions, and this also runs on every pytest
    # invocation via test_prefix_matches_recommendation
    fp_cache: dict[str, dict[str, str]] = {}

    def current_fp(module: str, fn: str) -> str | None:
        if module not in fp_cache:
            src = _source_at(None, module)
            fps: dict[str, str] = {}
            if src is not None:
                try:
                    tree = ast.parse(src)
                except SyntaxError:
                    tree = None
                for node in tree.body if tree else ():
                    if isinstance(node, ast.FunctionDef):
                        seg = ast.get_source_segment(src, node)
                        if seg is not None:
                            fps[node.name] = hashlib.sha256(
                                seg.encode()
                            ).hexdigest()
            fp_cache[module] = fps
        return fp_cache[module].get(fn)

    stale, rotate = [], []
    for name, s in status.items():
        if not s["oracle"]:
            continue
        never_green = s["last_green_round"] is None
        edited = not never_green and s[
            "fingerprint_at_last_green"
        ] != current_fp(s["module"], s["function"])
        if (never_green or edited) and name not in ack_deferred:
            stale.append((s["position"], name))
        else:
            rotate.append((s["last_green_round"] or 0, s["position"], name))
    ordered = [n for _, n in sorted(stale)]
    ordered += [n for _, _, n in sorted(rotate)]
    return ordered[:budget]


def main() -> None:
    status = build_status()
    out = os.path.join(REPO, "REGISTRY_STATUS.json")
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(status, fh, indent=1, sort_keys=True)
        fh.write("\n")
    never = [n for n, s in status.items() if s["last_green_round"] is None]
    print(f"{len(status)} queries; never-green: {len(never)}")
    for n in never:
        print("  never-green:", n, "(rows-only)" if not status[n]["oracle"] else "")
    print("\nrecommended driver prefix (paste into queries/__init__.py):")
    for n in recommend_prefix(status):
        print(f'    "{n}",')


if __name__ == "__main__":
    main()

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
- ``fingerprint_at_last_green``: sha256 over the query function's source
  segment **plus the sources of the package modules it depends on**, all
  **at that round's code commit** (the parent of the driver's
  ``round N: verdict/...`` commit), extracted by AST so the hash is
  byte-stable regardless of import machinery. ``None`` when the function
  didn't exist at that ref under its current module/name.

``tests/test_registry_freshness.py`` compares these fingerprints against
the working tree: a query that was never green, or whose fingerprint
changed since its last green row, must sit inside the driver prefix (or
carry an explicit acknowledged-deferral reason).

Dependency scope (round 6 — closing the gap the r05 funnel episode
exposed, where ``operators/funnel.py`` changed under two driver-green
queries without tripping the fn-source-only fingerprint): the
fingerprint covers (a) the query function's own source segment, and
(b) a SEMANTIC hash (docstring-stripped AST dump) of every
``duckdb_nats_jetstream_spark.*`` module reachable from the names the
function actually uses — resolved per-FUNCTION (not per-module, which
would re-queue all ~40 queries of a pipeline module on any operator
edit), then closed transitively over those modules' package imports.
Dependencies hash semantically so a comment/docstring edit to a
widely-imported module doesn't re-queue half the registry; the query
fn's own segment stays raw-source-hashed (editing the query re-queues
it, as before). Same-module helper functions the query calls contribute
their DEPENDENCIES but not their own source (helpers live in query
modules and churn with registration housekeeping; the operators they
route to are the behavior surface worth re-verifying). Same-module
TOP-LEVEL CONSTANTS the query (or its helpers) reference contribute
their raw source segments (r09 review: a constant IS behavior — editing
_GOPHER's thresholds must re-queue the gopher query — and unlike a
helper there is no operator module behind it to hash instead).
Oracle SQL literals remain out of scope — an oracle edit shows up as a
driver hash mismatch directly.

Run at round start, right after the driver lands ``CORRECTNESS_r{N}.json``
and before making code changes:  ``python tools/registry_status.py``.
"""

from __future__ import annotations

import ast
import hashlib
import json
import os
import re
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
    6: "28545f1^",
    7: "3351f68^",
    8: "49b7369^",
    9: "972bd7f^",
    10: "866ec97^",
    11: "4ae1364^",
    12: "67128b5^",
    13: "63eb9e4^",
}


#: name -> reason. Stale-but-deferred queries someone consciously pushed
#: past the driver prefix. Canonical here (r09 review: it used to live
#: only in tests/test_registry_freshness.py, so the tool's printed prefix
#: and the test's derivation diverged the moment a deferral existed —
#: the exact transcription trap the tool exists to prevent). The test
#: imports this table and enforces that every entry is cited in the
#: round's VERDICT.md/ADVICE.md. Keep SHORT — every entry is rotation
#: debt the next round's prefix must pay down. r06→r09: EMPTY.
ACK_DEFERRED: dict[str, str] = {}


def _module_relpath(module: str) -> str:
    return module.replace(".", "/") + ".py"


#: machine-generated driver-prefix block in queries/__init__.py — see
#: _normalize_for_fingerprint.
_PREFIX_BLOCK_RE = re.compile(rb"_PREFIX_R\d+\s*=\s*\[[^\]]*\]")


def _normalize_for_fingerprint(relpath: str, data: bytes) -> bytes:
    """Canonicalize ``queries/__init__.py`` before hashing: the round-close
    workflow is necessarily *oracle run → plan-check → paste the derived
    prefix*, so the prefix block (and its ``#:`` allocation ledger
    comments) always changes AFTER the last oracle run — under a byte
    fingerprint the parity artifact could never vouch for a committed
    tree (the r11 guard test caught exactly this on its first round).
    Excluding them is sound: the prefix affects only driver slot ORDER
    (`driver_sim all` runs the full registry order-insensitively, and
    prefix==derivation is enforced by test_prefix_matches_recommendation),
    and ``#:`` lines are comments. Everything semantic in the module —
    imports, _resolve_oracle, _ROWS_ONLY_LAST, full_registry — still
    hashes byte-for-byte."""
    if relpath.replace(os.sep, "/").endswith("queries/__init__.py"):
        data = _PREFIX_BLOCK_RE.sub(b"_PREFIX_RN = []", data)
        data = b"\n".join(
            ln for ln in data.split(b"\n") if not ln.lstrip().startswith(b"#:")
        )
    return data


def package_tree_fingerprint(repo: str = REPO) -> str:
    """sha256 over every package source file (relpath + bytes, sorted;
    the machine-generated prefix block normalized out — see
    ``_normalize_for_fingerprint``).

    Ties an independent-evidence artifact (``PARITY_EVIDENCE.json``,
    written by ``tools/driver_sim.py`` on a full all-green oracle run) to
    the exact tree it ran against, so a plan-hash clearing of a
    materialization-gated edit — invisible to logical-plan hashing by
    design — carries a mechanical record of the oracle re-run instead of
    prose (r08 ADVICE)."""
    pkg = os.path.join(repo, "duckdb_nats_jetstream_spark")
    h = hashlib.sha256()
    for root, dirs, files in os.walk(pkg):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            p = os.path.join(root, f)
            rel = os.path.relpath(p, repo)
            h.update(rel.encode())
            h.update(b"\0")
            with open(p, "rb") as fh:
                h.update(_normalize_for_fingerprint(rel, fh.read()))
            h.update(b"\0")
    return h.hexdigest()


#: the only sf_dir a parity artifact may vouch from — the driver's own
#: correctness scale. A run against a tiny/degenerate dir would green
#: trivially while missing exactly the materialization-gated behavior
#: (inputFiles() emptiness branches) the evidence exists to catch
#: (r09 review).
PARITY_SF_DIR = "/root/testdata/sf0.01"


def _current_parity_evidence() -> dict | None:
    """The committed parity artifact, iff it vouches for THIS tree."""
    path = os.path.join(REPO, "PARITY_EVIDENCE.json")
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as fh:
        data = json.load(fh)
    if not data.get("all_green"):
        return None
    if data.get("sf_dir") != PARITY_SF_DIR:
        return None
    if data.get("tree_fingerprint") != package_tree_fingerprint():
        return None
    return {
        "artifact": "PARITY_EVIDENCE.json",
        "tree_fingerprint": data["tree_fingerprint"],
        "n_queries": data.get("n_queries"),
    }


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


_PKG = "duckdb_nats_jetstream_spark"


def _semantic_hash(src: str | None) -> bytes:
    """sha256 of the module's docstring-stripped AST dump — used for
    DEPENDENCY modules so comment/docstring-only edits (which can touch a
    widely-imported module and would otherwise re-queue half the registry)
    don't count as behavior changes. Falls back to the raw source hash when
    the snapshot doesn't parse."""
    if src is None:
        return hashlib.sha256(b"").digest()
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return hashlib.sha256(src.encode()).digest()
    for node in ast.walk(tree):
        if isinstance(
            node, (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            body = node.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                del body[0]
    return hashlib.sha256(
        ast.dump(tree, include_attributes=False).encode()
    ).digest()


def _semantic_hash_node(node: "ast.AST") -> bytes:
    """sha256 of ONE function's docstring-stripped AST dump — used for
    same-module HELPER functions a query calls (r14): a helper's semantics
    are part of the query's behavior, but comment/docstring churn must not
    re-queue callers (same normalization as dependency modules). Deep-copies
    before stripping — the node belongs to the snapshot's cached parse."""
    import copy

    node = copy.deepcopy(node)
    for sub in ast.walk(node):
        if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef)):
            body = sub.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                del body[0]
    return hashlib.sha256(
        ast.dump(node, include_attributes=False).encode()
    ).digest()


class _SourceTree:
    """AST/dependency resolution over one source snapshot (a git ref or the
    working tree), with per-snapshot caches — fingerprinting runs for every
    query on every pytest invocation, so each module is read and parsed at
    most once per snapshot."""

    def __init__(self, ref: str | None):
        self.ref = ref
        self._src: dict[str, str | None] = {}
        self._tree: dict[str, ast.AST | None] = {}
        self._mod_imports: dict[str, frozenset[str]] = {}
        self._sem_cache: dict[str, bytes] = {}

    def src(self, relpath: str) -> str | None:
        if relpath not in self._src:
            self._src[relpath] = _source_at(self.ref, relpath)
        return self._src[relpath]

    def tree(self, relpath: str):
        if relpath not in self._tree:
            s = self.src(relpath)
            try:
                self._tree[relpath] = ast.parse(s) if s is not None else None
            except SyntaxError:
                self._tree[relpath] = None
        return self._tree[relpath]

    def _exists(self, relpath: str) -> bool:
        return self.src(relpath) is not None

    def _resolve(self, dotted: str) -> str | None:
        """Dotted module name → existing relpath (leaf .py or package
        __init__), or None."""
        base = dotted.replace(".", "/")
        if self._exists(base + ".py"):
            return base + ".py"
        if self._exists(base + "/__init__.py"):
            return base + "/__init__.py"
        return None

    def _import_targets(self, relpath: str, node) -> dict[str, set[str]]:
        """alias/name bound by an import statement → package module
        relpaths. A binding maps to a SET: plain ``import pkg.a.b`` binds
        the root name ``pkg``, through which attribute access can reach ANY
        module imported via that root (``pkg.a.b.fn`` but also ``pkg.c.d``
        from another import statement), so the root name records every
        module on the dotted path — callers merge sets across statements."""
        out: dict[str, set[str]] = {}
        if isinstance(node, ast.Import):
            for a in node.names:
                if not a.name.startswith(_PKG):
                    continue
                if a.asname:
                    # `import pkg.a.b as x` binds x to the leaf only
                    p = self._resolve(a.name)
                    if p:
                        out.setdefault(a.asname, set()).add(p)
                    continue
                # `import pkg.a.b` binds `pkg`; record pkg/__init__,
                # pkg/a/__init__ AND pkg/a/b so attribute chains through
                # the root resolve to every module this statement loads
                parts = a.name.split(".")
                targets = out.setdefault(parts[0], set())
                for i in range(1, len(parts) + 1):
                    p = self._resolve(".".join(parts[:i]))
                    if p:
                        targets.add(p)
        elif isinstance(node, ast.ImportFrom):
            if node.level:
                parts = os.path.dirname(relpath).split("/")
                parts = parts[: len(parts) - (node.level - 1)]
                base = "/".join(parts).replace("/", ".")
                dotted = f"{base}.{node.module}" if node.module else base
            else:
                dotted = node.module or ""
            if not dotted.startswith(_PKG):
                return out
            for a in node.names:
                sub = self._resolve(f"{dotted}.{a.name}")
                p = sub or self._resolve(dotted)
                if p:
                    out.setdefault(a.asname or a.name, set()).add(p)
        return out

    def module_imports(self, relpath: str) -> frozenset[str]:
        """ALL package modules imported anywhere in the module (for the
        transitive closure step)."""
        if relpath not in self._mod_imports:
            tree = self.tree(relpath)
            found: set[str] = set()
            for node in ast.walk(tree) if tree is not None else ():
                if isinstance(node, (ast.Import, ast.ImportFrom)):
                    for targets in self._import_targets(
                        relpath, node
                    ).values():
                        found.update(targets)
            self._mod_imports[relpath] = frozenset(found - {relpath})
        return self._mod_imports[relpath]

    def fn_dependency_closure(
        self, relpath: str, fn_name: str
    ) -> frozenset[str] | None:
        """The package-module relpaths whose semantic hashes feed
        ``fn_fingerprint`` — exposed so tests can pin blast-radius claims
        (r08 verdict ask #5: ``session.py`` must appear in NO query's
        closure after the ``tables.py`` split)."""
        res = self._closure_and_seg(relpath, fn_name)
        return None if res is None else res[0]

    def _closure_and_seg(
        self, relpath: str, fn_name: str
    ) -> tuple[frozenset[str], str] | None:
        src = self.src(relpath)
        tree = self.tree(relpath)
        if src is None or tree is None:
            return None
        fns = {
            n.name: n for n in tree.body if isinstance(n, ast.FunctionDef)
        }
        if fn_name not in fns:
            return None
        seg = ast.get_source_segment(src, fns[fn_name])
        if seg is None:
            return None

        # name → module relpaths for every import binding in the module body
        # (top-level AND inside defs — several queries import locally);
        # sets MERGE across statements so two `import pkg.x` / `import
        # pkg.y` statements both attach to the root binding `pkg`
        alias: dict[str, set[str]] = {}
        for node in ast.walk(tree):
            if isinstance(node, (ast.Import, ast.ImportFrom)):
                for name, targets in self._import_targets(
                    relpath, node
                ).items():
                    alias.setdefault(name, set()).update(targets)
        # a name bound to a PACKAGE (__init__) reaches, via attribute
        # access, any submodule loaded by any import in this file
        # (`import pkg.sub.mod` + `import pkg.sub as s` → `s.mod.fn`
        # works) — widen package bindings with every imported module
        # under their prefix, or such uses under-requeue
        all_targets: set[str] = set().union(*alias.values()) if alias else set()
        for targets in alias.values():
            for t in list(targets):
                if t.endswith("/__init__.py"):
                    prefix = t[: -len("__init__.py")]
                    targets.update(
                        x for x in all_targets if x.startswith(prefix)
                    )

        # top-level assignments: target name -> assignment node. A query
        # fn referencing a module-level CONSTANT (_GOPHER thresholds,
        # _MIX_RATES, a protobuf descriptor literal) must re-queue when
        # the constant is edited — before r09 these names were silently
        # ignored and a threshold edit shipped unverified (r09 review,
        # the one hole in the tool's core guarantee). Tuple targets map
        # every bound name to the whole statement (conservative).
        consts: dict[str, ast.stmt] = {}
        for node in tree.body:
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    for n in ast.walk(t):
                        if isinstance(n, ast.Name):
                            consts[n.id] = node
            elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
                if isinstance(node.target, ast.Name):
                    consts[node.target.id] = node

        # names used by the fn, chasing same-module helpers' SOURCE + deps
        # and same-module constants' SOURCE (both ARE behavior), cycle-safe.
        # r14: helpers used to contribute only their dependencies on the
        # theory that "the operators they route to are the behavior
        # surface" — but pipeline5's `_unigram_bit_scores` is a same-module
        # helper that IS a whole computation chain, and its r13 rewrite
        # re-queued NEITHER of its two callers (exactly the r13-verdict #3
        # unverified-query escape). Helper SEMANTIC hashes (docstring-
        # stripped AST dump, same normalization as dependency modules) now
        # fold into the material, so editing a helper re-queues every
        # caller while comment/docstring churn still doesn't.
        roots: set[str] = set()
        const_segs: set[str] = set()
        helper_sems: set[bytes] = set()
        seen_helpers: set[str] = {fn_name}
        seen_consts: set[str] = set()
        stack: list[tuple[str, str]] = [("fn", fn_name)]
        while stack:
            kind, current = stack.pop()
            walk_root = fns[current] if kind == "fn" else consts[current]
            for node in ast.walk(walk_root):
                if isinstance(node, ast.Name):
                    if node.id in alias:
                        roots.update(alias[node.id])
                    elif node.id in fns:
                        if node.id not in seen_helpers:
                            seen_helpers.add(node.id)
                            helper_sems.add(
                                _semantic_hash_node(fns[node.id])
                            )
                            stack.append(("fn", node.id))
                    elif node.id in consts and node.id not in seen_consts:
                        seen_consts.add(node.id)
                        cseg = ast.get_source_segment(src, consts[node.id])
                        if cseg is not None:
                            const_segs.add(cseg)
                        stack.append(("const", node.id))
        if const_segs:
            # fingerprints of constant-free queries stay byte-identical
            # to the pre-r09 definition (material == fn segment alone)
            seg = seg + "\0#consts\0" + "\0".join(sorted(const_segs))
        if helper_sems:
            # helper-free queries likewise keep their pre-r14 fingerprint
            seg = seg + "\0#helpers\0" + b"\0".join(
                sorted(helper_sems)
            ).hex()

        # transitive closure over package imports of the used modules
        closure: set[str] = set()
        mods = list(roots)
        while mods:
            m = mods.pop()
            if m in closure:
                continue
            closure.add(m)
            mods.extend(self.module_imports(m) - closure)
        closure.discard(relpath)
        return frozenset(closure), seg

    def fn_fingerprint(self, relpath: str, fn_name: str) -> str | None:
        """Dependency-aware fingerprint: fn source segment + full sources of
        every package module reachable from the names the function (or the
        same-module top-level helpers it calls) uses."""
        res = self._closure_and_seg(relpath, fn_name)
        if res is None:
            return None
        closure, seg = res

        h = hashlib.sha256(seg.encode())
        for dep in sorted(closure):
            h.update(b"\0" + dep.encode() + b"\0")
            h.update(self._sem(dep))
        return h.hexdigest()

    def _sem(self, relpath: str) -> bytes:
        if relpath not in self._sem_cache:
            self._sem_cache[relpath] = _semantic_hash(self.src(relpath))
        return self._sem_cache[relpath]


#: lazy per-round _SourceTree cache (git-show + AST parse, no spark) —
#: shared by the plan-evidence validation below and the freshness test
_REF_TREE_CACHE: dict[int, "_SourceTree"] = {}


def _ref_tree(round_n: int) -> "_SourceTree":
    if round_n not in _REF_TREE_CACHE:
        _REF_TREE_CACHE[round_n] = _SourceTree(ROUND_CODE_REFS[round_n])
    return _REF_TREE_CACHE[round_n]


def plan_evidence_valid(entry: dict, wt: "_SourceTree") -> bool:
    """Is this query's ``plan_neutral_edit`` evidence still good — i.e.
    may an edited-since-green query keep its green instead of re-queueing?

    All of the following must hold (docs/R08_PLAN.md item 2):

    1. evidence exists and targets the CURRENT last-green round;
    2. the working-tree dependency-aware fingerprint equals the one the
       evidence was recorded against (any later edit voids it);
    3. the stored last-green plan hash is present, ``clearable`` (no
       Python-eval nodes — the plan names UDFs but not their bodies — and
       no materialization-truncated ``LogicalRDD`` leaves), and equals
       the working-tree plan hash recorded in the evidence;
    4. own-segment guard: the query function's OWN raw source segment is
       unchanged since the green — plan-hash evidence only ever vouches
       for DEPENDENCY-module edits, never for edits to the query itself.
    """
    pne = entry.get("plan_neutral_edit")
    base = entry.get("plan_hash_at_last_green")
    lg = entry.get("last_green_round")
    if not pne or not base or lg is None or lg not in ROUND_CODE_REFS:
        return False
    if pne.get("vs_round") != lg:
        return False
    wt_fp = wt.fn_fingerprint(entry["module"], entry["function"])
    if wt_fp is None or pne.get("fingerprint_at_clear") != wt_fp:
        return False
    if base.get("fingerprint") != entry.get("fingerprint_at_last_green"):
        # the baseline must have been recorded against code identical to
        # the last-green code, or it vouches for nothing (build_status
        # enforces this on carry-forward; re-enforced here so a
        # hand-edited/corrupted ledger can't smuggle a clearing — r08
        # review)
        return False
    if not base.get("clearable") or not pne.get("clearable"):
        return False
    if pne.get("hash") != base.get("hash") or base.get("sf_dir") != pne.get("sf_dir"):
        return False
    # Pin to the CURRENT hash-domain scheme, not merely base==pne: schemes
    # 1-4 were each superseded for soundness defects, and without this pin
    # stale same-scheme evidence pairs keep clearing edited queries after a
    # bump until the ledger happens to be regenerated (r08 ADVICE, medium).
    from tools.plan_hash import PLAN_HASH_SCHEME

    if pne.get("scheme") != PLAN_HASH_SCHEME or base.get("scheme") != PLAN_HASH_SCHEME:
        return False
    own_then = _fn_fingerprint(
        _ref_tree(lg).src(entry["module"]), entry["function"]
    )
    own_now = _fn_fingerprint(wt.src(entry["module"]), entry["function"])
    return own_then is not None and own_then == own_now


def _green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
    )


def build_status() -> dict:
    sys.path.insert(0, REPO)
    from tools.plan_hash import PLAN_HASH_SCHEME
    from duckdb_nats_jetstream_spark.queries import full_registry

    registry = full_registry()
    names = list(registry)

    # carry forward plan-hash evidence from the committed ledger: the
    # stored baseline stays valid exactly while the fingerprint it was
    # recorded against still IS the last-green fingerprint, and a
    # plan_neutral_edit is superseded the moment a newer green row lands
    prev: dict[str, dict] = {}
    prev_path = os.path.join(REPO, "REGISTRY_STATUS.json")
    if os.path.exists(prev_path):
        with open(prev_path, encoding="utf-8") as fh:
            prev = json.load(fh)

    rounds: dict[int, dict] = {}
    for n in sorted(ROUND_CODE_REFS):
        path = os.path.join(REPO, f"CORRECTNESS_r{n:02d}.json")
        if os.path.exists(path):
            with open(path, encoding="utf-8") as fh:
                rounds[n] = json.load(fh)

    # reuse the module-level per-ref cache: plan_evidence_valid /
    # recommend_prefix hit the same refs right after build_status, and a
    # private dict here doubled every git-show + AST parse (r09 review)
    ref_trees = {n: _ref_tree(n) for n in ROUND_CODE_REFS}

    status: dict[str, dict] = {}
    for pos, name in enumerate(names):
        fn, sql = registry[name]
        relpath = _module_relpath(fn.__module__)
        checked = [n for n, rows in rounds.items() if name in rows]
        green = [n for n in checked if _green(rounds[n][name])]
        last_green = max(green) if green else None
        fp_then = (
            ref_trees[last_green].fn_fingerprint(relpath, fn.__qualname__)
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
        old = prev.get(name, {})
        base = old.get("plan_hash_at_last_green")
        if (
            base
            and fp_then is not None
            and base.get("fingerprint") == fp_then
            and base.get("scheme") == PLAN_HASH_SCHEME
        ):
            status[name]["plan_hash_at_last_green"] = base
        pne = old.get("plan_neutral_edit")
        if (
            pne
            and last_green is not None
            and pne.get("vs_round") == last_green
            and pne.get("scheme") == PLAN_HASH_SCHEME
        ):
            status[name]["plan_neutral_edit"] = pne
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

    Plan-hash clearing (docs/R08_PLAN.md item 2): an edited query whose
    ``plan_neutral_edit`` evidence passes :func:`plan_evidence_valid` —
    the edit touched only dependency modules AND left the optimized plan
    byte-identical on a plan with no Python-eval or materialized leaves —
    keeps its green and rotates normally instead of burning a re-queue
    slot. Evidence is produced only by ``--plan-check`` (needs a live
    SparkSession); the default ledger run carries committed evidence
    forward and re-validates it here without spark.
    """
    # one _SourceTree for the working tree: module reads/parses and import
    # closures are cached across the ~180 query functions (this also runs
    # on every pytest invocation via test_prefix_matches_recommendation)
    wt = _SourceTree(None)

    stale, rotate = [], []
    for name, s in status.items():
        if not s["oracle"]:
            continue
        never_green = s["last_green_round"] is None
        edited = not never_green and s[
            "fingerprint_at_last_green"
        ] != wt.fn_fingerprint(s["module"], s["function"])
        if edited and plan_evidence_valid(s, wt):
            edited = False
        if (never_green or edited) and name not in ack_deferred:
            stale.append((s["position"], name))
        else:
            rotate.append((s["last_green_round"] or 0, s["position"], name))
    ordered = [n for _, n in sorted(stale)]
    ordered += [n for _, _, n in sorted(rotate)]
    return ordered[:budget]


def _hash_subprocess(names: list[str], repo: str) -> dict:
    """Run ``tools/plan_hash.py`` (from THIS tree — the instrument must
    not vary with the snapshot under test) against ``repo``'s package
    code; returns the parsed payload."""
    import subprocess as sp
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        out_path = tf.name
    try:
        sp.run(
            [sys.executable, os.path.join(REPO, "tools", "plan_hash.py"),
             "--out", out_path, "--names", ",".join(names), "--repo", repo],
            cwd=REPO,
            check=True,
        )
        with open(out_path, encoding="utf-8") as fh:
            return json.load(fh)
    finally:
        # a failed subprocess must not orphan the tempfile (r09 review)
        if os.path.exists(out_path):
            os.unlink(out_path)


def _ref_worktree(round_n: int) -> str:
    """Detached git worktree of the round's verified code under
    ``.plan_worktrees/`` (gitignored, reused across runs)."""
    import subprocess as sp

    path = os.path.join(REPO, ".plan_worktrees", f"r{round_n:02d}")
    marker = os.path.join(path, "duckdb_nats_jetstream_spark", "__init__.py")
    if os.path.exists(marker):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if os.path.isdir(path):  # half-built — remove and re-add
        sp.run(["git", "worktree", "remove", "--force", path], cwd=REPO,
               capture_output=True)
    sp.run(
        ["git", "worktree", "add", "--detach", path,
         ROUND_CODE_REFS[round_n]],
        cwd=REPO,
        check=True,
        capture_output=True,
    )
    return path


def _prune_stale(status: dict, wt: "_SourceTree") -> None:
    """Drop evidence that no longer validates. Runs on EVERY plan-check
    path, including nothing-to-hash (r09 review: revert an edit after a
    clearing and the query is 'unchanged' with a valid baseline, so the
    early-return path was the only one that could ever prune its now
    fingerprint-mismatched evidence — the freshness suite failed with a
    remedy that was a no-op)."""
    for name, s in status.items():
        if s.get("plan_neutral_edit") and not plan_evidence_valid(s, wt):
            del s["plan_neutral_edit"]
            print(f"  pruned stale evidence: {name}")


def _stamp_parity(status: dict, wt_fp: dict) -> None:
    """Independent-evidence stamping (r08 ADVICE): plan hashes cover the
    LOGICAL plan only, so a materialization-gated dependency edit (the
    r08 spread() shape) could clear on hashes alone. When a committed
    PARITY_EVIDENCE.json (full all-green oracle run, tools/driver_sim.py)
    vouches for EXACTLY this tree, stamp every valid clearing with it;
    clearings left bare are printed on EVERY run so they can't pass
    silently once the operator's attention moves on."""
    parity = _current_parity_evidence()
    bare: list[str] = []
    for name, s in status.items():
        pne = s.get("plan_neutral_edit")
        if not pne:
            continue
        if parity and wt_fp.get(name) == pne.get("fingerprint_at_clear"):
            pne["parity"] = parity
        elif "parity" not in pne:
            bare.append(name)
    if bare:
        print(
            f"plan-check: {len(bare)} clearings rest on plan hashes ALONE "
            "(no matching PARITY_EVIDENCE.json for this tree) — run "
            "`python tools/driver_sim.py all` then re-run --plan-check "
            "if any cleared edit is materialization-gated:"
        )
        for name in bare:
            print(f"  bare clearing: {name}")


def _run_plan_check(status: dict) -> None:
    """Opt-in (``--plan-check``) plan-hash pass — needs a live spark, run
    as subprocesses (``tools/plan_hash.py``) so the ledger CLI itself
    stays JVM-free. For every oracle-backed green query:

    1. ensure a **baseline** ``plan_hash_at_last_green`` exists: reuse a
       stored one (same scheme, fingerprint tied to the last green), or
       compute it — from the working tree when the query's fingerprint
       still matches its last green (code identical-by-semantic-hash),
       otherwise from a git WORKTREE of the last-green round's verified
       code (so baselines never depend on when the tool was run);
    2. for every **edited** query, compare the working-tree plan hash
       against the baseline and record ``plan_neutral_edit`` evidence
       when equal, clearable, and the query's own source segment is
       untouched (dependency-only edit);
    3. prune evidence that no longer validates.
    """
    wt = _SourceTree(None)
    from tools.plan_hash import PLAN_HASH_SCHEME

    wt_fp: dict[str, str | None] = {}
    baseline_wt: list[str] = []           # unchanged code → wt hash IS baseline
    baseline_ref: dict[int, list[str]] = {}  # edited → hash at last-green ref
    edited_cand: list[str] = []
    for name, s in status.items():
        if not s["oracle"] or s["last_green_round"] is None:
            continue
        wt_fp[name] = wt.fn_fingerprint(s["module"], s["function"])
        unchanged = wt_fp[name] == s["fingerprint_at_last_green"]
        base = s.get("plan_hash_at_last_green")
        has_base = bool(
            base
            and base.get("scheme") == PLAN_HASH_SCHEME
            and base.get("fingerprint") == s["fingerprint_at_last_green"]
        )
        if unchanged:
            if not has_base:
                baseline_wt.append(name)
        elif not plan_evidence_valid(s, wt):
            edited_cand.append(name)
            if not has_base and s["last_green_round"] in ROUND_CODE_REFS:
                baseline_ref.setdefault(s["last_green_round"], []).append(name)
    if not baseline_wt and not edited_cand:
        # still prune invalid evidence and refresh parity stamps / report
        # bare clearings: a no-op plan-check after a fresh driver_sim run
        # must upgrade carried evidence to the new artifact, a reverted
        # edit must shed its stale clearing, and a bare clearing must
        # keep being reported (r09 review follow-ups)
        _prune_stale(status, wt)
        _stamp_parity(status, wt_fp)
        print("plan-check: nothing to hash")
        return
    print(
        f"plan-check: {len(baseline_wt)} wt baselines, "
        f"{sum(map(len, baseline_ref.values()))} ref baselines across "
        f"{len(baseline_ref)} rounds, {len(edited_cand)} edited candidates"
    )

    # ref-side baselines: one worktree + subprocess per last-green round
    used_worktrees: list[str] = []
    for round_n, names in sorted(baseline_ref.items()):
        wtree = _ref_worktree(round_n)
        used_worktrees.append(wtree)
        payload = _hash_subprocess(names, wtree)
        for name in names:
            h = payload["hashes"].get(name, {})
            if "error" in h:
                print(f"  ref baseline FAILED {name} (r{round_n}): {h['error']}")
                continue
            status[name]["plan_hash_at_last_green"] = {
                **h,
                "sf_dir": payload["sf_dir"],
                "scheme": payload["scheme"],
                # recorded from the last-green code itself, so the tie to
                # fingerprint_at_last_green holds by construction
                "fingerprint": status[name]["fingerprint_at_last_green"],
            }

    # working-tree hashes: unchanged-code baselines + edited candidates
    payload = _hash_subprocess(baseline_wt + edited_cand, REPO)
    hashes, sf_dir, scheme = payload["hashes"], payload["sf_dir"], payload["scheme"]
    for name in baseline_wt:
        h = hashes.get(name, {})
        if "error" in h:
            print(f"  baseline FAILED {name}: {h['error']}")
            continue
        status[name]["plan_hash_at_last_green"] = {
            **h, "sf_dir": sf_dir, "scheme": scheme, "fingerprint": wt_fp[name],
        }
    cleared = 0
    for name in edited_cand:
        h = hashes.get(name, {})
        s = status[name]
        base = s.get("plan_hash_at_last_green")
        if base is None or base.get("scheme") != scheme:
            print(f"  NOT cleared {name}: no usable baseline")
            continue
        if "error" in h:
            print(f"  edited candidate FAILED {name}: {h['error']}")
            continue
        if h["hash"] == base["hash"] and h["clearable"] and base["clearable"]:
            s["plan_neutral_edit"] = {
                **h,
                "sf_dir": sf_dir,
                "scheme": scheme,
                "vs_round": s["last_green_round"],
                "fingerprint_at_clear": wt_fp[name],
            }
            if plan_evidence_valid(s, wt):
                cleared += 1
            else:  # own-segment guard (or another invariant) rejected it
                del s["plan_neutral_edit"]
                print(f"  NOT cleared (own source edited): {name}")
        else:
            why = h.get("reasons") or base.get("reasons") or []
            print(
                f"  NOT cleared {name}: hash {'==' if h['hash'] == base['hash'] else '!='}"
                f" baseline, clearable now={h['clearable']} then={base['clearable']}"
                + (f" ({', '.join(why)})" if why else "")
            )
    # prune stale evidence: a query edited again after a clearing (or one
    # that failed to re-clear above) must not keep an invalid
    # plan_neutral_edit in the ledger — it would re-queue anyway via
    # recommend_prefix, but the freshness suite rightly rejects a ledger
    # carrying evidence that no longer validates
    _prune_stale(status, wt)
    _stamp_parity(status, wt_fp)
    # remove the ref worktrees: they hold full engine copies that would
    # double-count in any whole-repo LoC/copy diagnostic; recreating one
    # costs ~1 s next run, the subprocess session dominates anyway
    import subprocess as sp

    for wtree in used_worktrees:
        sp.run(["git", "worktree", "remove", "--force", wtree], cwd=REPO,
               capture_output=True)
    print(f"plan-check: {cleared}/{len(edited_cand)} edited queries cleared")


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    # a typo'd flag must be a hard error, not a silent plain-ledger run
    # that overwrites REGISTRY_STATUS.json without the plan-hash pass
    # (r09 review)
    ap.add_argument("--plan-check", action="store_true")
    args = ap.parse_args()

    status = build_status()
    if args.plan_check:
        _run_plan_check(status)
    out = os.path.join(REPO, "REGISTRY_STATUS.json")
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(status, fh, indent=1, sort_keys=True)
        fh.write("\n")
    never = [n for n, s in status.items() if s["last_green_round"] is None]
    print(f"{len(status)} queries; never-green: {len(never)}")
    for n in never:
        print("  never-green:", n, "(rows-only)" if not status[n]["oracle"] else "")
    print("\nrecommended driver prefix (paste into queries/__init__.py):")
    for n in recommend_prefix(status, ack_deferred=set(ACK_DEFERRED)):
        print(f'    "{n}",')


if __name__ == "__main__":
    main()

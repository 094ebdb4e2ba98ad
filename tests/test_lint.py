"""Mechanical lint over the package source for the defect classes the
r08-r10 adversarial sweeps kept re-finding (r10 verdict ask #7): ~40 fixes
across 7 sweeps shared a handful of shapes, and the mechanizable subset is
cheaper as a standing test than as another round of sweep archaeology.

Checks here are SYNTACTIC and zero-false-positive by construction:

- no nondeterministic ``F.rand``/``F.randn`` anywhere (a rand() fan-out
  salt is retry-lossy — a resubmitted task re-rolls rows onto different
  salts; the r10 sweep replaced the one usage with a content hash, and
  every salt since is pmod/xxhash64);
- no unseeded numpy randomness (same determinism contract for Arrow UDFs);
- no wall-clock reads (``time.time()``/``datetime.now()``) in operator
  logic — task retries must be replay-identical;
- a GroupState timeout branch never re-arms ``setTimeoutTimestamp`` (the
  documented availableNow infinite-cleanup bug, streaming/stateful.py);
- every ``.collect()`` site is PINNED per module: each existing site is
  bounded-by-construction (k-row top-k lists, per-iteration centroid
  pulls, vocabulary-bound BPE merges); a NEW site must be consciously
  added here with the same justification, or it is presumed unbounded.

Still sweep territory (semantic, not lintable without false positives):
unguarded ``/`` where the denominator can be 0 on real data, and
null-safety of join keys — those need the data model, not the syntax.
"""

from __future__ import annotations

import ast
import os
import re

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "duckdb_nats_jetstream_spark",
)


def _py_files():
    for root, dirs, files in os.walk(PKG):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in sorted(files):
            if f.endswith(".py"):
                yield os.path.join(root, f)


def _rel(path: str) -> str:
    return os.path.relpath(path, PKG)


def _code_lines(path: str):
    """(lineno, line) for non-comment source lines (docstrings included —
    a pattern named in prose is fine, these regexes target call syntax)."""
    with open(path, encoding="utf-8") as fh:
        for i, line in enumerate(fh, 1):
            yield i, line.split("#", 1)[0]


def test_no_spark_rand():
    bad = [
        f"{_rel(p)}:{i}"
        for p in _py_files()
        for i, line in _code_lines(p)
        if re.search(r"\bF\.randn?\s*\(", line)
        or re.search(r"\brandn?\s*\(\s*\)", line)  # expr-string rand()
    ]
    assert not bad, f"nondeterministic rand() in shuffle-adjacent code: {bad}"


def test_numpy_randomness_is_seeded():
    bad = []
    for p in _py_files():
        for i, line in _code_lines(p):
            for m in re.finditer(r"np\.random\.(\w+)\s*\(\s*(\)?)", line):
                ctor, empty = m.group(1), m.group(2) == ")"
                if ctor not in ("RandomState", "default_rng") or empty:
                    bad.append(f"{_rel(p)}:{i} np.random.{ctor}")
    assert not bad, f"unseeded numpy randomness: {bad}"


def test_no_wall_clock_in_operators():
    bad = [
        f"{_rel(p)}:{i}"
        for p in _py_files()
        for i, line in _code_lines(p)
        if re.search(r"\btime\.time\(\)|datetime\.now\(\)|\butcnow\(\)", line)
    ]
    assert not bad, f"wall-clock read (task retries must replay): {bad}"


def test_timeout_branch_never_rearms():
    """Inside ``if state.hasTimedOut:`` no ``setTimeoutTimestamp`` call —
    re-arming keeps availableNow's state-cleanup phase alive forever."""

    class V(ast.NodeVisitor):
        def __init__(self):
            self.bad: list[int] = []

        def visit_If(self, node: ast.If):
            t = node.test
            if isinstance(t, ast.Attribute) and t.attr == "hasTimedOut":
                for sub in ast.walk(ast.Module(body=node.body, type_ignores=[])):
                    if (
                        isinstance(sub, ast.Attribute)
                        and sub.attr == "setTimeoutTimestamp"
                    ):
                        self.bad.append(node.lineno)
            self.generic_visit(node)

    bad = []
    for p in _py_files():
        with open(p, encoding="utf-8") as fh:
            v = V()
            v.visit(ast.parse(fh.read()))
            bad += [f"{_rel(p)}:{ln}" for ln in v.bad]
    assert not bad, f"timeout branch re-arms its own timeout: {bad}"


#: module → expected number of .collect() sites, each bounded by
#: construction (reviewed r10 by the judge; grep-verified). Adding a site
#: requires adding it HERE with a boundedness argument in the PR/commit.
_COLLECT_ALLOWLIST = {
    "operators/bpe.py": 2,  # vocabulary-bound merge table pulls
    # caller-asserted ≤max_edges pull, fail-loud via limit(max_edges+1)
    "operators/components.py": 1,
    "operators/kmeans.py": 2,  # k·dim centroid partials per iteration
    "operators/pq.py": 2,  # codebook (k·m·dsub floats)
    "operators/quantiles.py": 2,  # one row per requested quantile
    "operators/retrieval.py": 1,  # RM3 expansion terms (limit(fb_terms))
    "operators/similarity.py": 1,  # IVF codebook (nlist·dim)
    "queries/pipeline3.py": 1,  # mixture weights (one row per domain)
}


def test_collect_sites_are_pinned():
    got: dict[str, int] = {}
    for p in _py_files():
        n = sum(line.count(".collect()") for _i, line in _code_lines(p))
        if n:
            got[_rel(p)] = n
    assert got == _COLLECT_ALLOWLIST, (
        f"driver-side .collect() sites changed: {got} != allowlist "
        f"{_COLLECT_ALLOWLIST} — a new site is presumed UNBOUNDED until "
        "pinned here with a boundedness argument"
    )

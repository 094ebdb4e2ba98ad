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
    UDTFs) are clearable SINCE SCHEME 6 iff every named Python
    expression in the plan is matched by a UDF object captured during
    the build AND the recursive closure fingerprint of those objects
    (bytecode, consts, defaults, closure cells, referenced-global
    values — see :func:`closure_fingerprint`) folds into the hash;
    unmatched names (session-registered functions reused by name),
    uncovered python node classes (Python data sources), or any
    reachable value that can't be pinned deterministically still
    refuse clearing;
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
#: 6: Python-eval plans become clearable when every named Python
#:    expression in the plan (PythonUDF/PythonUDTF/PythonUDAF) is matched
#:    by a UDF object captured during THIS build, and the recursive
#:    closure fingerprint of those objects (bytecode, consts, defaults,
#:    closure cells, referenced-global VALUES — never file paths or line
#:    numbers) folds into the hash. r09 verdict ask #3: 26/50 driver
#:    slots went to re-queues of Arrow-stage queries whose edits the
#:    plan hash could see but not vouch for.
#: 7: set elements fingerprint against isolated seen-state copies (a
#:    shared seen-set made the sorted sub-digests depend on iteration
#:    order for sets whose elements reference a common object — caught
#:    by the same-round review before any baseline shipped a round)
#: 8: expression evalModes fold into the hash. ``try_divide`` renders
#:    IDENTICALLY to ``/`` in both the optimized-plan string and its
#:    JSON serialization (``evalContext`` is null in the JSON too), so a
#:    LEGACY→TRY semantics change was hash-invisible — scheme 7 cleared
#:    queries whose divide-by-zero behavior changed from crash to NULL
#:    (caught live when the r10 try_divide totality fixes cleared
#:    instead of re-queueing; values were parity-verified so no wrong
#:    green shipped, but the evidence claim was unsound). The modes are
#:    read off the live Catalyst tree via a reflective walk
#:    (``_eval_modes``); a truncated walk refuses clearing.
PLAN_HASH_SCHEME = 8

#: default snapshot data — plan SHAPE only matters, so the smallest SF
DEFAULT_SF = "/root/testdata/sf0.001"

_PY_MARKERS = ("python", "pandas", "udtf")
_RDD_MARKERS = ("LogicalRDD", "ExistingRDD")

# ---------------------------------------------------------------------------
# scheme 6: Python-closure fingerprinting
# ---------------------------------------------------------------------------

_PKG = "duckdb_nats_jetstream_spark"

#: plan-node classes that carry Python code ONLY through an embedded
#: PythonUDF/PythonUDTF/PythonUDAF expression (whose name+closure we
#: match/fingerprint). Any OTHER class matching _PY_CLASS_RE is treated
#: as an uncovered Python node and refuses clearing — safe direction for
#: e.g. Python data sources, whose code never surfaces as a named UDF.
_PY_WRAPPER_CLASSES = frozenset({
    "ArrowEvalPython",
    "BatchEvalPython",
    "BatchEvalPythonUDTF",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "PythonMapInArrow",
    "MapInArrow",
    "FlatMapGroupsInArrow",
    "ApplyInPandasWithState",
    "TransformWithStateInPandas",
})
_PY_NAMED_CLASSES = frozenset({"PythonUDF", "PythonUDTF", "PythonUDAF"})
_PY_CLASS_RE = re.compile(r"python|pandas|udtf", re.I)
_ADDR_RE = re.compile(r" at 0x[0-9a-fA-F]+")

_FP_MAX_DEPTH = 64
_FP_MAX_VISITS = 20_000


class _FpState:
    __slots__ = ("seen", "visits", "reasons")

    def __init__(self):
        self.seen: set[int] = set()
        self.visits = 0
        self.reasons: list[str] = []


def _module_sem_hash(path: str) -> bytes:
    """Docstring-stripped AST hash of a package module file — a
    UDF-referenced module global hashes by CONTENT so edits to it void
    the closure fingerprint, but a docstring-only edit doesn't."""
    import ast

    try:
        with open(path, encoding="utf-8") as fh:
            src = fh.read()
        tree = ast.parse(src)
    except (OSError, SyntaxError):
        return hashlib.sha256(b"<unreadable>").digest()
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


def _global_names(code) -> set[str]:
    import types

    names = set(code.co_names)
    for c in code.co_consts:
        if isinstance(c, types.CodeType):
            names |= _global_names(c)
    return names


def _fp_code(code, h, st: _FpState, depth: int) -> None:
    """Bytecode + consts + name tables. Deliberately EXCLUDES co_filename,
    co_firstlineno and co_linetable, so a dependency edit that only shifts
    the UDF's position in its file still clears."""
    h.update(b"code:")
    h.update(code.co_code)
    h.update(
        repr((
            code.co_name, code.co_names, code.co_varnames, code.co_freevars,
            code.co_cellvars, code.co_argcount, code.co_posonlyargcount,
            code.co_kwonlyargcount, code.co_flags,
        )).encode()
    )
    import types

    for c in code.co_consts:
        if isinstance(c, types.CodeType):
            _fp_code(c, h, st, depth + 1)
        else:
            _fp_value(c, h, st, depth + 1)


def _is_user_code(obj) -> bool:
    """Full-fingerprint user code (package, tools, tests, exec'd);
    identify installed-library / stdlib callables by dotted name only
    (their versions are environment-pinned, and recursing into e.g.
    numpy internals would be unbounded)."""
    mod = getattr(obj, "__module__", None) or ""
    if mod.split(".")[0] == _PKG:
        return True
    code = getattr(obj, "__code__", None)
    if code is not None:
        f = code.co_filename
    else:
        f = getattr(sys.modules.get(mod), "__file__", None)
    return bool(f) and "site-packages" not in f and not f.startswith(
        sys.base_prefix
    )


def _fp_function(f, h, st: _FpState, depth: int) -> None:
    import types

    if not _is_user_code(f):
        # external (library / test) function: identity by dotted name —
        # library versions are environment-pinned — but STILL recurse
        # into defaults and closure cells: wrapper lambdas defined in
        # library code (e.g. pyspark shims) can smuggle user callables
        # through their cells.
        h.update(
            f"extfn:{getattr(f, '__module__', '?')}.{f.__qualname__}".encode()
        )
    else:
        h.update(b"fn:")
        _fp_code(f.__code__, h, st, depth)
        # referenced-global VALUES (sorted by name): a changed module-level
        # constant the UDF reads must change the fingerprint (the verdict's
        # pinned-test requirement)
        g = f.__globals__
        for name in sorted(_global_names(f.__code__)):
            if name in g:
                h.update(f"g:{name}=".encode())
                _fp_value(g[name], h, st, depth + 1)
            else:
                h.update(f"g:{name}:<unbound>".encode())
    _fp_value(f.__defaults__, h, st, depth + 1)
    _fp_value(getattr(f, "__kwdefaults__", None), h, st, depth + 1)
    code = getattr(f, "__code__", None)
    cells = getattr(f, "__closure__", None) or ()
    freevars = code.co_freevars if code is not None else ()
    for name, cell in zip(freevars, cells):
        h.update(f"cell:{name}=".encode())
        try:
            _fp_value(cell.cell_contents, h, st, depth + 1)
        except ValueError:  # empty cell
            h.update(b"<empty-cell>")


def _fp_class(cls, h, st: _FpState, depth: int) -> None:
    if not _is_user_code(cls):
        h.update(
            f"extclass:{getattr(cls, '__module__', '?')}.{cls.__qualname__}".encode()
        )
        return
    h.update(f"class:{cls.__qualname__}(".encode())
    h.update(
        ",".join(
            f"{b.__module__}.{b.__qualname__}" for b in cls.__bases__
        ).encode()
    )
    h.update(b")")
    skip = {
        "__dict__", "__weakref__", "__doc__", "__module__", "__qualname__",
        "__firstlineno__", "__static_attributes__",
    }
    for k in sorted(cls.__dict__):
        if k in skip:
            continue
        v = cls.__dict__[k]
        if isinstance(v, (staticmethod, classmethod)):
            v = v.__func__
        h.update(f"attr:{k}=".encode())
        if isinstance(v, property):
            for part in (v.fget, v.fset, v.fdel):
                _fp_value(part, h, st, depth + 1)
        else:
            _fp_value(v, h, st, depth + 1)


def _fp_value(v, h, st: _FpState, depth: int) -> None:
    """Deterministic content fingerprint of a Python value reachable from
    a UDF — see ``closure_fingerprint``. Anything whose full content
    cannot be pinned deterministically records a reason instead (the
    plan then refuses clearing: safe direction)."""
    import functools
    import types

    st.visits += 1
    if depth > _FP_MAX_DEPTH or st.visits > _FP_MAX_VISITS:
        st.reasons.append("fp_budget_exceeded")
        h.update(b"<budget>")
        return
    if v is None or isinstance(v, (bool, int, float, complex, str, bytes)):
        h.update(b"p:")
        h.update(repr(v).encode())
        return
    if id(v) in st.seen:
        h.update(b"<revisit>")
        return
    st.seen.add(id(v))
    tmod = type(v).__module__ or ""
    if isinstance(v, (list, tuple)):
        h.update(f"seq:{type(v).__name__}:{len(v)}:".encode())
        for x in v:
            _fp_value(x, h, st, depth + 1)
    elif isinstance(v, (set, frozenset)):
        # element order is hash-randomized for strings — sort by each
        # element's own digest. Each element hashes against an ISOLATED
        # copy of the seen-set: sharing it would let iteration order
        # decide which of two elements referencing a common object gets
        # the full content vs the <revisit> marker, making the sorted
        # digests order-dependent after all.
        subs = []
        for x in v:
            hh = hashlib.sha256()
            sub = _FpState()
            sub.seen = set(st.seen)
            sub.visits = st.visits
            _fp_value(x, hh, sub, depth + 1)
            st.visits = sub.visits
            st.reasons.extend(sub.reasons)
            subs.append(hh.digest())
        h.update(f"set:{len(v)}:".encode())
        for d in sorted(subs):
            h.update(d)
    elif isinstance(v, dict):
        h.update(f"dict:{len(v)}:".encode())
        for k, val in v.items():  # insertion order: deterministic from code
            _fp_value(k, h, st, depth + 1)
            _fp_value(val, h, st, depth + 1)
    elif isinstance(v, types.FunctionType):
        _fp_function(v, h, st, depth + 1)
    elif isinstance(v, types.MethodType):
        h.update(b"method:")
        _fp_value(v.__func__, h, st, depth + 1)
        _fp_value(v.__self__, h, st, depth + 1)
    elif isinstance(
        v, (types.BuiltinFunctionType, types.BuiltinMethodType,
            types.WrapperDescriptorType, types.MethodDescriptorType)
    ):
        h.update(
            f"builtin:{getattr(v, '__module__', '?')}."
            f"{getattr(v, '__qualname__', getattr(v, '__name__', '?'))}".encode()
        )
    elif isinstance(v, functools.partial):
        h.update(b"partial:")
        _fp_value(v.func, h, st, depth + 1)
        _fp_value(v.args, h, st, depth + 1)
        _fp_value(v.keywords, h, st, depth + 1)
    elif isinstance(v, types.ModuleType):
        name = getattr(v, "__name__", "?")
        h.update(f"module:{name}".encode())
        if name.split(".")[0] == _PKG and getattr(v, "__file__", None):
            # package module referenced from a UDF: hash its (docstring-
            # stripped) source so editing it voids the fingerprint
            h.update(_module_sem_hash(v.__file__))
    elif isinstance(v, type):
        _fp_class(v, h, st, depth + 1)
    elif tmod.split(".")[0] == "numpy":
        import numpy as np

        if isinstance(v, np.ndarray):
            h.update(f"ndarray:{v.dtype}:{v.shape}:".encode())
            h.update(np.ascontiguousarray(v).tobytes())
        elif isinstance(v, np.generic):
            h.update(f"npscalar:{v.dtype}:".encode())
            h.update(v.tobytes())
        elif isinstance(v, np.dtype):
            h.update(f"npdtype:{v}".encode())
        else:
            st.reasons.append(f"fp_opaque:{tmod}.{type(v).__qualname__}")
            h.update(b"<opaque>")
    elif tmod.split(".")[0] == "pandas":
        # pandas reprs truncate — content would sit outside the hash
        st.reasons.append(f"fp_opaque:{tmod}.{type(v).__qualname__}")
        h.update(b"<opaque>")
    elif _is_user_code(type(v)):
        # instance of a user-code class (e.g. a parsed proto Descriptor):
        # fingerprint = its class definition + its instance state
        h.update(b"pkginst:")
        _fp_class(type(v), h, st, depth + 1)
        state = getattr(v, "__dict__", None)
        if state is None and hasattr(type(v), "__slots__"):
            state = {
                s: getattr(v, s, None) for s in type(v).__slots__
            }
        if state is None:
            st.reasons.append(f"fp_opaque:{tmod}.{type(v).__qualname__}")
            h.update(b"<opaque>")
        else:
            _fp_value(state, h, st, depth + 1)
    elif type(v) is object:
        # a bare object() sentinel carries identity, not content — any
        # two are behaviorally interchangeable
        h.update(b"sentinel:object")
    else:
        r = repr(v)
        if _ADDR_RE.search(r):
            st.reasons.append(f"fp_opaque:{tmod}.{type(v).__qualname__}")
            h.update(f"opaque:{tmod}.{type(v).__qualname__}".encode())
        else:
            h.update(b"r:")
            h.update(r.encode())


def closure_fingerprint(entries) -> tuple[str | None, list[str]]:
    """(hex digest, reasons) over ``[(name, callable), ...]`` in creation
    order. Covers bytecode, consts, defaults, kwdefaults, closure-cell
    values and referenced-global values recursively (package functions
    fully; external-library callables by dotted name plus their cells);
    excludes file paths, line numbers and docstring-only module changes.
    A non-empty ``reasons`` means some reachable value could not be
    pinned deterministically — callers must refuse clearing then."""
    h = hashlib.sha256()
    st = _FpState()
    for name, fn in entries:
        h.update(f"udf:{name}\0".encode())
        _fp_value(fn, h, st, 0)
        h.update(b"\0")
    return (None if st.reasons else h.hexdigest()), sorted(set(st.reasons))


def _capture_udfs(into: list):
    """Context manager recording every UserDefinedFunction /
    UserDefinedTableFunction constructed while active, as (name, func)
    in creation order — mapInPandas/applyInPandas/pandas_udf/udf/
    spark.udf.register all construct through these two classes."""
    from contextlib import contextmanager

    import pyspark.sql.udf as _udf_mod
    import pyspark.sql.udtf as _udtf_mod

    targets = [
        _udf_mod.UserDefinedFunction,
        _udtf_mod.UserDefinedTableFunction,
    ]

    def _preseed():
        """Module-level UDF objects (``@pandas_udf`` at import time, e.g.
        ``functions/udx.py``) were constructed before any capture window
        — scan already-imported package modules for them, in sorted
        (module, attr-definition) order so provenance (pre-seed vs
        build-time construction) can't reorder the folded sequence."""
        out = []
        for mname in sorted(sys.modules):
            if not mname.startswith(_PKG):
                continue
            mod = sys.modules[mname]
            for attr, v in vars(mod).items():
                # @pandas_udf / @udf return a WRAPPED plain function
                # carrying func/returnType/evalType attributes (not a
                # UserDefinedFunction instance); @udtf returns the
                # UserDefinedTableFunction itself — accept both shapes
                is_udf = isinstance(v, tuple(targets)) or (
                    callable(v)
                    and hasattr(v, "func")
                    and hasattr(v, "evalType")
                    and hasattr(v, "returnType")
                )
                if is_udf:
                    func = getattr(v, "func", None)
                    if func is not None:
                        name = getattr(v, "_name", None) or getattr(
                            v, "__name__", None
                        ) or getattr(func, "__name__", "?")
                        out.append((name, func))
        return out

    @contextmanager
    def _cm():
        into.extend(_preseed())
        saved = [(c, c.__init__) for c in targets]

        def _wrap(orig):
            def __init__(self, func, *a, **kw):  # noqa: N807
                orig(self, func, *a, **kw)
                name = getattr(self, "_name", None) or getattr(
                    func, "__name__", "?"
                )
                into.append((name, func))

            return __init__

        for c, orig in saved:
            c.__init__ = _wrap(orig)
        try:
            yield
        finally:
            for c, orig in saved:
                c.__init__ = orig

    return _cm()


def _python_plan_nodes(plan_json: str) -> tuple[set[str], list[str]]:
    """Walk the optimized plan's JSON: return (names of PythonUDF/UDTF/
    UDAF expressions, uncovered python-ish class basenames)."""
    names: set[str] = set()
    uncovered: list[str] = []
    seen_any = [False]

    def walk(node):
        if isinstance(node, dict):
            cls = node.get("class", "")
            base = cls.rsplit(".", 1)[-1]
            if _PY_CLASS_RE.search(base):
                seen_any[0] = True
                if base in _PY_NAMED_CLASSES:
                    nm = node.get("name")
                    names.add(nm if isinstance(nm, str) else "?")
                elif base not in _PY_WRAPPER_CLASSES:
                    uncovered.append(base)
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for x in node:
                walk(x)

    try:
        walk(json.loads(plan_json))
    except (ValueError, RecursionError):
        uncovered.append("plan_json_unparsed")
        seen_any[0] = True
    # backstop: the old substring markers catch python-ness the
    # structural walk missed (an unknown rendering) — refuse clearing
    if not seen_any[0] and any(m in plan_json.lower() for m in _PY_MARKERS):
        uncovered.append("python_marker_unparsed")
    return names, uncovered


#: bound on the reflective expression walk — far above any real plan
#: (the widest registry plan is ~2k expression nodes); hitting it refuses
#: clearing rather than hashing a truncated mode list
_EVAL_MODE_NODE_CAP = 50_000


def _eval_modes(jplan) -> tuple[list[str], bool]:
    """Collect ``ClassSimpleName:EVALMODE`` for every expression node that
    carries an ``evalMode`` (Divide/Cast/Add/… LEGACY|ANSI|TRY), in tree
    order, by reflecting over the LIVE Catalyst tree — neither the plan
    string nor ``toJSON`` renders the mode (scheme-8 rationale above).

    Returns (modes, truncated). Subquery expressions' inner plans are
    walked too (reflected ``plan()``).
    """
    out: list[str] = []
    #: class name -> does it expose evalMode()/plan()? py4j invokes by
    #: name (java.lang.reflect.getMethod is a varargs call py4j can't
    #: make); the cache keeps the absent-method exception to once per
    #: class, not once per node
    has_mode: dict[str, bool] = {}
    has_plan: dict[str, bool] = {}
    budget = [_EVAL_MODE_NODE_CAP]

    def walk_expr(e) -> bool:
        if budget[0] <= 0:
            return False
        budget[0] -= 1
        cls = e.getClass().getName()
        if has_mode.get(cls, True):
            try:
                out.append(
                    cls.rsplit(".", 1)[-1] + ":" + str(e.evalMode())
                )
                has_mode[cls] = True
            except Exception:
                has_mode[cls] = False
        if has_plan.get(cls, True):  # SubqueryExpression carries a sub-plan
            try:
                sub = e.plan()
                has_plan[cls] = True
            except Exception:
                has_plan[cls] = False
                sub = None
            if sub is not None and not walk_plan(sub):
                return False
        ch = e.children()
        for i in range(ch.size()):
            if not walk_expr(ch.apply(i)):
                return False
        return True

    def walk_plan(p) -> bool:
        if budget[0] <= 0:
            return False
        budget[0] -= 1
        try:
            exprs = p.expressions()
        except Exception:
            return True  # a plan()-shaped object that isn't a LogicalPlan
        for i in range(exprs.size()):
            if not walk_expr(exprs.apply(i)):
                return False
        ch = p.children()
        for i in range(ch.size()):
            if not walk_plan(ch.apply(i)):
                return False
        return True

    complete = walk_plan(jplan)
    return out, not complete


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


def plan_hash(df, captured=None) -> dict:
    """hash + clearability for one built DataFrame (see module doc).

    ``captured`` is the ``[(name, callable), ...]`` list recorded by
    :func:`_capture_udfs` around THIS query's build. Scheme 6: when every
    named Python expression in the plan matches a captured UDF and the
    captured closures fingerprint cleanly, the closure digest folds into
    the hash and the plan stays clearable; otherwise a python reason
    refuses clearing exactly as schemes 1–5 did.

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
    closure: str | None = None
    try:
        j = df._jdf.queryExecution().optimizedPlan().toJSON()
        udf_names, uncovered = _python_plan_nodes(j)
    except Exception:
        udf_names, uncovered = set(), ["plan_json_failed"]
    python_free = not udf_names and not uncovered
    if uncovered:
        reasons.append(
            "python_node_uncovered:" + ",".join(sorted(set(uncovered)))
        )
    elif udf_names:
        cap = captured or []
        missing = udf_names - {n for n, _ in cap}
        if missing:
            # a plan UDF not constructed during this build (e.g. a
            # session-registered function reused by name) — its body is
            # outside the fingerprint, so equality would be unsound
            reasons.append("python_udf_unmatched:" + ",".join(sorted(missing)))
        else:
            closure, fp_reasons = closure_fingerprint(
                [(n, f) for n, f in cap if n in udf_names]
            )
            if closure is None:
                reasons.append(
                    "python_closure_opaque:" + ",".join(fp_reasons[:3])
                )
    # scheme 8: evalModes are invisible to both the plan string and the
    # JSON — read them off the live tree; an incomplete walk is unsound
    try:
        modes, truncated = _eval_modes(df._jdf.queryExecution().optimizedPlan())
        if truncated:
            reasons.append("evalmode_walk_truncated")
    except Exception:
        modes = ["evalmode_walk_failed"]
        reasons.append("evalmode_walk_failed")
    rdd_free = not any(
        r in reasons
        for r in ("rdd_leaf", "tostring_truncated", "input_files_failed",
                  "no_scan_files")
    )
    h = hashlib.sha256()
    h.update(plan.encode())
    h.update(b"\0")
    h.update("\n".join(files).encode())
    h.update(b"\0evalmodes\0")
    h.update("\n".join(modes).encode())
    if closure is not None:
        h.update(b"\0closure\0")
        h.update(closure.encode())
    return {
        "hash": h.hexdigest(),
        "clearable": not reasons,
        "python_free": python_free,
        "rdd_free": rdd_free,
        "closure": closure,
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
                cap: list = []
                with _capture_udfs(cap), _identity_checkpoints():
                    df = fns[name](spark, args.sf)
                out[name] = plan_hash(df, cap)
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

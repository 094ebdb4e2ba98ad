"""Bit-equality pins for the numpy fold kernels (functions/vector_np.py).

The r12 open replaced fold_gram's allocate-two-(n×m)-arrays-per-dimension
form (``acc = acc + np.outer(...)``) with a row-tiled in-place form
(docs/R12_PLAN.md §4: measured 2.8× on 4096²×64 block pairs). Row tiling
never reorders any cell's fold — each acc[p, q] still accumulates
``a[p, i] * b[q, i]`` in dimension order — so the result must be
BIT-identical to the old kernel. This test pins that, with shapes chosen
to straddle the 256-row tile boundary, plus a scalar left-fold spot check
so the semantics stay the engine's fold (not BLAS order).
"""

from __future__ import annotations

import numpy as np
import pytest

from duckdb_nats_jetstream_spark.functions.vector_np import (
    _GRAM_TILE,
    fold_d2,
    fold_gram,
    fold_norms,
    fold_sq_norms,
    pairwise_cosine,
)


def _fold_gram_untiled(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """The pre-r12 kernel, verbatim: the bit-equality reference."""
    acc = np.zeros((a.shape[0], b.shape[0]))
    for i in range(a.shape[1]):
        acc = acc + np.outer(a[:, i], b[:, i])
    return acc


@pytest.mark.parametrize(
    "n,m,d",
    [
        (1, 1, 1),
        (7, 5, 3),
        (255, 300, 64),  # just under one tile
        (256, 64, 64),  # exactly one tile
        (256 + 17, 129, 64),  # straddles the tile boundary
        (3 * _GRAM_TILE + 1, 37, 16),  # several tiles + remainder
    ],
)
def test_fold_gram_bit_identical_to_untiled(n: int, m: int, d: int) -> None:
    rng = np.random.default_rng(n * 1_000_003 + m * 101 + d)
    a = rng.standard_normal((n, d))
    b = rng.standard_normal((m, d))
    new = fold_gram(a, b)
    old = _fold_gram_untiled(a, b)
    assert new.shape == old.shape
    # bitwise, not allclose: the whole point is IEEE op-sequence identity
    assert np.array_equal(
        new.view(np.uint64), old.view(np.uint64)
    ), "tiled fold_gram diverged bitwise from the untiled reference"


def test_fold_gram_degenerate_shapes() -> None:
    assert fold_gram(np.zeros((0, 4)), np.zeros((3, 4))).shape == (0, 3)
    assert fold_gram(np.zeros((3, 4)), np.zeros((0, 4))).shape == (3, 0)
    z = fold_gram(np.ones((2, 0)), np.ones((3, 0)))
    assert z.shape == (2, 3) and not z.any()


def test_fold_gram_matches_scalar_left_fold() -> None:
    """Spot-check a few cells against a pure-Python left fold — the engine's
    dot semantics (functions.vector.dot; DuckDB list_reduce mirror)."""
    rng = np.random.default_rng(42)
    a = rng.standard_normal((300, 64))
    b = rng.standard_normal((40, 64))
    g = fold_gram(a, b)
    for p, q in [(0, 0), (255, 39), (256, 0), (299, 17)]:
        acc = 0.0
        for i in range(64):
            acc = acc + float(a[p, i]) * float(b[q, i])
        assert g[p, q] == acc


def test_downstream_kernels_bit_stable() -> None:
    """pairwise_cosine / fold_d2 compose fold_gram with elementwise ops;
    pin them against compositions built on the untiled reference."""
    rng = np.random.default_rng(7)
    a = rng.standard_normal((260, 32))
    b = rng.standard_normal((70, 32))
    cos_ref = _fold_gram_untiled(a, b) / np.outer(fold_norms(a), fold_norms(b))
    assert np.array_equal(pairwise_cosine(a, b), cos_ref)
    d2_ref = (
        fold_sq_norms(a)[:, None] - 2.0 * _fold_gram_untiled(a, b)
    ) + fold_sq_norms(b)[None, :]
    assert np.array_equal(fold_d2(a, b), d2_ref)

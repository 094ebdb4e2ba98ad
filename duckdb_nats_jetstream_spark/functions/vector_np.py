"""Numpy kernels for quadratic vector workloads that reproduce the engine's
fold semantics bit-for-bit.

The engine's dot product is a *left fold over doubles in index order*
(``functions.vector.dot``; mirrored by DuckDB ``list_reduce``). A plain
``numpy.dot``/``matmul`` would NOT match — BLAS uses blocked/SIMD summation
orders. These kernels instead loop over the 64 dimensions and accumulate an
outer product per dimension:

    acc = 0; for i in dims: acc += outer(A[:, i], B[:, i])

— vectorized over *pairs*, sequential over *dimensions*, so each pair's
accumulation performs the identical IEEE operation sequence as the column
fold. sqrt / divide / multiply are elementwise single ops, also identical.
"""

from __future__ import annotations

import numpy as np


def fold_norms(m: np.ndarray) -> np.ndarray:
    """sqrt of the fold-ordered self-dot, per row of an (n, d) float64 matrix."""
    acc = np.zeros(m.shape[0])
    for i in range(m.shape[1]):
        acc = acc + m[:, i] * m[:, i]
    return np.sqrt(acc)


#: Row-tile height for :func:`fold_gram`. 256 keeps the (tile × m)
#: accumulator cache-resident across all dimension passes; the r11 sweep
#: measured 256 → 1.47 s/block-pair vs 4.06 s for the untiled
#: allocate-per-dim form on 4096²×64 (512 → 2.10, 1024 → 2.14, 2048 → 2.43).
_GRAM_TILE = 256


def fold_gram(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n, m) matrix of fold-ordered dot products between rows of a and b.

    Row-tiled and in-place: per-cell the accumulation is still
    ``for i in dims: acc[p, q] += a[p, i] * b[q, i]`` in dimension order —
    identical IEEE op sequence to the untiled ``acc = acc + np.outer(...)``
    form (row tiling never reorders any cell's fold) — but the working set
    is one (tile × m) accumulator plus one scratch buffer instead of two
    fresh (n × m) arrays per dimension (~17 GB of allocator traffic per
    4096² block pair before this change)."""
    n, m, d = a.shape[0], b.shape[0], a.shape[1]
    acc = np.zeros((n, m))
    if n == 0 or m == 0 or d == 0:
        return acc
    tmp = np.empty((min(_GRAM_TILE, n), m))
    for r0 in range(0, n, _GRAM_TILE):
        r1 = min(r0 + _GRAM_TILE, n)
        at = a[r0:r1]
        tile = acc[r0:r1]
        t = tmp[: r1 - r0]
        for i in range(d):
            np.outer(at[:, i], b[:, i], out=t)
            tile += t
    return acc


def pairwise_cosine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """cos[p, q] = dot(a_p, b_q) / (|a_p| * |b_q|), fold-exact."""
    return fold_gram(a, b) / np.outer(fold_norms(a), fold_norms(b))


def fold_sq_norms(m: np.ndarray) -> np.ndarray:
    """fold-ordered self-dot (no sqrt), per row."""
    acc = np.zeros(m.shape[0])
    for i in range(m.shape[1]):
        acc = acc + m[:, i] * m[:, i]
    return acc


def fold_d2(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Squared euclidean distances with every term fold-exact and the
    combining ops in a FIXED order — ``(xx − 2·gram) + cc`` — so a SQL
    mirror evaluating ``(dot(x,x) - 2.0*dot(x,c)) + dot(c,c)`` with the
    same left-fold dots reproduces every distance bit-for-bit (×2 is a
    power-of-two multiply, exact). The BLAS form in ``_d2`` is faster but
    not mirrorable; use this one wherever an oracle compares."""
    return (fold_sq_norms(X)[:, None] - 2.0 * fold_gram(X, C)) + fold_sq_norms(C)[
        None, :
    ]

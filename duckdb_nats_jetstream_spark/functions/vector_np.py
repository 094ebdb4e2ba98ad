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


def fold_gram(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n, m) matrix of fold-ordered dot products between rows of a and b."""
    acc = np.zeros((a.shape[0], b.shape[0]))
    for i in range(a.shape[1]):
        acc = acc + np.outer(a[:, i], b[:, i])
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

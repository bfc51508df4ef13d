"""Unrolled small-SPD linear algebra for the sweep hot path.

``jnp.linalg.cholesky`` + ``solve_triangular`` on (B·A, M, M) batches of
tiny matrices (M ≈ 9) lower to sequential LAPACK-style loops that leave
the MXU idle — profiled at ~1000× off roofline for the all-action
Kalman sweep.  For static small M we instead unroll the Cholesky
factorization, triangular inversion, and S⁻¹ = L⁻ᵀL⁻¹ product into a
few hundred *fused elementwise ops on batch-shaped vectors* (pure VPU
work), after which the sweep's remaining math is batched GEMMs (MXU).

All functions treat the last two axes as the matrix and broadcast over
arbitrary leading batch axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def unrolled_cholesky(S: jnp.ndarray) -> list:
    """Lower Cholesky factor of (..., M, M) SPD matrices, returned as a
    list-of-lists of (...) batch arrays (L[i][j] for j <= i)."""
    M = S.shape[-1]
    L = [[None] * M for _ in range(M)]
    for j in range(M):
        acc = S[..., j, j]
        for k in range(j):
            acc = acc - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(acc, 1e-30))
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, M):
            acc = S[..., i, j]
            for k in range(j):
                acc = acc - L[i][k] * L[j][k]
            L[i][j] = acc * inv_d
    return L


def _invert_lower(L: list, M: int) -> list:
    """Inverse of an unrolled lower-triangular factor (forward subst.)."""
    Li = [[None] * M for _ in range(M)]
    for j in range(M):
        Li[j][j] = 1.0 / L[j][j]
        for i in range(j + 1, M):
            acc = None
            for k in range(j, i):
                t = L[i][k] * Li[k][j]
                acc = t if acc is None else acc + t
            Li[i][j] = -acc / L[i][i]
    return Li


def spd_inverse(S: jnp.ndarray) -> jnp.ndarray:
    """Explicit inverse of small SPD matrices: S⁻¹ = L⁻ᵀ L⁻¹ with an
    unrolled Cholesky — no sequential solve ops in the compiled program."""
    M = S.shape[-1]
    L = unrolled_cholesky(S)
    Li = _invert_lower(L, M)
    # S⁻¹[i][j] = Σ_k Li[k][i] · Li[k][j]  (k ≥ max(i, j))
    rows = []
    for i in range(M):
        cols = []
        for j in range(M):
            lo = max(i, j)
            acc = None
            for k in range(lo, M):
                t = Li[k][i] * Li[k][j]
                acc = t if acc is None else acc + t
            cols.append(acc)
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def spd_cholesky_dense(S: jnp.ndarray) -> jnp.ndarray:
    """Dense (..., M, M) lower Cholesky via the unrolled recurrence —
    drop-in for jnp.linalg.cholesky on tiny matrices."""
    M = S.shape[-1]
    L = unrolled_cholesky(S)
    rows = []
    zero = jnp.zeros_like(S[..., 0, 0])
    for i in range(M):
        cols = [L[i][j] if j <= i else zero for j in range(M)]
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)

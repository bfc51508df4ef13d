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


def cholesky_ll(S_get, M: int) -> list:
    """Lower Cholesky factor from an ENTRY GETTER ``S_get(i, j) -> (...)
    batch array`` (i >= j), returned as a list-of-lists L[i][j] (j <= i).

    Taking entries as individually shaped arrays (instead of one stacked
    (..., M, M) tensor) lets callers hand XLA entry vectors that are
    CONTIGUOUS in the batch dimension — the stacked layout's [..., i, j]
    slices are stride-M² gathers, which is where the batched unrolled
    inverse loses an order of magnitude on TPU (see
    docs/PERFORMANCE.md r5 sweep profile)."""
    L = [[None] * M for _ in range(M)]
    for j in range(M):
        acc = S_get(j, j)
        for k in range(j):
            acc = acc - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(acc, 1e-30))
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, M):
            acc = S_get(i, j)
            for k in range(j):
                acc = acc - L[i][k] * L[j][k]
            L[i][j] = acc * inv_d
    return L


def unrolled_cholesky(S: jnp.ndarray) -> list:
    """Lower Cholesky factor of (..., M, M) SPD matrices, returned as a
    list-of-lists of (...) batch arrays (L[i][j] for j <= i)."""
    return cholesky_ll(lambda i, j: S[..., i, j], S.shape[-1])


def spd_trace_product(S_get, G_get, M: int) -> jnp.ndarray:
    """tr(S⁻¹ · G) for SPD S and SYMMETRIC G, both given as entry
    getters ``(i, j) -> (...) batch array`` with i >= j (lower triangle).

    This is the whole per-action output of the all-action Kalman sweep
    (gain_a = Σ_{ij} S⁻¹∘G, ops/kalman.py) fused into one unrolled
    elementwise program: Cholesky → triangular inverse → Σ_{i>=j}
    (2−δ_ij)·S⁻¹[i,j]·G[i,j], never materializing S⁻¹ (or even stacked
    S/G tensors) in HBM."""
    L = cholesky_ll(S_get, M)
    Li = _invert_lower(L, M)
    total = None
    for i in range(M):
        for j in range(i + 1):
            # S⁻¹[i][j] = Σ_{k >= i} Li[k][i] · Li[k][j]   (i >= j)
            acc = None
            for k in range(i, M):
                t = Li[k][i] * Li[k][j]
                acc = t if acc is None else acc + t
            term = acc * G_get(i, j)
            if i != j:
                term = term + term
            total = term if total is None else total + term
    return total


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

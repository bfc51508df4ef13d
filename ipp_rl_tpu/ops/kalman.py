"""Batched Kalman-filter belief updates — the numerical heart.

The reference runs a Cholesky-based covariance update per candidate
action inside a ``multiprocessing.Pool`` (reference
mapping/mappings.py:155-215, planning/common/optimization.py:86-90).
Here the same math is expressed as pure batched linear algebra so XLA
tiles it onto the MXU:

  S  = H P Hᵀ + R             (innovation, symmetrized)
  L  = chol(S)                (lower)
  Wc = P Hᵀ L⁻ᵀ               (whitened gain factor)
  P' = P − Wc Wcᵀ             (covariance update)
  x' = x + Wc L⁻¹ (z − H x)   (mean update;  K = Wc L⁻¹ L⁻ᵀ... collapses)

Two key identities drive the planner fast path:

  * trace(P) − trace(P') = ‖Wc‖²_F  — so pricing an action needs only Wc,
    never the full (N, N) posterior;
  * with an adaptive region-of-interest mask m, the masked trace
    reduction is Σᵢ mᵢ ‖Wc[i, :]‖².

All functions broadcast over arbitrary leading batch axes via vmap and
use static shapes (padded measurement rows are exact no-ops, see
ops/sensor_model.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def _innovation_chol(
    P: jnp.ndarray, H: jnp.ndarray, R_diag: jnp.ndarray, jitter: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (PHt, L) with S = H P Hᵀ + diag(R) symmetrized and
    L = chol(S) lower-triangular.  P: (N, N), H: (M, N), R_diag: (M,)."""
    PHt = P @ H.T  # (N, M)
    S = H @ PHt + jnp.diag(R_diag)
    S = 0.5 * (S + S.T)
    if jitter:
        S = S + jitter * jnp.eye(S.shape[0], dtype=S.dtype)
    L = jnp.linalg.cholesky(S)
    return PHt, L


def kf_gain_factor(
    P: jnp.ndarray, H: jnp.ndarray, R_diag: jnp.ndarray, jitter: float = 0.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whitened gain factor Wc = P Hᵀ L⁻ᵀ and L = chol(S).

    Returns (Wc (N, M), L (M, M)).  trace reduction = ‖Wc‖²_F.
    """
    PHt, L = _innovation_chol(P, H, R_diag, jitter)
    # Wcᵀ = L⁻¹ (PHᵀ)ᵀ  — one triangular solve, no explicit inverse
    WcT = solve_triangular(L, PHt.T, lower=True)
    return WcT.T, L


def kf_update(
    P: jnp.ndarray,
    mean: jnp.ndarray,
    H: jnp.ndarray,
    R_diag: jnp.ndarray,
    z: Optional[jnp.ndarray] = None,
    jitter: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full Kalman commit: returns (mean', P').

    mean is the flattened (N,) belief mean; z the (M,) observation
    (padded entries are ignored because the matching Wc columns are 0).
    Pass ``z=None`` for a covariance-only update (planner rollouts,
    reference mapping/mappings.py:114-153 ``cov_only``).
    """
    Wc, L = kf_gain_factor(P, H, R_diag, jitter)
    P_next = P - Wc @ Wc.T
    P_next = 0.5 * (P_next + P_next.T)
    if z is None:
        return mean, P_next
    v = z - H @ mean
    # x' = x + Wc L⁻¹ v   (K v = Wc L⁻¹ ... see module docstring)
    u = solve_triangular(L, v, lower=True)
    # second whitening: K = PHᵀS⁻¹ = Wc L⁻¹ ⇒ K v = Wc (L⁻¹ v)... but
    # Wc = PHᵀ L⁻ᵀ so K v = PHᵀ L⁻ᵀ L⁻¹ v = Wc u with u = L⁻¹ v.  ✓
    mean_next = mean + Wc @ u
    return mean_next, P_next


def kf_trace_reduction(
    P: jnp.ndarray,
    H: jnp.ndarray,
    R_diag: jnp.ndarray,
    diag_mask: Optional[jnp.ndarray] = None,
    jitter: float = 0.0,
) -> jnp.ndarray:
    """Masked trace reduction of a hypothetical update, without forming P'."""
    Wc, _ = kf_gain_factor(P, H, R_diag, jitter)
    sq = jnp.sum(Wc * Wc, axis=-1)  # (N,) per-cell variance reduction
    if diag_mask is not None:
        sq = sq * diag_mask
    return jnp.sum(sq)


def kf_sweep_gains(
    P: jnp.ndarray,
    H_all: jnp.ndarray,
    R_all: jnp.ndarray,
    diag_mask: Optional[jnp.ndarray] = None,
    jitter: float = 0.0,
) -> jnp.ndarray:
    """Trace reduction for EVERY action at once — the greedy/MCTS sweep.

    Replaces the reference's process-pool loop over the action set
    (reference planning/common/optimization.py:82-90) with three fused
    batched GEMMs + one batched Cholesky:

      P: (N, N), H_all: (A, M, N), R_all: (A, M) → gains (A,)

    The P·Hᵀ contraction is arranged as a single (N × N) × (N × A·M)
    matmul — ideal MXU shape once vmapped over missions.
    """
    A, M, N = H_all.shape
    H_flat = H_all.reshape(A * M, N)
    PHt = (P @ H_flat.T).reshape(N, A, M)  # (N, A, M)
    PHt = jnp.moveaxis(PHt, 1, 0)  # (A, N, M)
    S = jnp.einsum(
        "amn,ank->amk", H_all, PHt, preferred_element_type=PHt.dtype
    )  # (A, M, M)
    S = 0.5 * (S + jnp.swapaxes(S, -1, -2))
    S = S + jax.vmap(jnp.diag)(R_all)
    if jitter:
        S = S + jitter * jnp.eye(M, dtype=S.dtype)
    L = jnp.linalg.cholesky(S)  # (A, M, M)
    WcT = jax.vmap(lambda l, pht: solve_triangular(l, pht.T, lower=True))(L, PHt)
    sq = jnp.sum(WcT * WcT, axis=1)  # (A, N) — per-cell reductions
    if diag_mask is not None:
        sq = sq * diag_mask[None, :]
    return jnp.sum(sq, axis=-1)  # (A,)

"""Sharded Kalman kernels — scaling beyond one chip's HBM/FLOPs.

Two shardings cover the framework's scale axes (SURVEY.md §5: the N²
covariance is the state that outgrows one device — the "sequence
parallel" analogue):

  * ``sharded_kf_update``: the (N, N) covariance is sharded by ROWS over
    the mesh's ``mp`` axis.  Per device: local PHt (no comm), innovation
    assembled with one psum of an (M, M) block, gains applied after one
    all_gather of the (N, M) PHt — communication is O(N·M), the O(N²)
    state never moves.
  * ``sharded_sweep_gains``: candidate-action evaluation sharded over
    the ACTION axis (each device prices A/d actions against a replicated
    P) with an all_gather of the (A,) gains — the pod-level version of
    the reference's candidate-evaluation pool
    (reference planning/common/optimization.py:86-90).

Mission-batch (dp) sharding needs no custom kernels: batched planners
are pure vmapped programs, so sharding the batch axis via NamedSharding
lets XLA partition them (see parallel/mesh.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ipp_rl_tpu.ops.smallchol import spd_inverse


def sharded_kf_update(
    mesh: Mesh,
    cov: jnp.ndarray,  # (N, N) — will be row-sharded over "mp"
    mean: jnp.ndarray,  # (N,)  — row-sharded
    H: jnp.ndarray,  # (M, N) — replicated
    R_diag: jnp.ndarray,  # (M,) — replicated
    z: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Kalman commit with the covariance sharded across devices.

    Matches ops/kalman.kf_update numerically; designed for grids whose
    N×N covariance exceeds one device.
    """

    def kernel(P_loc, mean_loc, H_rep, R_rep, z_rep):
        # P_loc: (N/d, N) — this device's rows; column index is global.
        my = jax.lax.axis_index("mp")
        n_loc = P_loc.shape[0]
        # local slice of H columns matching our rows: H[:, my*n_loc : ...]
        H_loc = jax.lax.dynamic_slice_in_dim(H_rep, my * n_loc, n_loc, axis=1)
        PHt_loc = P_loc @ H_rep.T  # (N/d, M) — local rows of PHt
        # S = H P Hᵀ = Σ_d H[:, rows_d] @ PHt_d  → psum
        S_part = H_loc @ PHt_loc
        S = jax.lax.psum(S_part, "mp") + jnp.diag(R_rep)
        S = 0.5 * (S + S.T)
        S_inv = spd_inverse(S)
        K_loc = PHt_loc @ S_inv  # (N/d, M) local gain rows
        # P' = P − K PHtᵀ needs the full PHt: all_gather (N, M) — small
        PHt_full = jax.lax.all_gather(PHt_loc, "mp", axis=0, tiled=True)
        P_next = P_loc - K_loc @ PHt_full.T
        if z_rep is None:
            return P_next, mean_loc
        mean_full = jax.lax.all_gather(mean_loc, "mp", axis=0, tiled=True)
        v = z_rep - H_rep @ mean_full
        return P_next, mean_loc + K_loc @ v

    specs_in = (
        P("mp", None),  # cov rows
        P("mp"),  # mean
        P(),  # H replicated
        P(),  # R replicated
        P(),  # z replicated
    )
    specs_out = (P("mp", None), P("mp"))
    fn = shard_map(
        kernel, mesh=mesh, in_specs=specs_in, out_specs=specs_out,
        check_vma=False,
    )
    if z is None:
        z = jnp.zeros((H.shape[0],), cov.dtype)
        # covariance-only: reuse kernel but ignore mean update

        def kernel_cov(P_loc, mean_loc, H_rep, R_rep, z_rep):
            out_P, _ = kernel(P_loc, mean_loc, H_rep, R_rep, None)
            return out_P, mean_loc

        fn = shard_map(
            kernel_cov, mesh=mesh, in_specs=specs_in, out_specs=specs_out,
            check_vma=False,
        )
    P_next, mean_next = fn(cov, mean, H, R_diag, z)
    # symmetrize on the host-side result (cheap elementwise)
    P_next = 0.5 * (P_next + P_next.T)
    return mean_next, P_next


def sharded_sweep_gains(
    mesh: Mesh,
    cov: jnp.ndarray,  # (N, N) replicated
    H_all: jnp.ndarray,  # (A, M, N) — sharded over "mp" action axis
    R_all: jnp.ndarray,  # (A, M)
    diag_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """All-action trace reductions with the action axis sharded across
    devices; one tiled all_gather returns the full (A,) gains."""
    from ipp_rl_tpu.ops.kalman import kf_sweep_gains

    mask = diag_mask if diag_mask is not None else jnp.ones(cov.shape[0], cov.dtype)

    def kernel(P_rep, H_loc, R_loc, mask_rep):
        gains_loc = kf_sweep_gains(P_rep, H_loc, R_loc, mask_rep)
        return jax.lax.all_gather(gains_loc, "mp", axis=0, tiled=True)

    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(), P("mp", None, None), P("mp", None), P()),
        out_specs=P(),
        check_vma=False,  # all_gather output IS replicated; checker can't infer
    )
    return fn(cov, H_all, R_all, mask)

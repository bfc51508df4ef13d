"""Pallas TPU kernels for the small-matrix hot ops.

``spd_inverse_pallas``: single-pass batched inverse of tiny SPD
innovation matrices (M ≈ 9).  The XLA path (ops/smallchol.py) already
avoids sequential solves by unrolling; this kernel additionally
guarantees ONE HBM read + ONE HBM write for the whole factor→invert→
multiply chain, with every intermediate living in VMEM/registers.

Layout: matrices are stored entries-major — the (B, M, M) batch is
transposed to (M², B) so each matrix entry is a lane-contiguous row and
every unrolled operation is a (1, TB) VPU op across the batch tile.
The grid streams batch tiles; M is a static Python constant so the
whole Cholesky/inversion recurrence unrolls at trace time.

Used behind a flag (``use_pallas``) with the XLA unrolled path as the
default — numerics are identical (same recurrence), validated against
numpy in tests (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _spd_inverse_kernel(M: int, s_ref, out_ref):
    """One batch tile: s_ref/out_ref are (M*M, TB) VMEM blocks."""

    def ent(i, j):
        return s_ref[i * M + j, :]

    # Cholesky factor L (lower), unrolled; entries are (TB,) vectors
    L = [[None] * M for _ in range(M)]
    for j in range(M):
        acc = ent(j, j)
        for k in range(j):
            acc = acc - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(acc, 1e-30))
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, M):
            acc = ent(i, j)
            for k in range(j):
                acc = acc - L[i][k] * L[j][k]
            L[i][j] = acc * inv_d

    # forward substitution: Li = L^{-1}
    Li = [[None] * M for _ in range(M)]
    for j in range(M):
        Li[j][j] = 1.0 / L[j][j]
        for i in range(j + 1, M):
            acc = None
            for k in range(j, i):
                t = L[i][k] * Li[k][j]
                acc = t if acc is None else acc + t
            Li[i][j] = -acc / L[i][i]

    # S⁻¹ = Liᵀ Li
    for i in range(M):
        for j in range(M):
            lo = max(i, j)
            acc = None
            for k in range(lo, M):
                t = Li[k][i] * Li[k][j]
                acc = t if acc is None else acc + t
            out_ref[i * M + j, :] = acc


def spd_inverse_pallas(
    S: jnp.ndarray, tile: int = 512, interpret: bool = False
) -> jnp.ndarray:
    """Inverse of (..., M, M) SPD matrices via a fused Pallas kernel."""
    *batch, M, M2 = S.shape
    assert M == M2, "square matrices required"
    B = 1
    for b in batch:
        B *= b
    flat = S.reshape(B, M * M).T  # (M², B) entries-major
    pad = (-B) % tile
    if pad:
        # pad with identity matrices so the Cholesky stays defined
        eye = jnp.eye(M, dtype=S.dtype).reshape(M * M, 1)
        flat = jnp.concatenate(
            [flat, jnp.broadcast_to(eye, (M * M, pad))], axis=1
        )
    Bp = flat.shape[1]

    out = pl.pallas_call(
        functools.partial(_spd_inverse_kernel, M),
        out_shape=jax.ShapeDtypeStruct((M * M, Bp), S.dtype),
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec((M * M, tile), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((M * M, tile), lambda i: (0, i)),
        interpret=interpret,
    )(flat)

    out = out[:, :B].T.reshape(*batch, M, M)
    return out

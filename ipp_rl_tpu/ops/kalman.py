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

# Backend toggle for the small-SPD inverse: the XLA unrolled path
# (ops/smallchol.py) is default; the Pallas kernel
# (ops/pallas_kernels.py) guarantees a single fused HBM pass.
_USE_PALLAS_INVERSE = False


def set_pallas_inverse(enabled: bool):
    global _USE_PALLAS_INVERSE
    _USE_PALLAS_INVERSE = bool(enabled)


def _small_spd_inverse(S: jnp.ndarray) -> jnp.ndarray:
    if _USE_PALLAS_INVERSE:
        from ipp_rl_tpu.ops.pallas_kernels import spd_inverse_pallas

        return spd_inverse_pallas(S)
    from ipp_rl_tpu.ops.smallchol import spd_inverse

    return spd_inverse(S)


def innovation_inverse(
    P: jnp.ndarray, H: jnp.ndarray, R_diag: jnp.ndarray, jitter: float = 0.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (PHt (N, M), S⁻¹ (M, M)) with S = H P Hᵀ + diag(R)
    symmetrized.  The inverse uses the UNROLLED small-SPD path
    (ops/smallchol.py): no sequential Cholesky/triangular-solve ops in
    the compiled program — batched callers (per-mission commits, per-sim
    tree edges) stay on the VPU/MXU."""
    PHt = P @ H.T  # (N, M)
    S = H @ PHt + jnp.diag(R_diag)
    S = 0.5 * (S + S.T)
    if jitter:
        S = S + jitter * jnp.eye(S.shape[0], dtype=S.dtype)
    return PHt, _small_spd_inverse(S)


def kf_gain_factor(
    P: jnp.ndarray, H: jnp.ndarray, R_diag: jnp.ndarray, jitter: float = 0.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whitened gain factor Wc with Wc Wcᵀ = P Hᵀ S⁻¹ H P.

    Returns (Wc (N, M), S⁻¹ (M, M)).  trace reduction = ‖Wc‖²_F.
    Wc = P Hᵀ U where U Uᵀ = S⁻¹ (U = chol of the inverse) — equivalent
    to the reference's P Hᵀ L⁻ᵀ up to an orthogonal factor, identical
    outer product (reference mapping/mappings.py:185-190).
    """
    from ipp_rl_tpu.ops.smallchol import spd_cholesky_dense

    PHt, S_inv = innovation_inverse(P, H, R_diag, jitter)
    U = spd_cholesky_dense(S_inv)
    return PHt @ U, S_inv


def kf_gain_factor_t(
    P: jnp.ndarray, H: jnp.ndarray, R_diag: jnp.ndarray, jitter: float = 0.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Transposed-layout whitened gain factor: (Wcᵀ (M, N), S⁻¹) with
    Wc·Wcᵀ = P·Hᵀ·S⁻¹·H·P — same algebra as :func:`kf_gain_factor`, in
    the TPU-native layout (see the cost-model note in kf_update: the M=9
    axis must stay in the SUBLANE position; vmapped GEMMs that read or
    write (..., M)-minor arrays cost ~1–2 ms each at large batch).  One
    batched GEMM (A = H·P); all (M, M) algebra is unrolled VPU work.

    Per-cell variance reduction: Σ_m Wcᵀ[m, n]² (axis −2); child
    covariance: P − einsum("mn,mc->nc", Wcᵀ, Wcᵀ)."""
    from ipp_rl_tpu.ops.smallchol import spd_cholesky_dense

    A = H @ P  # (M, N) — P is symmetric for every caller
    S = jnp.einsum("mn,kn->mk", A, H)
    S = 0.5 * (S + S.T) + jnp.diag(R_diag)
    if jitter:
        S = S + jitter * jnp.eye(S.shape[0], dtype=S.dtype)
    S_inv = _small_spd_inverse(S)
    U = spd_cholesky_dense(S_inv)  # lower, U·Uᵀ = S⁻¹
    WcT = _small_mm(jnp.swapaxes(U, -1, -2), A)  # Uᵀ·A = Wcᵀ
    return WcT, S_inv


def _small_mm(Sm: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """(…, M, M) @ (…, M, N) with the M² loop UNROLLED into broadcast
    multiply-adds over the (N,)-planes of X — no dot_general, so under
    vmap this is pure fused VPU work instead of another ~1–2 ms batched
    MXU pass (see the cost model note in kf_update)."""
    M = X.shape[-2]
    rows = []
    for m in range(M):
        acc = None
        for k in range(M):
            t = Sm[..., m, k][..., None] * X[..., k, :]
            acc = t if acc is None else acc + t
        rows.append(acc)
    return jnp.stack(rows, axis=-2)


def kf_update(
    P: jnp.ndarray,
    mean: jnp.ndarray,
    H: jnp.ndarray,
    R_diag: jnp.ndarray,
    z: Optional[jnp.ndarray] = None,
    jitter: float = 0.0,
    joseph: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full Kalman commit: returns (mean', P').

    mean is the flattened (N,) belief mean; z the (M,) observation
    (padded entries are ignored because the matching gain columns are 0).
    Pass ``z=None`` for a covariance-only update (planner rollouts,
    reference mapping/mappings.py:114-153 ``cov_only``).

    ``joseph=True`` commits via the Joseph-stabilized form
    P' = (I−KH)·P·(I−KH)ᵀ + K·diag(R)·Kᵀ — algebraically identical to the
    reference's P − Wc·Wcᵀ for the optimal gain (mappings.py:185-197),
    but PSD-preserving for ANY K, which the f32 on-device episode loop
    needs: the plain subtraction drifts P indefinite after tens of
    aggressive commits (negative pivots → exploding S⁻¹ → NaN beliefs —
    observed in 24-step self-play at batch 192).  float64 difference vs
    the reference form is O(ε·cond), ~1e-13 on the canonical workload.
    """
    # TPU cost model (measured, scripts/profile_micro.py + the scan-
    # length scaling test): at B=4096 every vmapped GEMM costs
    # ~0.7–2 ms almost regardless of its tiny per-mission shape, so the
    # commit is restructured to exactly THREE batched GEMMs — A = H·P,
    # S = A·Hᵀ, and one fused rank-3M covariance update — with all the
    # (M, M)-sized algebra (S⁻¹·A, S·Kᵀ) UNROLLED into broadcast
    # multiply-adds on (N,)-planes (pure VPU, fuses away).  The M axis
    # always sits in the SUBLANE position ((M, N) layout); no
    # (..., M)-minor array is ever materialized.  Joseph expanded (the
    # same polynomial — chains associate):
    #   (I−KH)·P·(I−KH)ᵀ + K·R·Kᵀ = P − K·A − Aᵀ·Kᵀ + K·S·Kᵀ
    # with S = H·P·Hᵀ + diag(R), evaluated as one k=3M GEMM:
    #   P' = P + [Kᵀ; A; Kᵀ]ᵀ · [−A; −Kᵀ; S·Kᵀ].
    A = H @ P  # (M, N) = (P·Hᵀ)ᵀ — P is kept symmetric every commit
    S = jnp.einsum("mn,kn->mk", A, H)  # H·P·Hᵀ, contraction on minor axes
    S = 0.5 * (S + S.T) + jnp.diag(R_diag)
    if jitter:
        S = S + jitter * jnp.eye(S.shape[0], dtype=S.dtype)
    S_inv = _small_spd_inverse(S)
    KT = _small_mm(S_inv, A)  # (M, N) = Kᵀ, unrolled VPU
    if joseph:
        SKT = _small_mm(S, KT)  # S·Kᵀ
        F = jnp.concatenate([KT, A, KT], axis=0)  # (3M, N)
        G = jnp.concatenate([-A, -KT, SKT], axis=0)
        P_next = P + jnp.einsum("mn,mc->nc", F, G)
    else:
        P_next = P - jnp.einsum("mn,mc->nc", KT, A)
    P_next = 0.5 * (P_next + P_next.T)
    if z is None:
        return mean, P_next
    v = z - H @ mean
    mean_next = mean + jnp.einsum("mn,m->n", KT, v)
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


def kf_sweep_gains_structured(
    P: jnp.ndarray,
    groups,
    perm: jnp.ndarray,
    diag_mask: Optional[jnp.ndarray] = None,
    jitter: float = 0.0,
    fast_math: bool = False,
) -> jnp.ndarray:
    """Structured all-action sweep exploiting the lattice's measurement
    geometry (ops/sensor_model.build_sweep_plan).

    The trace reduction of action a is

      gain_a = Σⱼ mⱼ (P Hᵀ S⁻¹ H P)ⱼⱼ = Σ_{mk} S_a⁻¹ ∘ (H_a Q H_aᵀ),
      S_a = H_a P H_aᵀ + diag(R_a),   Q = P·diag(m)·P,

    so only M×M blocks of two quadratic forms are ever needed:

      * rf == 1 actions have exact one-hot H rows → S and G blocks are
        pure gathers from P and Q (no GEMM, no streamed intermediate);
      * rf > 1 groups run the dense path with group-local row padding
        Mg ≪ global M, shrinking the streamed P·Hᵀ intermediate by
        (A·M)/(Ag·Mg) (4.5× on the canonical config).

    ``groups``: sequence of dicts with device arrays (idx order static):
      {"cells": (Ag, Mg) or None, "H": (Ag, Mg, N) or None,
       "R": (Ag, Mg), "vv": (Ag, Mg, Mg) valid-pair mask}
    ``perm``: (A,) gather permutation back to lattice order.

    Matches ``kf_sweep_gains`` (validated in tests/test_kalman.py).
    """
    acc_dt = P.dtype
    stream_dt = jnp.bfloat16 if fast_math else acc_dt
    need_q = any(g["cells"] is not None for g in groups)
    if need_q:
        # Q = P·diag(m)·P  ==  (P with columns scaled by m) @ P
        Pm = P if diag_mask is None else P * diag_mask[None, :].astype(acc_dt)
        Q = jnp.matmul(Pm, P, preferred_element_type=acc_dt)
    gains_parts = []
    for g in groups:
        R, vv = g["R"], g["vv"]
        if g["cells"] is not None:
            cells = g["cells"]  # (Ag, Mg)
            ii = cells[:, :, None]
            jj = cells[:, None, :]
            S = P[ii, jj] * vv + jax.vmap(jnp.diag)(R)
            G = Q[ii, jj] * vv
        else:
            H = g["H"]  # (Ag, Mg, N)
            Ag, Mg, N = H.shape
            H_flat = H.reshape(Ag * Mg, N).astype(stream_dt)
            PHt = jnp.matmul(
                P.astype(stream_dt), H_flat.T, preferred_element_type=stream_dt
            ).reshape(N, Ag, Mg)
            PHt = jnp.moveaxis(PHt, 1, 0)  # (Ag, N, Mg)
            S = jnp.einsum(
                "amn,ank->amk",
                H.astype(stream_dt),
                PHt,
                preferred_element_type=acc_dt,
            )
            S = 0.5 * (S + jnp.swapaxes(S, -1, -2)) + jax.vmap(jnp.diag)(R)
            PHm = (
                PHt
                if diag_mask is None
                else PHt * diag_mask[None, :, None].astype(stream_dt)
            )
            G = jnp.einsum(
                "anm,ank->amk", PHm, PHt, preferred_element_type=acc_dt
            )
        if jitter:
            S = S + jitter * jnp.eye(S.shape[-1], dtype=S.dtype)
        S_inv = _small_spd_inverse(S)
        gains_parts.append(
            jnp.einsum("amk,amk->a", S_inv, G, preferred_element_type=acc_dt)
        )
    return jnp.concatenate(gains_parts, axis=0)[perm]


def prepare_batched_sweep(plan, dtype=jnp.float32):
    """Device-constant bundle for :func:`kf_sweep_gains_batched` from a
    SweepPlan with grid dims + window metadata (ops/sensor_model.py
    ``build_sweep_plan(table, x_dim, y_dim)``).

    Returns None when the plan lacks grid dims (callers fall back to the
    vmapped per-mission structured sweep)."""
    import numpy as np

    if plan.x_dim is None or plan.y_dim is None or not plan.groups:
        return None
    gx, gy = plan.x_dim, plan.y_dim
    N = gx * gy
    groups = []
    for g in plan.groups:
        if g.win_radius is not None:
            r = g.win_radius
            F = 4 * r + 1  # relative-offset range per axis
            K = F * F
            # E[n, m, k] = 1 iff cell m is cell n shifted by offset k
            offs = [
                (dy, dx)
                for dy in range(-2 * r, 2 * r + 1)
                for dx in range(-2 * r, 2 * r + 1)
            ]
            E = np.zeros((N, N, K), np.float32)
            ys, xs = np.divmod(np.arange(N), gx)
            for k, (dy, dx) in enumerate(offs):
                ok = (ys + dy >= 0) & (ys + dy < gy) & (xs + dx >= 0) & (xs + dx < gx)
                n_ok = np.nonzero(ok)[0]
                E[n_ok, (ys[n_ok] + dy) * gx + xs[n_ok] + dx, k] = 1.0
            slots = [
                (dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)
            ]
            # diag add per slot: R at centre cells whose slot cell is
            # in-grid, 1.0 otherwise (keeps the padded block SPD)
            R_cells = np.ones((N,), np.float64)
            R_cells[np.asarray(g.win_centers)] = np.asarray(g.win_R)
            R_grid = R_cells.reshape(gy, gx)
            diag_add = np.ones((len(slots), gy, gx), np.float64)
            for si, (dy, dx) in enumerate(slots):
                vi = np.zeros((gy, gx), bool)
                vi[max(0, -dy): gy - max(0, dy), max(0, -dx): gx - max(0, dx)] = True
                diag_add[si] = np.where(vi, R_grid, 1.0)
            groups.append(
                {
                    "kind": "win",
                    "r": r,
                    "gy": gy,
                    "gx": gx,
                    "slots": slots,
                    "E": jnp.asarray(E, dtype),
                    "diag_add": jnp.asarray(diag_add, dtype),
                    "sel": jnp.asarray(np.asarray(g.win_centers)),
                }
            )
        elif g.H is not None:
            Ag, Mg, _ = g.H.shape
            groups.append(
                {
                    "kind": "dense",
                    "H_flat": jnp.asarray(g.H.reshape(Ag * Mg, N), dtype),
                    "H": jnp.asarray(g.H, dtype),
                    "R": jnp.asarray(g.R, dtype),
                }
            )
        else:
            # non-window gather group: keep the per-mission path
            groups.append(
                {
                    "kind": "gather",
                    "cells": jnp.asarray(g.cells),
                    "R": jnp.asarray(g.R, dtype),
                    "vv": jnp.asarray(
                        g.valid[:, :, None] & g.valid[:, None, :], dtype
                    ),
                }
            )
    needs_q = any(gr["kind"] in ("win", "gather", "dense") for gr in groups)
    return {
        "groups": groups,
        "perm": jnp.asarray(plan.perm),
        "needs_q": needs_q,
        "gy": gy,
        "gx": gx,
    }


def _window_group_gains(P, Q, g, jitter, stream_dt, acc_dt):
    """Gather-free rf==1 sweep: offset-diagonal planes + static slices.

    Every action's innovation block is S[i, j] = P[cell_i, cell_j] over
    the (2r+1)² window centred on its own cell.  Writing
    D[n, k] = P[n, shift_k(n)] (computed as ONE batched one-hot
    contraction — exact, since each output is a single P element), the
    block entry for ALL centre cells at once is a rectangular STATIC
    SLICE of the spatially padded D — replacing the 2·B·Ag·M² scalar
    gathers of the P[ii,jj] path (profiled ~4 ms each at B=4096,
    scripts/profile_sweep.py) with pure tiled data movement."""
    B, N, _ = P.shape
    r, gy, gx = g["r"], g["gy"], g["gx"]
    F = 4 * r + 1
    slots = g["slots"]
    E = g["E"].astype(stream_dt)

    def planes(M):
        # out[n, k, b] = Σ_m E[n, m, k] · M[b, n, m]  (batch n).  E is
        # one-hot, so each output is a SINGLE M element — exact at any
        # dtype; emitting stream_dt keeps the (CPU-tested) BF16×BF16=BF16
        # thunk and halves the D write under fast_math.
        D = jax.lax.dot_general(
            E,
            M.astype(stream_dt),
            dimension_numbers=(((1,), (2,)), ((0,), (1,))),
            preferred_element_type=stream_dt,
        ).astype(acc_dt)  # (N, K, B)
        D = D.reshape(gy, gx, F * F, B)
        return jnp.pad(D, ((r, r), (r, r), (0, 0), (0, 0)))

    DP, DQ = planes(P), planes(Q)

    def k_of(si, sj):
        (di, dj), (di2, dj2) = slots[si], slots[sj]
        return (di2 - di + 2 * r) * F + (dj2 - dj + 2 * r)

    def entry(D, si, sj):
        di, dj = slots[si]
        return D[di + r: di + r + gy, dj + r: dj + r + gx, k_of(si, sj), :]

    def sget(i, j):
        e = entry(DP, i, j)
        if i == j:
            e = e + g["diag_add"][i][..., None].astype(acc_dt)
            if jitter:
                e = e + jnp.asarray(jitter, acc_dt)
        return e

    def gget(i, j):
        return entry(DQ, i, j)

    from ipp_rl_tpu.ops.smallchol import spd_trace_product

    gains_grid = spd_trace_product(sget, gget, len(slots))  # (gy, gx, B)
    return gains_grid.reshape(N, B)[g["sel"]]  # (Ag, B)


def _dense_group_gains(P, Q, g, jitter, stream_dt, acc_dt):
    """rf>1 sweep restructured so every contraction is a LARGE batched
    GEMM with the mission axis as the big free dimension.

    The per-mission formulation (kf_sweep_gains_structured) lowers the
    S/G einsums to B·Ag tiny (Mg, N)×(N, Mg) matmuls plus a (N, Ag·Mg)
    relayout — profiled at 37 ms of the 49.5 ms B=4096 replan step
    (scripts/profile_sweep.py).  Here:

      T[(a,j), b, n] = Σ_m H[(a,j), m] P[b, n, m]      one (K, M)×(B·N, M)ᵀ GEMM
      S[a, i, j, b]  = Σ_n H[a, i, n] T[a, j, b, n]    Ag GEMMs of (Mg, N)×(N, Mg·B)

    — no relayout at all (both contractions run on the operands' native
    minor axes), and the innovation blocks land entry-major (a, i, j, b)
    so the unrolled inverse streams contiguous B-vectors.  The gain
    numerator G runs the same two GEMMs against Q = P·diag(m)·P.

    REJECTED alternative (measured, do not revisit): deriving G from T
    itself via G[a,i,j,b] = Σ_n T[a,i,b,n]·m[b,n]·T[a,j,b,n] (skipping
    stage(Q)) needs a dot_general batched over BOTH (a, b) with tiny
    (Mg, N)×(N, Mg) per-pair problems — 409,600 near-empty MXU passes at
    the canonical shape, profiled 35.3 ms for the group vs ~6 ms this
    way (scripts/profile_sweep.py r5.1 run): the relayout-free big-GEMM
    structure is worth far more than the saved Q pass."""
    B, N, _ = P.shape
    Hf = g["H_flat"].astype(stream_dt)  # (Ag·Mg, N)
    Hg = g["H"].astype(stream_dt)  # (Ag, Mg, N)
    Ag, Mg, _ = g["H"].shape

    def stage(Mat):
        T = jax.lax.dot_general(
            Hf,
            Mat.astype(stream_dt),
            dimension_numbers=(((1,), (2,)), ((), ())),
            preferred_element_type=stream_dt,
        )  # (Ag·Mg, B, N)
        T = T.reshape(Ag, Mg, B, N)  # (a, j, b, n)
        return jax.lax.dot_general(
            Hg,
            T,
            dimension_numbers=(((2,), (3,)), ((0,), (0,))),
            preferred_element_type=acc_dt,
        )  # (a, i, j, b)

    S_arr, G_arr = stage(P), stage(Q)
    R = g["R"].astype(acc_dt)

    def sget(i, j):
        e = 0.5 * (S_arr[:, i, j, :] + S_arr[:, j, i, :])
        if i == j:
            e = e + R[:, i][:, None]
            if jitter:
                e = e + jnp.asarray(jitter, acc_dt)
        return e

    def gget(i, j):
        return 0.5 * (G_arr[:, i, j, :] + G_arr[:, j, i, :])

    from ipp_rl_tpu.ops.smallchol import spd_trace_product

    return spd_trace_product(sget, gget, Mg)  # (Ag, B)


def kf_sweep_gains_batched(
    P: jnp.ndarray,
    prep,
    diag_mask: Optional[jnp.ndarray] = None,
    jitter: float = 0.0,
    fast_math: bool = False,
) -> jnp.ndarray:
    """Whole-batch all-action sweep: P (B, N, N), diag_mask (B, N) →
    gains (B, A).  Matches ``vmap(kf_sweep_gains_structured)`` (tested in
    tests/test_kalman.py) with the mission axis threaded through every
    contraction as the large GEMM dimension instead of vmapped — the
    r5 redesign of the headline kernel (see the per-group helpers)."""
    B, N, _ = P.shape
    acc_dt = P.dtype
    stream_dt = jnp.bfloat16 if fast_math else acc_dt
    if any(g["kind"] in ("win", "dense") for g in prep["groups"]):
        # Q = P·diag(m)·P, f32-accumulated, stored in the stream dtype
        # (every consumer — the window group's offset-plane contraction
        # and the dense group's stage GEMMs — re-casts to stream_dt
        # anyway, so the f32 copy was pure write+read traffic; the
        # legacy gather fallback recomputes its own Q per mission)
        Pm = P if diag_mask is None else P * diag_mask[:, None, :].astype(acc_dt)
        Q = jnp.einsum(
            "bnc,bcm->bnm",
            Pm.astype(stream_dt),
            P.astype(stream_dt),
            preferred_element_type=acc_dt,
        ).astype(stream_dt)
    parts = []
    for g in prep["groups"]:
        if g["kind"] == "win":
            parts.append(_window_group_gains(P, Q, g, jitter, stream_dt, acc_dt))
        elif g["kind"] == "dense":
            parts.append(_dense_group_gains(P, Q, g, jitter, stream_dt, acc_dt))
        else:
            # legacy gather group — vmap the per-mission path
            group = {"cells": g["cells"], "R": g["R"], "vv": g["vv"], "H": None}
            ag = g["cells"].shape[0]
            gains_b = jax.vmap(
                lambda P1, m1: kf_sweep_gains_structured(
                    P1, (group,), jnp.arange(ag), m1, jitter, fast_math
                )
            )(P, diag_mask if diag_mask is not None else jnp.ones((B, N), acc_dt))
            parts.append(gains_b.T)
    gains = jnp.concatenate(parts, axis=0)[prep["perm"]]  # (A, B)
    return gains.T


def kf_sweep_gains(
    P: jnp.ndarray,
    H_all: jnp.ndarray,
    R_all: jnp.ndarray,
    diag_mask: Optional[jnp.ndarray] = None,
    jitter: float = 0.0,
    fast_math: bool = False,
) -> jnp.ndarray:
    """Trace reduction for EVERY action at once — the greedy/MCTS sweep.

    Replaces the reference's process-pool loop over the action set
    (reference planning/common/optimization.py:82-90).  TPU formulation:

      P: (N, N), H_all: (A, M, N), R_all: (A, M) → gains (A,)

    The P·Hᵀ contraction is one (N × N) × (N × A·M) matmul (MXU);
    the A innovation inverses use the *unrolled* small-SPD inverse
    (ops/smallchol.py — pure fused VPU ops, no sequential batched
    Cholesky/solve, which profiled ~1000× off roofline); the masked
    trace reduction is

      gain_a = Σ_j m_j · (PHt_a S_a⁻¹ PHt_aᵀ)_{jj}
             = Σ_j m_j · rowsum( (PHt_a @ S_a⁻¹) ∘ PHt_a )_j

    ``fast_math``: store the streamed (N, A·M) intermediate in bfloat16
    (halving the dominant HBM traffic) while keeping all contractions
    accumulating in float32 — decision (argmax) agreement with the f32
    path is validated in tests; belief commits stay full precision.
    """
    A, M, N = H_all.shape
    acc_dt = P.dtype
    stream_dt = jnp.bfloat16 if fast_math else acc_dt
    H_flat = H_all.reshape(A * M, N).astype(stream_dt)
    PHt = jnp.matmul(
        P.astype(stream_dt), H_flat.T, preferred_element_type=stream_dt
    ).reshape(N, A, M)
    PHt = jnp.moveaxis(PHt, 1, 0)  # (A, N, M)
    S = jnp.einsum(
        "amn,ank->amk",
        H_all.astype(stream_dt),
        PHt,
        preferred_element_type=acc_dt,
    )  # (A, M, M) — f32 accumulation
    S = 0.5 * (S + jnp.swapaxes(S, -1, -2))
    S = S + jax.vmap(jnp.diag)(R_all)
    if jitter:
        S = S + jitter * jnp.eye(M, dtype=S.dtype)
    S_inv = _small_spd_inverse(S)  # (A, M, M) — unrolled, batched, f32
    Y = jnp.einsum(
        "anm,amk->ank",
        PHt,
        S_inv.astype(stream_dt),
        preferred_element_type=stream_dt,
    )  # (A, N, M)
    sq = jnp.einsum(
        "anm,anm->an", Y, PHt, preferred_element_type=acc_dt
    )  # (A, N) per-cell variance reductions, f32 accumulation
    if diag_mask is not None:
        sq = sq * diag_mask[None, :].astype(acc_dt)
    return jnp.sum(sq, axis=-1)  # (A,)

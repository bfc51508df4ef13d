"""Micro-profile of the structured all-action sweep internals (TPU).

Each variant runs as a 10-step scan whose carry includes P with a tiny
per-step mutation, so XLA cannot hoist P-dependent work out of the loop.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_sweep.py
"""

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import os

    from ipp_rl_tpu import load_config
    from ipp_rl_tpu.env.world import IPPWorld
    from ipp_rl_tpu.ops.kalman import _small_spd_inverse

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "../ipp_rl_tpu/config/example.yaml")
    )
    world = IPPWorld(cfg, fast_sweeps=True)
    B, K = args.batch, args.steps
    N = cfg.environment.num_cells
    groups = world.sweep_groups
    g1 = next((g for g in groups if g["cells"] is not None), None)  # rf==1 gather group
    gd = [g for g in groups if g["cells"] is None]  # dense groups
    if g1 is None:
        raise SystemExit(
            "config has no rf==1 gather group — the rf1_* / spd_inverse "
            "benches need one (use the canonical example.yaml)"
        )

    state0 = world.init_state(jax.random.key(0), B)
    P0 = state0.cov  # (B, N, N)

    def bench(name, per_mission):
        """per_mission: P (N,N) -> scalar contribution."""

        def body(P, _):
            out = jax.vmap(per_mission)(P)  # (B,)
            # the 1e-20-scaled result is loop-carried through P, so the
            # P-dependent work cannot be hoisted out of the scan (the
            # perturbation itself underflows to a no-op numerically)
            P = P + 1e-20 * out[:, None, None]
            return P, None

        def block(P):
            P, _ = jax.lax.scan(body, P, None, length=K)
            return P

        f = jax.jit(block)
        out = jax.block_until_ready(f(P0))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jax.block_until_ready(f(P0))
            times.append(time.perf_counter() - t0)
        print(f"{name:14s} {min(times) / K * 1e3:8.2f} ms/step  ({B} missions)")

    def v_carry(P):
        return jnp.sum(P[0])

    def v_q(P):
        Q = jnp.matmul(P, P, preferred_element_type=P.dtype)
        return jnp.sum(Q[0])

    def rf1_blocks(P, Q):
        cells = g1["cells"]
        ii = cells[:, :, None]
        jj = cells[:, None, :]
        vv = g1["vv"]
        S = P[ii, jj] * vv + jax.vmap(jnp.diag)(g1["R"])
        G = Q[ii, jj] * vv
        return S, G

    def v_rf1_gather(P):
        S, G = rf1_blocks(P, P)  # reuse P as Q to skip the matmul
        return jnp.sum(S) + jnp.sum(G)

    def v_rf1_full(P):
        Q = jnp.matmul(P, P, preferred_element_type=P.dtype)
        S, G = rf1_blocks(P, Q)
        S_inv = _small_spd_inverse(S)
        return jnp.einsum("amk,amk->", S_inv, G)

    def v_spdinv(P):
        # SPD inverse alone on synthetic well-conditioned blocks
        cells = g1["cells"]
        Ag, Mg = cells.shape
        eye = jnp.eye(Mg, dtype=P.dtype)
        S = eye[None] * (1.0 + P[0, 0]) + 0.01
        S = jnp.broadcast_to(S, (Ag, Mg, Mg))
        return jnp.sum(_small_spd_inverse(S))

    def v_dense(P):
        from ipp_rl_tpu.ops.kalman import kf_sweep_gains_structured

        perm = jnp.arange(sum(g["R"].shape[0] for g in gd))
        return jnp.sum(
            kf_sweep_gains_structured(P, gd, perm, fast_math=True)
        )

    if not gd:
        v_dense = None  # no rf>1 dense groups in this config

    def v_sweep(P):
        from ipp_rl_tpu.ops.kalman import kf_sweep_gains_structured

        return jnp.sum(
            kf_sweep_gains_structured(
                P, groups, world.sweep_perm, fast_math=True
            )
        )

    bench("carry", v_carry)
    bench("q_matmul", v_q)
    bench("rf1_gather", v_rf1_gather)
    bench("spd_inverse", v_spdinv)
    bench("rf1_full", v_rf1_full)
    if v_dense is not None:
        bench("dense_rf2", v_dense)
    bench("sweep_all", v_sweep)


if __name__ == "__main__":
    main()

"""Ablation profiler for the headline B=4096 greedy replan step.

VERDICT r4 weak #1: the committed roofline claim (70% of HBM) divided
B=4096 traffic by B=256 latency; honest numbers were 49.5 ms measured
vs ~3.3 ms ideal (~7%).  This script pins WHERE the time goes by timing
each component of the replan step in isolation, each wrapped in a
K-iteration lax.scan with a live data dependency (one device dispatch
per measurement — avoids the post-big-program per-call round-trip
documented in CLAUDE.md).  K=50: the scan-length scaling test showed
~29 ms of FIXED per-dispatch overhead through the tunnel, which
inflated every K=10 row by ~3 ms/iter; at K=50 the bias is ~0.6 ms.

r5 history it measured:
  * r4 path (vmapped structured sweep): full step 49.5 ms = rf>1 dense
    group 37.1 + rf==1 gather group 14.9 (P[ii,jj] scalar gathers) +
    commit 11.4 + unrolled SPD inverse 5.9 (overlapped).
  * r5.0 (kf_sweep_gains_batched): full 23.7 ms = sweep 16.8 +
    commit 10.2 (dense Joseph) + Q 3.6.
  * r5.1 (rank-M Joseph commit, dense-group G from its own T, bf16 Q):
    run this script for the current numbers.

Run on the real chip:  python scripts/profile_sweep.py [--batch 4096]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ipp_rl_tpu import load_config
from ipp_rl_tpu.config.schema import MissionConfig
from ipp_rl_tpu.env.world import IPPWorld
from ipp_rl_tpu.ops import kalman
from ipp_rl_tpu.ops.rewards import adaptive_mask
from ipp_rl_tpu.planners import GreedyPlanner
from ipp_rl_tpu.planners.base import action_costs_from, feasible_mask, sweep_rewards


def scan_time(name, body, init, K=50, repeats=3):
    """Time K scanned iterations of `body` (carry -> carry) in ONE jitted
    dispatch; report ms per iteration (min over repeats)."""

    @jax.jit
    def block(c):
        def step(c, _):
            return body(c), None

        c, _ = jax.lax.scan(step, c, None, length=K)
        return c

    out = jax.block_until_ready(block(init))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(block(out))
        ts.append((time.perf_counter() - t0) / K)
    print(f"{name:46s} {min(ts)*1e3:9.3f} ms/iter")
    return min(ts) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()
    B = args.batch

    cfg = load_config("ipp_rl_tpu/config/example.yaml")
    world = IPPWorld(cfg, fast_sweeps=True)
    planner = GreedyPlanner(world, MissionConfig(type="greedy"))
    state = world.init_state(jax.random.key(0), B)
    P0 = state.cov
    mean0 = state.mean
    prep = world.sweep_batched
    print(f"batch={B}  device={jax.devices()[0]}")
    for gi, g in enumerate(prep["groups"]):
        print(f"  group {gi}: {g['kind']}")

    # ---- full replan step (the bench step) --------------------------------
    def full_step(carry):
        st, key = carry
        k_plan, k_meas, key = jax.random.split(key, 3)
        action = planner.plan(st, k_plan, jnp.int32(0))
        st = world.step_index(st, action, k_meas)
        return (st, key)

    t_full = scan_time("FULL replan step", full_step, (state, jax.random.key(1)))

    # ---- sweep_rewards only ----------------------------------------------
    def sweep_only(carry):
        st = carry
        rewards, costs = sweep_rewards(world, st)
        # live dependency: nudge P by a rank-0 amount derived from rewards
        eps = 1e-12 * jnp.sum(rewards)
        return st.replace(cov=st.cov + eps)

    t_sweep = scan_time("sweep_rewards (gains+costs+reward)", sweep_only, state)

    # ---- commit only ------------------------------------------------------
    def commit_only(carry):
        st, key = carry
        k_meas, key = jax.random.split(key)
        action = jnp.zeros((B,), jnp.int32)
        st = world.step_index(st, action, k_meas)
        return (st, key)

    t_commit = scan_time(
        "step_index commit (fixed action)", commit_only, (state, jax.random.key(2))
    )

    # ---- pieces of the batched sweep (the r5 default path) ----------------
    mask0 = jax.vmap(
        lambda m, P: adaptive_mask(
            m, jnp.diag(P), cfg.scenario.value_threshold, cfg.scenario.interval_factor
        )
    )(mean0, P0)
    stream_dt = jnp.bfloat16
    acc_dt = P0.dtype

    def q_only(carry):
        P, mask = carry
        Pm = P * mask[:, None, :]
        Q = jnp.einsum(
            "bnc,bcm->bnm",
            Pm.astype(stream_dt),
            P.astype(stream_dt),
            preferred_element_type=acc_dt,
        ).astype(stream_dt)
        return (P + 1e-12 * Q[:, :1, :1].astype(acc_dt), mask)

    scan_time("Q = P·diag(m)·P (bf16 out)", q_only, (P0, mask0))

    win_groups = [g for g in prep["groups"] if g["kind"] == "win"]
    dense_groups = [g for g in prep["groups"] if g["kind"] == "dense"]

    if win_groups:

        def win_grp(carry):
            P, mask = carry
            Pm = P * mask[:, None, :]
            Q = jnp.einsum(
                "bnc,bcm->bnm",
                Pm.astype(stream_dt),
                P.astype(stream_dt),
                preferred_element_type=acc_dt,
            ).astype(stream_dt)
            g = kalman._window_group_gains(
                P, Q, win_groups[0], 0.0, stream_dt, acc_dt
            )
            return (P + 1e-12 * jnp.sum(g), mask)

        scan_time("window group (incl Q)", win_grp, (P0, mask0))

    if dense_groups:

        def dense_grp(carry):
            P, mask = carry
            Pm = P * mask[:, None, :]
            Q = jnp.einsum(
                "bnc,bcm->bnm",
                Pm.astype(stream_dt),
                P.astype(stream_dt),
                preferred_element_type=acc_dt,
            ).astype(stream_dt)
            g = kalman._dense_group_gains(
                P, Q, dense_groups[0], 0.0, stream_dt, acc_dt
            )
            return (P + 1e-12 * jnp.sum(g), mask)

        scan_time("dense group (incl Q)", dense_grp, (P0, mask0))

        # --- intra-dense ablation -----------------------------------
        gd = dense_groups[0]
        Hf_c = gd["H_flat"].astype(stream_dt)
        Hg_c = gd["H"].astype(stream_dt)
        Ag, Mg, Nn = gd["H"].shape

        def d_stage1(carry):
            P, mask = carry
            T = jax.lax.dot_general(
                Hf_c, P.astype(stream_dt),
                dimension_numbers=(((1,), (2,)), ((), ())),
                preferred_element_type=stream_dt,
            )
            return (P + 1e-12 * T[0].astype(acc_dt)[:, :, None], mask)

        scan_time("dense stage1 only (T=Hf·P)", d_stage1, (P0, mask0))

        def d_stage12(carry):
            P, mask = carry
            T = jax.lax.dot_general(
                Hf_c, P.astype(stream_dt),
                dimension_numbers=(((1,), (2,)), ((), ())),
                preferred_element_type=stream_dt,
            ).reshape(Ag, Mg, B, Nn)
            S_arr = jax.lax.dot_general(
                Hg_c, T,
                dimension_numbers=(((2,), (3,)), ((0,), (0,))),
                preferred_element_type=acc_dt,
            )
            return (P + 1e-12 * S_arr[0, 0, 0, :, None, None], mask)

        scan_time("dense stage1+2 (S only)", d_stage12, (P0, mask0))

        # trace product on fixed S/G entry planes
        from ipp_rl_tpu.ops.smallchol import spd_trace_product

        S_fix = (
            0.1 * jax.random.normal(jax.random.key(9), (Ag, Mg, Mg, B), acc_dt)
        )
        S_fix = 0.5 * (S_fix + jnp.swapaxes(S_fix, 1, 2))
        S_fix = S_fix + 9.0 * jnp.eye(Mg, dtype=acc_dt)[None, :, :, None]

        def d_trace(carry):
            S, bump = carry
            g = spd_trace_product(
                lambda i, j: S[:, i, j, :] + bump,
                lambda i, j: S[:, j, i, :],
                Mg,
            )
            return (S, bump + 1e-12 * jnp.mean(g))

        scan_time(
            "dense spd_trace_product only", d_trace, (S_fix, jnp.float32(0.0))
        )

    # ---- commit pieces ----------------------------------------------------
    action0 = jnp.zeros((B,), jnp.int32)

    def commit_kf_only(carry):
        P, key = carry
        k, key = jax.random.split(key)
        H = world.H[action0]
        R = world.R_diag[action0]
        _, P_next = jax.vmap(
            lambda P1, h, r: kalman.kf_update(P1, jnp.zeros(P1.shape[0], P1.dtype), h, r)
        )(P, H, R)
        return (P_next, key)

    scan_time("vmapped kf_update (rank-M Joseph)", commit_kf_only, (P0, jax.random.key(3)))

    # ---- small-SPD inverse at the sweep's real shape ----------------------
    A_tot = world.num_actions
    S_batch = (
        jnp.broadcast_to(jnp.eye(9, dtype=jnp.float32), (B, A_tot, 9, 9))
        + 0.01 * jax.random.normal(jax.random.key(3), (B, A_tot, 9, 9))
    )
    S_batch = 0.5 * (S_batch + jnp.swapaxes(S_batch, -1, -2))
    S_batch = S_batch + 9.0 * jnp.eye(9)

    def inv_only(carry):
        S = carry
        Si = kalman._small_spd_inverse(S)
        return S + 1e-12 * Si[:, :1, :1, :1]

    scan_time(f"small_spd_inverse (B,{A_tot},9,9)", inv_only, S_batch)

    # ---- mask + costs + argmax -------------------------------------------
    def mask_cost(carry):
        st = carry
        m = jax.vmap(
            lambda mm, P: adaptive_mask(
                mm, jnp.diag(P), cfg.scenario.value_threshold, cfg.scenario.interval_factor
            )
        )(st.mean, st.cov)
        costs = action_costs_from(world, st.pos)
        ok = feasible_mask(world, st.pos, st.budget, costs)
        r = jnp.where(ok, costs, -jnp.inf)
        a = jnp.argmax(r, axis=-1)
        return st.replace(budget=st.budget + 1e-12 * (a.astype(st.budget.dtype).sum() + m.sum()))

    scan_time("adaptive_mask+costs+feasible+argmax", mask_cost, state)

    print(f"\nfull={t_full:.2f} ms, sweep={t_sweep:.2f} ms, commit={t_commit:.2f} ms")


if __name__ == "__main__":
    main()

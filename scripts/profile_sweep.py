"""Ablation profiler for the headline B=4096 greedy replan step.

VERDICT r4 weak #1: the committed roofline claim (70% of HBM) divided
B=4096 traffic by B=256 latency; honest numbers are 49.5 ms measured vs
~3.3 ms ideal (~7%).  This script pins WHERE the time goes by timing
each component of the replan step in isolation, each wrapped in a
K-iteration lax.scan with a live data dependency (one device dispatch
per measurement — avoids the post-big-program per-call round-trip
documented in CLAUDE.md).

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
from ipp_rl_tpu.ops.rewards import adaptive_mask, reward_from_gain
from ipp_rl_tpu.planners import GreedyPlanner
from ipp_rl_tpu.planners.base import action_costs_from, feasible_mask, sweep_rewards


def scan_time(name, body, init, K=10, repeats=3):
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
    print(f"batch={B}  device={jax.devices()[0]}")
    for gi, g in enumerate(world.sweep_groups):
        kind = "gather" if g["cells"] is not None else "dense"
        shp = (g["cells"] if g["cells"] is not None else g["H"]).shape
        print(f"  group {gi}: {kind} {shp}")

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

    scan_time("step_index commit (fixed action)", commit_only, (state, jax.random.key(2)))

    # ---- pieces of the structured sweep ----------------------------------
    mask0 = jax.vmap(
        lambda m, P: adaptive_mask(
            m, jnp.diag(P), cfg.scenario.value_threshold, cfg.scenario.interval_factor
        )
    )(mean0, P0)

    def q_only(carry):
        P, mask = carry
        Pm = P * mask[:, None, :]
        Q = jnp.einsum("bnk,bkm->bnm", Pm, P)
        return (P + 1e-12 * Q[:, :1, :1], mask)

    scan_time("Q = P·diag(m)·P matmul", q_only, (P0, mask0))

    groups = world.sweep_groups
    gather_groups = [g for g in groups if g["cells"] is not None]
    dense_groups = [g for g in groups if g["cells"] is None]

    def run_groups(P, mask, use_groups, with_q):
        def one(P1, m1):
            gains = kalman.kf_sweep_gains_structured(
                P1,
                use_groups,
                jnp.arange(sum((g["R"].shape[0] for g in use_groups))),
                m1,
                0.0,
                fast_math=True,
            )
            return gains

        return jax.vmap(one)(P, mask)

    if gather_groups:

        def gather_grp(carry):
            P, mask = carry
            g = run_groups(P, mask, gather_groups, True)
            return (P + 1e-12 * jnp.sum(g), mask)

        scan_time("rf==1 gather group (incl Q)", gather_grp, (P0, mask0))

        # the raw P[ii,jj] extraction alone, no Q, no inverse
        g0 = gather_groups[0]
        cells = g0["cells"]
        ii = cells[:, :, None]
        jj = cells[:, None, :]

        def raw_gather(carry):
            P, mask = carry
            S = jax.vmap(lambda P1: P1[ii, jj])(P)
            return (P + 1e-12 * jnp.sum(S), mask)

        scan_time("raw P[ii,jj] extraction x1", raw_gather, (P0, mask0))

    if dense_groups:

        def dense_grp(carry):
            P, mask = carry
            g = run_groups(P, mask, dense_groups, False)
            return (P + 1e-12 * jnp.sum(g), mask)

        scan_time("rf>1 dense group", dense_grp, (P0, mask0))

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

    print(f"\nfull={t_full:.2f} ms, sweep={t_sweep:.2f} ms")


if __name__ == "__main__":
    main()

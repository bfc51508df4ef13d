"""End-to-end large-grid greedy mission through the mp-sharded KF.

The framework's covariance-sharding kernels (parallel/sharded_kalman.py)
exist for grids whose N×N covariance outgrows one device (SURVEY.md §5,
reference mapping/mappings.py:226-233 builds the same N×N Matérn prior
densely).  This module actually RUNS a mission on that path: a greedy
replan loop (reference planning/greedy_mission.py:73-110) where

  * the all-action candidate sweep is sharded over the ACTION axis
    (``sharded_sweep_gains`` — each device prices A/d actions), and
  * the measurement commit is sharded over the COVARIANCE ROWS
    (``sharded_kf_update`` — the N×N state never crosses the mesh).

Exact-match against the dense single-device greedy planner is asserted
on the 8-virtual-device mesh in tests/test_sharded.py (same ground
truth, same measurement-noise keys, identical action sequences and
final beliefs).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ipp_rl_tpu.env.world import IPPWorld
from ipp_rl_tpu.ops.rewards import adaptive_mask, reward_from_gain
from ipp_rl_tpu.parallel.sharded_kalman import (
    sharded_kf_update,
    sharded_sweep_gains,
)
from ipp_rl_tpu.planners.base import action_costs_from


def sharded_greedy_mission(
    mesh: Mesh,
    world: IPPWorld,
    key: jax.Array,
    max_steps: int,
    ground_truth: jnp.ndarray = None,
) -> Dict[str, np.ndarray]:
    """One greedy mission with every O(N²)/O(A·N²) kernel on the mesh.

    Single mission by design: the mp axis is for grids where one N×N
    covariance is the scaling unit (batching is the dp axis's job).
    Returns per-step uncertainty/rmse/action curves (host numpy).
    """
    cfg = world.cfg
    state = world.init_state(key, 1, ground_truth=ground_truth)
    P = state.cov[0]
    mean = state.mean[0]
    gt = state.ground_truth[0]
    pos = state.pos[0]
    budget = state.budget[0]

    # jit-wrapped ONCE per mission: sharded_kf_update/sharded_sweep_gains
    # construct a fresh shard_map per call, so calling them eagerly every
    # step would re-trace + re-compile the O(A·N²) programs each time
    @jax.jit
    def plan(P, mean, pos, budget):
        mask = jnp.ones((P.shape[0],), P.dtype)
        if cfg.scenario.adaptive:
            mask = adaptive_mask(
                mean, jnp.diag(P), cfg.scenario.value_threshold,
                cfg.scenario.interval_factor,
            )
        gains = sharded_sweep_gains(mesh, P, world.H, world.R_diag, mask)
        costs = action_costs_from(world, pos)
        rewards = reward_from_gain(gains, costs)
        ok = (costs > 0) & (costs <= budget)
        scored = jnp.where(ok, rewards, -jnp.inf)
        return jnp.argmax(scored), jnp.any(ok), costs

    @jax.jit
    def commit(P, mean, H, R, z):
        return sharded_kf_update(mesh, P, mean, H, R, z)

    actions, uncs, rmses = [], [], []

    def record():
        uncs.append(float(jnp.trace(P)))
        rmses.append(float(jnp.sqrt(jnp.mean(jnp.square(gt - mean)))))

    record()
    for step in range(max_steps):
        a_dev, any_ok, costs = plan(P, mean, pos, budget)
        if not bool(any_ok):
            break
        a = int(a_dev)

        # same measurement-noise stream as world.step_index (exact-match
        # testing): one split per mission of the per-step key
        k_step = jax.random.fold_in(key, step)
        k_meas = jax.random.split(k_step, 1)[0]
        z = world.synthesize_measurement(
            gt, world.Z[a], world.noise_std[a], k_meas
        )
        mean, P = commit(P, mean, world.H[a], world.R_diag[a], z)
        budget = budget - costs[a]
        pos = world.actions_xyz[a]
        actions.append(a)
        record()

    return {
        "actions": np.asarray(actions, np.int32),
        "uncertainty": np.asarray(uncs),
        "rmse": np.asarray(rmses),
        "final_mean": np.asarray(mean),
        "final_cov": np.asarray(P),
        "budget_left": float(budget),
    }


def dense_greedy_mission(
    world: IPPWorld,
    key: jax.Array,
    max_steps: int,
    ground_truth: jnp.ndarray = None,
) -> Dict[str, np.ndarray]:
    """The identical loop on one device (dense kf_update / kf_sweep_gains)
    with the same noise stream — the exact-match oracle and the
    single-chip timing reference for docs/PERFORMANCE.md."""
    from ipp_rl_tpu.ops.kalman import kf_sweep_gains, kf_update

    cfg = world.cfg
    state = world.init_state(key, 1, ground_truth=ground_truth)
    P = state.cov[0]
    mean = state.mean[0]
    gt = state.ground_truth[0]
    pos = state.pos[0]
    budget = state.budget[0]

    @jax.jit
    def plan(P, mean, pos, budget):
        mask = jnp.ones((P.shape[0],), P.dtype)
        if cfg.scenario.adaptive:
            mask = adaptive_mask(
                mean, jnp.diag(P), cfg.scenario.value_threshold,
                cfg.scenario.interval_factor,
            )
        gains = kf_sweep_gains(P, world.H, world.R_diag, mask)
        costs = action_costs_from(world, pos)
        rewards = reward_from_gain(gains, costs)
        ok = (costs > 0) & (costs <= budget)
        scored = jnp.where(ok, rewards, -jnp.inf)
        return jnp.argmax(scored), jnp.any(ok), costs

    commit = jax.jit(
        lambda P, mean, H, R, z: kf_update(P, mean, H, R, z)
    )

    actions, uncs, rmses = [], [], []

    def record():
        uncs.append(float(jnp.trace(P)))
        rmses.append(float(jnp.sqrt(jnp.mean(jnp.square(gt - mean)))))

    record()
    for step in range(max_steps):
        a_dev, any_ok, costs = plan(P, mean, pos, budget)
        if not bool(any_ok):
            break
        a = int(a_dev)
        k_step = jax.random.fold_in(key, step)
        k_meas = jax.random.split(k_step, 1)[0]
        z = world.synthesize_measurement(gt, world.Z[a], world.noise_std[a], k_meas)
        mean, P = commit(P, mean, world.H[a], world.R_diag[a], z)
        budget = budget - costs[a]
        pos = world.actions_xyz[a]
        actions.append(a)
        record()

    return {
        "actions": np.asarray(actions, np.int32),
        "uncertainty": np.asarray(uncs),
        "rmse": np.asarray(rmses),
        "final_mean": np.asarray(mean),
        "final_cov": np.asarray(P),
        "budget_left": float(budget),
    }

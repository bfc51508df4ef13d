"""Greedy planner: per step, price every feasible action with a one-step
Kalman lookahead and take the argmax (reference planning/greedy_mission.py:73-110,
planning/common/optimization.py:33-104).

TPU formulation: the whole ``Pool(4).starmap`` sweep over ~A candidate
covariance updates collapses into ``kf_sweep_gains`` — three batched
GEMMs + one batched Cholesky per mission, vmapped over the batch.  A
multi-step horizon (greedy_search with episode_horizon > 1) is a
``lax.scan`` of hypothetical covariance-only commits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ipp_rl_tpu.env.world import BeliefState, IPPWorld
from ipp_rl_tpu.config.schema import MissionConfig
from ipp_rl_tpu.ops.kalman import kf_update
from ipp_rl_tpu.planners.base import (
    Planner,
    action_costs_from,
    feasible_mask,
    sweep_rewards,
)


class GreedyPlanner(Planner):
    name = "greedy"

    def plan(
        self, state: BeliefState, key: jax.Array, step: jnp.ndarray
    ) -> jnp.ndarray:
        rewards, costs = sweep_rewards(self.world, state)
        ok = feasible_mask(self.world, state.pos, state.budget, costs)
        scored = jnp.where(ok, rewards, -jnp.inf)
        return jnp.argmax(scored, axis=-1).astype(jnp.int32)


def greedy_search_horizon(
    world: IPPWorld,
    state: BeliefState,
    horizon: int,
):
    """Multi-step greedy rollout (reference planning/common/optimization.py:33-104):
    repeatedly sweep-price all actions against the *hypothetical* covariance,
    commit the argmax covariance-only, decrement budget.

    Returns (waypoint indices (B, horizon), valid (B, horizon)).
    """

    def step_fn(carry, _):
        cov, pos, budget, mean = carry
        hyp = state.replace(cov=cov, pos=pos, budget=budget, mean=mean)
        rewards, costs = sweep_rewards(world, hyp)
        ok = feasible_mask(world, pos, budget, costs)
        scored = jnp.where(ok, rewards, -jnp.inf)
        a = jnp.argmax(scored, axis=-1).astype(jnp.int32)
        any_ok = jnp.any(ok, axis=-1)
        cost_a = jnp.take_along_axis(costs, a[:, None], axis=-1)[:, 0]

        def commit(P, m, idx):
            return kf_update(P, m, world.H[idx], world.R_diag[idx], z=None)

        mean_next, cov_next = jax.vmap(commit)(cov, mean, a)
        keepP = any_ok[:, None, None]
        cov = jnp.where(keepP, cov_next, cov)
        pos = jnp.where(any_ok[:, None], world.actions_xyz[a], pos)
        budget = jnp.where(any_ok, budget - cost_a, budget)
        return (cov, pos, budget, mean), (a, any_ok)

    (cov, pos, budget, mean), (actions, valids) = jax.lax.scan(
        step_fn,
        (state.cov, state.pos, state.budget, state.mean),
        None,
        length=horizon,
    )
    return actions.T, valids.T  # (B, horizon)

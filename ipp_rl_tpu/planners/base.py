"""Planner base: mission loop scaffolding shared by every planner.

The reference's ``Mission.execute()`` is a Python while-loop with one
process pool per decision (reference planning/greedy_mission.py:73-110).
Here a mission batch runs as one ``lax.scan`` over a static step bound
with per-mission active masks: missions that exhaust their budget keep
carrying state but stop measuring — mask-and-continue, so metric
histories stay rectangular (B, T+1).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ipp_rl_tpu.config.schema import Config, MissionConfig
from ipp_rl_tpu.env.world import BeliefState, IPPWorld
from ipp_rl_tpu.ops.geometry import euclidean_distances, travel_costs
from ipp_rl_tpu.ops.kalman import (
    kf_sweep_gains_batched,
    kf_sweep_gains_structured,
)
from ipp_rl_tpu.ops.rewards import adaptive_mask, reward_from_gain


def action_costs_from(world: IPPWorld, pos: jnp.ndarray) -> jnp.ndarray:
    """(…, A) flight-time cost from position(s) pos (…, 3) to every action."""
    return travel_costs(
        world.actions_xyz,
        pos[..., None, :],
        world.cfg.uav.max_v,
        world.cfg.uav.max_a,
    )


def sweep_rewards(world: IPPWorld, state: BeliefState, jitter: float = 0.0):
    """Reward of EVERY lattice action for every mission: returns
    (rewards (B, A), costs (B, A)).

    One fused batched kernel replacing the reference's per-action process
    pool (reference planning/common/optimization.py:82-90): trace
    reduction via the whitened gain factor + cost normalization.

    The whole-batch path (ops/kalman.kf_sweep_gains_batched, r5) keeps
    the mission axis as the large GEMM dimension end-to-end; worlds
    without batched-sweep constants fall back to the vmapped per-mission
    structured sweep.
    """
    cfg = world.cfg
    fast = getattr(world, "fast_sweeps", False)
    prep = getattr(world, "sweep_batched", None)
    if prep is not None:
        mask = None
        if cfg.scenario.adaptive:
            n = state.cov.shape[-1]
            # diagonal via a one-hot contraction (a [..., n, n] gather
            # lowers to scalar loads on TPU; this streams P once)
            diag = jnp.einsum(
                "bnm,nm->bn", state.cov, jnp.eye(n, dtype=state.cov.dtype)
            )
            mask = adaptive_mask(
                state.mean,
                diag,
                cfg.scenario.value_threshold,
                cfg.scenario.interval_factor,
            )
        gains = kf_sweep_gains_batched(
            state.cov, prep, mask, jitter, fast_math=fast
        )
        costs = action_costs_from(world, state.pos)
        return reward_from_gain(gains, costs), costs

    def one(mean, cov, pos):
        mask = None
        if cfg.scenario.adaptive:
            mask = adaptive_mask(
                mean,
                jnp.diag(cov),
                cfg.scenario.value_threshold,
                cfg.scenario.interval_factor,
            )
        gains = kf_sweep_gains_structured(
            cov, world.sweep_groups, world.sweep_perm, mask, jitter,
            fast_math=fast,
        )
        costs = action_costs_from(world, pos)
        return reward_from_gain(gains, costs), costs

    return jax.vmap(one)(state.mean, state.cov, state.pos)


def feasible_mask(
    world: IPPWorld,
    pos: jnp.ndarray,
    budget: jnp.ndarray,
    costs: jnp.ndarray,
    max_distance: Optional[float] = None,
) -> jnp.ndarray:
    """(B, A) feasibility: 0 < cost ≤ budget, optionally distance-capped
    (reference planning/common/actions.py:44-66, planning/mcts_zero/mcts.py:148-158)."""
    ok = (costs > 0) & (costs <= budget[:, None])
    if max_distance is not None:
        dist = euclidean_distances(world.actions_xyz[None, :, :], pos[:, None, :])
        ok = ok & (dist < max_distance)
    return ok


@dataclass
class MissionResult:
    """Rectangular per-step history of a mission batch (host numpy)."""

    waypoints: np.ndarray  # (B, T, 3) — NaN after mission end
    metrics: Dict[str, np.ndarray]  # each (B, T+1) — step 0 is the prior
    budgets: np.ndarray  # (B, T+1)
    num_steps: np.ndarray  # (B,)
    flight_times: np.ndarray  # (B, T) — 0 after mission end
    final_state: Optional[BeliefState] = None

    def metric_curve(self, name: str) -> np.ndarray:
        return self.metrics[name]


class Planner:
    """Base class: concrete planners implement ``plan`` (choose the next
    lattice action per mission) or override ``run`` entirely."""

    name = "base"

    def __init__(self, world: IPPWorld, mission_cfg: MissionConfig):
        self.world = world
        self.mission_cfg = mission_cfg
        self.cfg: Config = world.cfg

    def plan(
        self, state: BeliefState, key: jax.Array, step: jnp.ndarray
    ) -> jnp.ndarray:
        """Return (B,) lattice action indices for the next measurement."""
        raise NotImplementedError

    def max_steps(self) -> int:
        """Static step bound: budget / cheapest feasible hop."""
        off_diag = ~np.eye(self.world.num_actions, dtype=bool)
        min_cost = float(np.min(self.world.table.pair_cost[off_diag]))
        return int(np.ceil(self.cfg.constraints.budget / max(min_cost, 1e-6))) + 1

    def run(
        self,
        key: jax.Array,
        batch_size: int,
        max_steps: Optional[int] = None,
        init_state: Optional[BeliefState] = None,
        think_time_per_step: float = 0.0,
    ) -> MissionResult:
        """Execute the batched mission loop and collect metric histories.

        ``think_time_per_step``: additional budget consumed per replan for
        planning time ("effective mission time", reference
        planning/greedy_mission.py:105-106 — there measured per step with
        time.time(); here the compiled per-step latency is constant, so a
        measured scalar is subtracted each step when
        cfg.evaluation.use_effective_mission_time is on)."""
        world = self.world
        T = max_steps if max_steps is not None else self.max_steps()
        think = (
            think_time_per_step
            if self.cfg.evaluation.use_effective_mission_time
            else 0.0
        )
        k_init, k_run = jax.random.split(key)
        state0 = (
            init_state
            if init_state is not None
            else world.init_state(k_init, batch_size)
        )
        metrics0 = {k: np.asarray(v) for k, v in world.evaluate(state0).items()}

        def step_fn(carry, k):
            state, t = carry
            k_plan, k_meas = jax.random.split(k)
            action = self.plan(state, k_plan, t)
            cost = travel_costs(
                world.actions_xyz[action],
                state.pos,
                self.cfg.uav.max_v,
                self.cfg.uav.max_a,
            )
            # a mission stays active while it can afford a positive-cost move
            # (reference planning/greedy_mission.py:79-96)
            can_move = state.active & (cost <= state.budget) & (cost > 0)
            state = state.replace(active=can_move)
            state = world.step_index(state, action, k_meas)
            if think:
                state = state.replace(
                    budget=jnp.where(can_move, state.budget - think, state.budget)
                )
            metrics = world.evaluate(state)
            wp = jnp.where(can_move[:, None], world.actions_xyz[action], jnp.nan)
            return (state, t + 1), (metrics, wp, state.budget, can_move, cost)

        keys = jax.random.split(k_run, T)
        (state, _), (metrics_h, wps, budgets, actives, costs) = jax.lax.scan(
            step_fn, (state0, jnp.int32(0)), keys
        )

        metrics_out = {
            k: np.concatenate(
                [metrics0[k][:, None], np.asarray(metrics_h[k]).T], axis=1
            )
            for k in metrics0
        }
        budget0 = np.asarray(state0.budget)[:, None]
        return MissionResult(
            waypoints=np.asarray(wps).swapaxes(0, 1),
            metrics=metrics_out,
            budgets=np.concatenate([budget0, np.asarray(budgets).T], axis=1),
            num_steps=np.asarray(jnp.sum(actives, axis=0)),
            flight_times=np.asarray(jnp.where(actives, costs, 0.0)).swapaxes(0, 1),
            final_state=state,
        )

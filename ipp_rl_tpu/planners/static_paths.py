"""Static / random baseline planners (reference planning/baselines/).

Waypoint patterns are config-static (lawnmower, spiral) or cheap random
draws; execution is the same batched measure-and-commit loop, here over
*continuous* waypoints via ``IPPWorld.step_position`` — the measurement
model is built in-jit per position, so the whole mission is one scan.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ipp_rl_tpu.config.schema import Config, MissionConfig
from ipp_rl_tpu.env.world import BeliefState, IPPWorld
from ipp_rl_tpu.ops.geometry import travel_costs
from ipp_rl_tpu.planners.base import MissionResult, Planner, feasible_mask, action_costs_from


def lawnmower_waypoints(cfg: Config, step_size: float) -> np.ndarray:
    """Boustrophedon sweep per altitude level, budget-truncated at execution
    time (reference planning/baselines/lawn_mower_mission.py:66-114).

    The reference builds int-cast [sweep, cross, alt] triples; we emit
    (x, y, z) with the serpentine on x."""
    con, env, uav = cfg.constraints, cfg.environment, cfg.uav
    lo = con.dist_to_boundaries
    hi_x = env.extent_x - con.dist_to_boundaries
    hi_y = env.extent_y - con.dist_to_boundaries
    xs = np.linspace(lo, hi_x, int((hi_x - lo) / step_size) + 1)
    ys = np.linspace(lo, hi_y, int((hi_y - lo) / step_size) + 1)
    levels = np.linspace(con.min_altitude, con.max_altitude, con.altitude_levels)
    wps = []
    for z in levels:
        for j, y in enumerate(ys):
            row_xs = xs if j % 2 == 0 else env.extent_x - xs
            for x in row_xs:
                wps.append((float(int(x)), float(int(y)), float(int(z))))
    return np.asarray(wps)


def spiral_waypoints(cfg: Config, num_waypoints: int, slope_factor: float = 1.0) -> np.ndarray:
    """3-D conical spiral, radius growing with t, altitude descending
    (reference planning/baselines/conical_spiral_mission.py:67-108)."""
    con, env = cfg.constraints, cfg.environment
    t_max = 0.5 * min(env.extent_x, env.extent_y) - con.dist_to_boundaries
    c = (con.max_altitude - con.min_altitude) / t_max**2
    t = np.linspace(0.0, t_max, num_waypoints)
    x = t * np.cos(slope_factor * t) + 0.5 * env.extent_x
    y = t * np.sin(slope_factor * t) + 0.5 * env.extent_y
    z = np.flip(c * np.square(t) + con.min_altitude)
    return np.stack([x, y, z], axis=1)


class WaypointListPlanner(Planner):
    """Executes a fixed (possibly per-mission) waypoint list with budget
    truncation: stop before the first unaffordable hop (reference
    lawn_mower_mission.py:126-140)."""

    name = "waypoint_list"

    def waypoint_list(self, key: jax.Array, batch_size: int) -> jnp.ndarray:
        """(B, T, 3) waypoints per mission."""
        raise NotImplementedError

    def run(
        self,
        key: jax.Array,
        batch_size: int,
        max_steps: Optional[int] = None,
        init_state: Optional[BeliefState] = None,
        think_time_per_step: float = 0.0,
    ) -> MissionResult:
        world = self.world
        cfg = self.cfg
        # effective mission time: charge the measured planning latency to
        # the budget (reference greedy_mission.py:105-106; near-zero for
        # static paths but kept for a uniform Experiment surface)
        think = (
            think_time_per_step
            if cfg.evaluation.use_effective_mission_time
            else 0.0
        )
        k_init, k_wp, k_run = jax.random.split(key, 3)
        state0 = (
            init_state
            if init_state is not None
            else world.init_state(k_init, batch_size)
        )
        wps = self.waypoint_list(k_wp, batch_size)  # (B, T, 3)
        T = wps.shape[1] if max_steps is None else min(max_steps, wps.shape[1])
        metrics0 = {k: np.asarray(v) for k, v in world.evaluate(state0).items()}

        def step_fn(carry, inp):
            state, t = carry
            k = inp
            wp = wps[:, t, :]
            cost = travel_costs(wp, state.pos, cfg.uav.max_v, cfg.uav.max_a)
            # strict affordability: stop when budget <= cost
            # (reference lawn_mower_mission.py:130-131)
            can_move = state.active & (state.budget > cost)
            state = state.replace(active=can_move)
            state = world.step_position(state, wp, k)
            if think:
                state = state.replace(
                    budget=jnp.where(can_move, state.budget - think, state.budget)
                )
            metrics = world.evaluate(state)
            out_wp = jnp.where(can_move[:, None], wp, jnp.nan)
            return (state, t + 1), (metrics, out_wp, state.budget, can_move, cost)

        keys = jax.random.split(k_run, T)
        (state, _), (metrics_h, out_wps, budgets, actives, costs) = jax.lax.scan(
            step_fn, (state0, jnp.int32(0)), keys
        )
        metrics_out = {
            k: np.concatenate(
                [metrics0[k][:, None], np.asarray(metrics_h[k]).T], axis=1
            )
            for k in metrics0
        }
        return MissionResult(
            waypoints=np.asarray(out_wps).swapaxes(0, 1),
            metrics=metrics_out,
            budgets=np.concatenate(
                [np.asarray(state0.budget)[:, None], np.asarray(budgets).T], axis=1
            ),
            num_steps=np.asarray(jnp.sum(actives, axis=0)),
            flight_times=np.asarray(jnp.where(actives, costs, 0.0)).swapaxes(0, 1),
            final_state=state,
        )


class LawnmowerPlanner(WaypointListPlanner):
    name = "lawnmower"

    def waypoint_list(self, key: jax.Array, batch_size: int) -> jnp.ndarray:
        wps = lawnmower_waypoints(self.cfg, self.mission_cfg.step_size)
        return jnp.broadcast_to(
            jnp.asarray(wps, self.world.dtype), (batch_size,) + wps.shape
        )


class SpiralPlanner(WaypointListPlanner):
    name = "spiral"

    def waypoint_list(self, key: jax.Array, batch_size: int) -> jnp.ndarray:
        wps = spiral_waypoints(self.cfg, self.mission_cfg.num_waypoints)
        return jnp.broadcast_to(
            jnp.asarray(wps, self.world.dtype), (batch_size,) + wps.shape
        )


class RandomContinuousPlanner(WaypointListPlanner):
    """Uniform random waypoints in the boundary-inset box
    (reference planning/baselines/random_continuous_mission.py:60-101).
    The reference's ≤100 rejection trials per step only matter near budget
    exhaustion; budget truncation at execution handles that here."""

    name = "random_continuous"

    def waypoint_list(self, key: jax.Array, batch_size: int) -> jnp.ndarray:
        cfg = self.cfg
        con, env = cfg.constraints, cfg.environment
        # step bound: budget / min hop ≈ generous static T
        T = int(np.ceil(con.budget / max(con.dist_to_boundaries, 1.0))) + 4
        lo = jnp.asarray(
            [con.dist_to_boundaries, con.dist_to_boundaries, con.min_altitude],
            self.world.dtype,
        )
        hi = jnp.asarray(
            [
                env.extent_x - con.dist_to_boundaries,
                env.extent_y - con.dist_to_boundaries,
                con.max_altitude,
            ],
            self.world.dtype,
        )
        u = jax.random.uniform(key, (batch_size, T, 3), self.world.dtype)
        return lo + u * (hi - lo)


class RandomDiscretePlanner(Planner):
    """Uniform over feasible lattice actions (distance < 11.5, cost ≤ budget)
    (reference planning/baselines/random_discrete_mission.py:73-107)."""

    name = "random_discrete"
    MAX_DIST = 11.5

    def plan(
        self, state: BeliefState, key: jax.Array, step: jnp.ndarray
    ) -> jnp.ndarray:
        costs = action_costs_from(self.world, state.pos)
        ok = feasible_mask(
            self.world, state.pos, state.budget, costs, max_distance=self.MAX_DIST
        )
        logits = jnp.where(ok, 0.0, -jnp.inf)
        # missions with no feasible action get a dummy draw; the run loop
        # deactivates them via the affordability check
        safe = jnp.where(
            jnp.any(ok, axis=-1, keepdims=True), logits, 0.0
        )
        return jax.random.categorical(key, safe, axis=-1).astype(jnp.int32)

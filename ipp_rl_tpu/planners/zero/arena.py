"""Arena gating: previous vs candidate network (reference
planning/mcts_zero/arenas.py:14-56, mcts_zero_mission.py:417-455).

Each net plays G independent simulated games (cov-only dynamics from the
GP prior, greedy temperature-0 MCTS policy each step, cumulative
discounted reward); the candidate is accepted iff
curr / (prev + curr) ≥ network_update_threshold.

TPU-native: all G games per net run as one batched program — the
reference's tqdm loop over 2·G sequential games becomes two jitted
calls.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ipp_rl_tpu.config.schema import MCTSZeroHyperParams
from ipp_rl_tpu.env.world import IPPWorld
from ipp_rl_tpu.ops.geometry import travel_costs
from ipp_rl_tpu.planners.zero.features import init_history, push_history
from ipp_rl_tpu.planners.zero.mcts import ZeroMCTS


class Arena:
    def __init__(
        self,
        world: IPPWorld,
        hp: MCTSZeroHyperParams,
        episode_horizon: int,
        max_game_steps: int = 64,
    ):
        self.world = world
        self.hp = hp
        self.horizon = episode_horizon
        self.max_game_steps = max_game_steps

    def play_games(
        self,
        predict,
        prev_variables,
        curr_variables,
        num_games: int,
        key: jax.Array,
        num_simulations: int | None = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (total_reward_prev, total_reward_curr) summed over games.
        Both nets play the SAME jitted game program with different weights."""
        k1, k2 = jax.random.split(key)
        r_prev = self._play_batch(predict, prev_variables, num_games, k1, num_simulations)
        r_curr = self._play_batch(predict, curr_variables, num_games, k2, num_simulations)
        return jnp.sum(r_prev), jnp.sum(r_curr)

    def _play_batch(
        self, predict, net_variables, num_games: int, key: jax.Array, num_simulations=None
    ) -> jnp.ndarray:
        """G simulated games with greedy MCTS actions; belief evolves
        cov-only (no measurements — reference arenas.py:25-44)."""
        world, hp = self.world, self.hp
        cfg = world.cfg
        G = num_games
        dt = world.dtype
        mcts = ZeroMCTS(world, hp, self.horizon, predict)

        k_init, k_run = jax.random.split(key)
        state = world.init_state(k_init, G)
        # reference arena start position [0, 0, 10]
        start = jnp.asarray([0.0, 0.0, 10.0], dt)
        state = state.replace(pos=jnp.broadcast_to(start, (G, 3)))
        hist0 = jax.vmap(lambda _: init_history(cfg, hp, dt))(jnp.arange(G))

        def step_fn(carry, inp):
            cov, mean, pos, budget, hist, depth, total = carry
            k = inp
            k_search, k_pol = jax.random.split(k)
            running = budget > 0

            hist = jax.vmap(push_history)(
                hist, cov, pos, budget / jnp.asarray(cfg.constraints.budget, dt)
            )
            tree, _ = mcts.search(
                cov, mean, pos, budget, hist, k_search,
                net_variables=net_variables,
                num_simulations=num_simulations,
            )
            policy = mcts.root_policy(
                tree, k_pol, jnp.asarray(0.0, dt), deploy_time=False
            )
            action = jnp.argmax(policy, axis=-1).astype(jnp.int32)

            diag_masks = None
            if cfg.scenario.adaptive:
                from ipp_rl_tpu.ops.rewards import adaptive_mask

                diag_masks = jax.vmap(
                    lambda m, P: adaptive_mask(
                        m, jnp.diag(P), cfg.scenario.value_threshold,
                        cfg.scenario.interval_factor,
                    )
                )(mean, cov)
            outs = jax.vmap(lambda P, a, dm: mcts.edge_update(P, a, dm))(
                cov, action, diag_masks
            )
            Wc, gain = outs
            cost = travel_costs(
                world.actions_xyz[action], pos, cfg.uav.max_v, cfg.uav.max_a
            )
            reward = (gain / (cost + 1.0)).astype(dt)
            disc = jnp.asarray(hp.gamma, dt) ** depth.astype(dt)
            total = total + jnp.where(running, disc * reward, jnp.asarray(0.0, dt))
            # Wc is the TRANSPOSED (M, N) edge factor (ops/kalman
            # kf_gain_factor_t layout): P' = P − Wcᵀ·Wc
            cov_next = cov - jnp.einsum("bmn,bmk->bnk", Wc, Wc)
            keep = running[:, None, None]
            cov = jnp.where(keep, cov_next, cov)
            pos = jnp.where(running[:, None], world.actions_xyz[action], pos)
            budget = jnp.where(running, budget - cost, budget)
            return (cov, mean, pos, budget, hist, depth + 1, total), None

        keys = jax.random.split(k_run, self.max_game_steps)
        init = (
            state.cov,
            state.mean,
            state.pos,
            state.budget,
            hist0,
            jnp.int32(0),
            jnp.zeros((G,), dt),
        )
        final_carry, _ = jax.lax.scan(step_fn, init, keys)
        return final_carry[-1]

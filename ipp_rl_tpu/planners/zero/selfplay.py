"""Self-play episode generation — fully on device.

The reference forks 22 worker processes, each running EpisodeGenerators
that bz2-pickle samples to disk (reference
planning/mcts_zero/episode_generators.py:19-192,
mcts_zero_mission.py:324-344).  Here E environments play in lockstep as
one jitted program: fresh ground truth + shuffled priors per episode,
random start actions, optional random budgets, a full batched MCTS
search per step, policy sampling, simulated reward, real measurement
commit — then n-step discounted √-scaled value targets via a reverse
scan (reference episode_generators.py:157-184).

Output is a ``Trajectory`` of per-step belief snapshots rather than
materialized feature planes: planes are rebuilt in-jit at training time
from (cov, position, budget, mean) history — 16× smaller replay records.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ipp_rl_tpu.config.schema import Config, MCTSZeroHyperParams
from ipp_rl_tpu.env.world import IPPWorld
from ipp_rl_tpu.ops.geometry import travel_costs
from ipp_rl_tpu.ops.rewards import scale_value_target
from ipp_rl_tpu.planners.zero.features import (
    EpisodeHistory,
    feature_planes,
    init_history,
    push_history,
)
from ipp_rl_tpu.planners.zero.mcts import ZeroMCTS


class Trajectory(NamedTuple):
    """Self-play records; axes (E envs, T steps, ...)."""

    cov: jnp.ndarray  # (E, T, N, N) — belief cov when the decision was made
    mean: jnp.ndarray  # (E, T, N) — belief mean (adaptive-mask snapshot)
    prev_pos: jnp.ndarray  # (E, T, 3) — position the decision was made from
    budget: jnp.ndarray  # (E, T) — remaining budget at the decision
    policy: jnp.ndarray  # (E, T, A) — MCTS visit policy target
    valid_mask: jnp.ndarray  # (E, T, A)
    reward: jnp.ndarray  # (E, T) — simulated 1-step reward
    value: jnp.ndarray  # (E, T) — √-scaled n-step discounted target
    sample_ok: jnp.ndarray  # (E, T) bool
    init_budget: jnp.ndarray  # (E,)

    @property
    def num_samples(self):
        return self.sample_ok.sum()


def planes_from_sample(
    world: IPPWorld,
    hp: MCTSZeroHyperParams,
    covs: jnp.ndarray,  # (L, N, N) — history states, most recent first
    positions: jnp.ndarray,  # (L, 3)
    budget_fracs: jnp.ndarray,  # (L,)
    hist_len: jnp.ndarray,  # ()
    mean: jnp.ndarray,  # (N,)
) -> jnp.ndarray:
    """Rebuild the network input planes for one replay sample."""
    h = EpisodeHistory(
        covs=covs, positions=positions, budgets=budget_fracs, length=hist_len
    )
    return feature_planes(world, hp, h, mean=mean)


class SelfPlay:
    """Batched self-play generator bound to (world, hp, search)."""

    def __init__(
        self,
        world: IPPWorld,
        hp: MCTSZeroHyperParams,
        episode_horizon: int,
        mcts: ZeroMCTS,
    ):
        self.world = world
        self.hp = hp
        self.horizon = episode_horizon
        self.mcts = mcts

    def sample_episode_setup(self, key: jax.Array, num_envs: int):
        """Fresh worlds, shuffled priors, random start actions, optional
        random budgets (reference episode_generators.py:51-68)."""
        world, hp = self.world, self.hp
        cfg = world.cfg
        k_state, k_act, k_budget = jax.random.split(key, 3)
        budget = None
        if hp.shuffle_budget:
            budget = jnp.floor(
                jax.random.uniform(
                    k_budget, (num_envs,), minval=10.0, maxval=cfg.constraints.budget
                )
            ).astype(world.dtype)
        state = world.init_state(
            k_state, num_envs, shuffle_prior=hp.shuffle_prior_cov, budget=budget
        )
        init_action = jax.random.randint(
            k_act, (num_envs,), 0, world.num_actions
        ).astype(jnp.int32)
        state = state.replace(pos=world.actions_xyz[init_action])
        return state

    def run(
        self,
        key: jax.Array,
        num_envs: int,
        net_variables=None,
        puct_init: Optional[float] = None,
        dirichlet_alpha: Optional[float] = None,
        num_simulations: Optional[int] = None,
    ) -> Tuple[Trajectory, jnp.ndarray]:
        """Play one batch of episodes; returns (trajectory, episode values).

        Episode value = Σ γ^j r_j (reference episode_generators.py:158)."""
        world, hp = self.world, self.hp
        cfg = world.cfg
        E = num_envs
        T = hp.max_episode_steps
        dt = world.dtype
        n = cfg.environment.num_cells

        k_setup, k_run = jax.random.split(key)
        state = self.sample_episode_setup(k_setup, E)
        init_budget = state.budget
        hist0 = jax.vmap(lambda _: init_history(cfg, hp, dt))(jnp.arange(E))

        def step_fn(carry, inp):
            state, hist, depth = carry
            k = inp
            k_search, k_pol, k_sample, k_meas = jax.random.split(k, 4)

            # running-episode mask (reference :112: depth < max_steps and
            # budget >= resolution)
            running = state.active & (
                state.budget >= cfg.environment.resolution
            )

            # budget fraction normalized by the CONFIG budget, matching the
            # reference even under shuffled episode budgets (reference
            # episode_generators.py:113 uses meta initial_budget)
            hist = jax.vmap(push_history)(
                hist,
                state.cov,
                state.pos,
                state.budget / jnp.asarray(cfg.constraints.budget, dt),
            )

            tree, root_mask = self.mcts.search(
                state.cov,
                state.mean,
                state.pos,
                state.budget,
                hist,
                k_search,
                net_variables=net_variables,
                puct_init=puct_init,
                dirichlet_alpha=dirichlet_alpha,
                num_simulations=num_simulations,
            )
            # an env with NO valid action terminates (the reference's
            # next_actions_msk.sum() == 0 guard, reference mcts.py:200-201)
            # — otherwise the uniform-fallback policy samples the zero-cost
            # current-position action forever, repeatedly measuring the
            # same cells until the f32 covariance collapses
            running = running & (jnp.sum(root_mask, axis=-1) > 0)
            temperature = jnp.asarray(
                hp.temperature_scale * (depth < hp.temperature_threshold), dt
            )
            # prune with the SAME (decayed) exploration constant the search
            # used (reference prunes via compute_uct on the live
            # hyper_params dict, reference mcts.py:106,233-243)
            policy = self.mcts.root_policy(
                tree, k_pol, temperature, puct_init=puct_init
            )

            # sample an action per env (reference :135)
            logits = jnp.log(jnp.maximum(policy, 1e-30))
            action = jax.random.categorical(k_sample, logits, axis=-1).astype(
                jnp.int32
            )

            # stored TARGET may be entropy-smoothed (opt-in, schema
            # policy_target_smoothing); the sampling above always uses
            # the un-smoothed reference distribution
            policy_target = policy
            if hp.policy_target_smoothing > 0.0:
                eps = jnp.asarray(hp.policy_target_smoothing, dt)
                nvalid = jnp.maximum(
                    jnp.sum(root_mask.astype(dt), axis=-1, keepdims=True), 1.0
                )
                uniform = root_mask.astype(dt) / nvalid
                policy_target = (1.0 - eps) * policy + eps * uniform

            # simulated 1-step reward BEFORE committing (reference :137-144)
            diag_masks = None
            if cfg.scenario.adaptive:
                from ipp_rl_tpu.ops.rewards import adaptive_mask

                diag_masks = jax.vmap(
                    lambda m, P: adaptive_mask(
                        m,
                        jnp.diag(P),
                        cfg.scenario.value_threshold,
                        cfg.scenario.interval_factor,
                    )
                )(state.mean, state.cov)
            gains = jax.vmap(
                lambda P, a, dm: self.mcts.edge_update(P, a, dm)[1]
            )(state.cov, action, diag_masks)
            costs = travel_costs(
                world.actions_xyz[action], state.pos, cfg.uav.max_v, cfg.uav.max_a
            )
            reward = gains / (costs + 1.0)

            record = dict(
                cov=state.cov,
                mean=state.mean,
                prev_pos=state.pos,
                budget=state.budget,
                policy=policy_target,
                valid_mask=root_mask,
                reward=jnp.where(running, reward, 0.0),
                sample_ok=running & (jnp.sum(root_mask, axis=-1) > 0),
            )

            # real measurement + commit (reference :145-148)
            state = state.replace(active=running)
            state = world.step_index(state, action, k_meas)
            return (state, hist, depth + 1), record

        keys = jax.random.split(k_run, T)
        (state, _, _), records = jax.lax.scan(
            step_fn, (state, hist0, jnp.int32(0)), keys
        )

        # records are stacked (T, E, ...) — transpose to (E, T, ...)
        def et(x):
            return jnp.swapaxes(x, 0, 1)

        rewards = et(records["reward"])  # (E, T)
        ok = et(records["sample_ok"])

        # n-step discounted targets: value_i = Σ_{j=i}^{min(i+H, T)-1} γ^{j-i} r_j
        # — truncated, no bootstrap (reference :162-164).  NOTE the reference
        # discounts by γ^j from the episode start rather than γ^{j-i}; with
        # the canonical γ = 1 they coincide, and the window-relative form is
        # the standard n-step return, so we use it.
        gamma = hp.gamma

        def value_targets(r):
            T_ = r.shape[0]

            def body(i, acc):
                k = T_ - 1 - i
                window = jnp.minimum(self.horizon, T_ - k)

                def horizon_sum(_):
                    idx = k + jnp.arange(self.horizon + 1)
                    valid = jnp.arange(self.horizon + 1) < window
                    rr = jnp.where(valid, r[jnp.minimum(idx, T_ - 1)], 0.0)
                    g = gamma ** jnp.arange(self.horizon + 1).astype(r.dtype)
                    return jnp.sum(rr * g)

                acc = acc.at[k].set(horizon_sum(None))
                return acc

            return jax.lax.fori_loop(0, T_, body, jnp.zeros_like(r))

        values = jax.vmap(value_targets)(rewards)
        values = scale_value_target(values)

        traj = Trajectory(
            cov=et(records["cov"]),
            mean=et(records["mean"]),
            prev_pos=et(records["prev_pos"]),
            budget=et(records["budget"]),
            policy=et(records["policy"]),
            valid_mask=et(records["valid_mask"]),
            reward=rewards,
            value=values,
            sample_ok=ok,
            init_budget=init_budget,
        )
        disc = gamma ** jnp.arange(T, dtype=dt)
        episode_values = jnp.sum(rewards * disc[None, :], axis=-1)
        return traj, episode_values

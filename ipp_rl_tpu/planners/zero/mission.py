"""Deploy-time MCTS-zero planner (reference
planning/mcts_zero/mcts_zero_mission.py:469-666 ``replan``/``execute``).

Per replan step: push the episode history, run the batched search
(root-parallel workers become an extra vmapped tree axis whose visit
counts are summed — replacing the reference's ``Pool`` of
``run_deploy_time_mcts_worker`` processes, reference :36-55, 504-523),
take the argmax action, measure, commit, repeat until the budget is
exhausted.  ``num_mcts_simulations ≤ 0`` bypasses the search and acts on
the raw policy-network argmax (reference :478-502).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ipp_rl_tpu.config.schema import MissionConfig
from ipp_rl_tpu.env.world import BeliefState, IPPWorld
from ipp_rl_tpu.ops.geometry import travel_costs
from ipp_rl_tpu.planners.base import MissionResult, Planner
from ipp_rl_tpu.planners.zero.features import (
    feature_planes,
    init_history,
    push_history,
)
from ipp_rl_tpu.planners.zero.mcts import ZeroMCTS


class ZeroPlanner(Planner):
    """Batched deployment of a trained policy-value net."""

    name = "mcts_zero"

    def __init__(
        self,
        world: IPPWorld,
        mission_cfg: MissionConfig,
        predict,  # (variables, planes, masks) -> (policy, value)
        variables,
        num_root_parallel: int = 1,
        deploy_mode: str = "reference",
    ):
        """``deploy_mode="reference"`` keeps the reference's deploy-time
        search verbatim (root Dirichlet noise + forced playouts stay ON
        — reference mcts.py:221-222,236 apply both unconditionally).
        ``"clean"`` switches both off for deployment: they are
        self-play exploration mechanisms (KataGo disables them at
        deployment), and with
        ~50 valid actions the forced-playout floor alone spreads ~2
        visits to every valid action, washing out the argmax-visit
        decision at low simulation counts.  Documented deviation;
        evaluated in runs/quality_vs_runtime."""
        super().__init__(world, mission_cfg)
        self.hp = mission_cfg.hyper_params
        self.predict = predict
        self.variables = variables
        self.num_root_parallel = num_root_parallel
        assert deploy_mode in ("reference", "clean")
        self.deploy_mode = deploy_mode
        self.mcts = ZeroMCTS(
            world, self.hp, mission_cfg.episode_horizon, predict
        )

    def _replan(self, state: BeliefState, hist, key: jax.Array) -> jnp.ndarray:
        """One planning decision for the whole batch: (B,) actions."""
        hp = self.hp
        dt = self.world.dtype
        if hp.num_mcts_simulations <= 0:
            # raw policy-net argmax (reference :478-502)
            planes = jax.vmap(
                lambda h, m: feature_planes(self.world, hp, h, m)
            )(hist, state.mean)
            masks = jax.vmap(self.mcts.valid_actions)(state.pos, state.budget)
            policy, _ = self.predict(self.variables, planes, masks.astype(dt))
            policy = policy * masks
            return jnp.argmax(policy, axis=-1).astype(jnp.int32)

        W = self.num_root_parallel
        clean = self.deploy_mode == "clean"
        search_kw = dict(
            net_variables=self.variables,
            forced_playouts=not clean,
            root_noise=not clean,
        )
        k_search, k_tie = jax.random.split(key)
        if W == 1:
            tree, _ = self.mcts.search(
                state.cov, state.mean, state.pos, state.budget, hist, k_search,
                **search_kw,
            )
            visits = tree.Nsa[:, 0]  # (B, A)
        else:
            # root-parallel: W independent searches, summed visit counts
            keys = jax.random.split(k_search, W)
            visit_stack = jax.vmap(
                lambda k: self.mcts.search(
                    state.cov, state.mean, state.pos, state.budget, hist, k,
                    **search_kw,
                )[0].Nsa[:, 0]
            )(keys)
            visits = jnp.sum(visit_stack, axis=0)
        # random tie-break among maximal visit counts — a plain argmax is
        # first-index biased, which matters at low simulation counts
        from ipp_rl_tpu.planners.zero.mcts import _rand_argmax

        tie_keys = jax.random.split(k_tie, visits.shape[0])
        return jax.vmap(_rand_argmax)(tie_keys, visits)

    def run(
        self,
        key: jax.Array,
        batch_size: int,
        max_steps: Optional[int] = None,
        init_state: Optional[BeliefState] = None,
        think_time_per_step: float = 0.0,
    ) -> MissionResult:
        world, cfg, hp = self.world, self.cfg, self.hp
        dt = world.dtype
        T = max_steps if max_steps is not None else self.max_steps()
        think = (
            think_time_per_step
            if cfg.evaluation.use_effective_mission_time
            else 0.0
        )
        k_init, k_run = jax.random.split(key)
        state0 = (
            init_state
            if init_state is not None
            else world.init_state(k_init, batch_size)
        )
        metrics0 = {k: np.asarray(v) for k, v in world.evaluate(state0).items()}
        hist0 = jax.vmap(lambda _: init_history(cfg, hp, dt))(
            jnp.arange(batch_size)
        )

        def step_fn(carry, k):
            state, hist, t = carry
            k_plan, k_meas = jax.random.split(k)
            # replan loop runs while budget >= resolution (reference :613);
            # budget fraction normalized by the config budget
            hist = jax.vmap(push_history)(
                hist,
                state.cov,
                state.pos,
                state.budget / jnp.asarray(cfg.constraints.budget, dt),
            )
            action = self._replan(state, hist, k_plan)
            cost = travel_costs(
                world.actions_xyz[action], state.pos, cfg.uav.max_v, cfg.uav.max_a
            )
            can_move = (
                state.active
                & (state.budget >= cfg.environment.resolution)
                & (cost <= state.budget)
                & (cost > 0)
            )
            state = state.replace(active=can_move)
            state = world.step_index(state, action, k_meas)
            if think:
                state = state.replace(
                    budget=jnp.where(can_move, state.budget - think, state.budget)
                )
            metrics = world.evaluate(state)
            wp = jnp.where(can_move[:, None], world.actions_xyz[action], jnp.nan)
            return (state, hist, t + 1), (metrics, wp, state.budget, can_move, cost)

        keys = jax.random.split(k_run, T)
        (state, _, _), (metrics_h, wps, budgets, actives, costs) = jax.lax.scan(
            step_fn, (state0, hist0, jnp.int32(0)), keys
        )

        metrics_out = {
            k: np.concatenate(
                [metrics0[k][:, None], np.asarray(metrics_h[k]).T], axis=1
            )
            for k in metrics0
        }
        return MissionResult(
            waypoints=np.asarray(wps).swapaxes(0, 1),
            metrics=metrics_out,
            budgets=np.concatenate(
                [np.asarray(state0.budget)[:, None], np.asarray(budgets).T], axis=1
            ),
            num_steps=np.asarray(jnp.sum(actives, axis=0)),
            flight_times=np.asarray(jnp.where(actives, costs, 0.0)).swapaxes(0, 1),
            final_state=state,
        )

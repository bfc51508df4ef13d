"""CMA-ES trajectory-refinement planner (reference planning/ipp_masha.py).

Replan = greedy horizon initialization → CMA-ES refinement of the
flattened 3H-dim waypoint vector (reference :160-219), objective
−Σ reward·(cost+1) / path_cost with out-of-bounds penalty 100
(reference :102-140); the greedy solution is kept if CMA-ES fails to
beat it (:214-215).  Adaptive scenarios execute only the first refined
waypoint, then replan (:234-235).

TPU-native: CMA-ES itself is small dense linear algebra implemented in
jnp (evosax-style CSA/rank-μ update) and the whole population evaluates
as one vmapped trajectory simulation — the reference's
``EvalParallel2(4)`` process pool becomes a single fused kernel.  The
per-coordinate ``CMA_stds`` scaling enters as the initial diagonal
covariance.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ipp_rl_tpu.config.schema import MissionConfig
from ipp_rl_tpu.env.world import BeliefState, IPPWorld
from ipp_rl_tpu.ops.geometry import travel_costs
from ipp_rl_tpu.ops.rewards import adaptive_mask
from ipp_rl_tpu.planners.base import MissionResult, Planner
from ipp_rl_tpu.planners.greedy import greedy_search_horizon


class CMAState(NamedTuple):
    mean: jnp.ndarray  # (D,)
    sigma: jnp.ndarray  # ()
    C: jnp.ndarray  # (D, D)
    p_sigma: jnp.ndarray  # (D,)
    p_c: jnp.ndarray  # (D,)


def cma_es_minimize(
    objective,  # (pop (λ, D)) -> (λ,) batched losses
    x0: jnp.ndarray,
    sigma_scales: jnp.ndarray,
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    popsize: int,
    maxiter: int,
    key: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Minimal CMA-ES with CSA step-size control and rank-1 + rank-μ
    covariance adaptation.  Returns (best_x, best_loss)."""
    D = x0.shape[0]
    dt = x0.dtype
    lam = popsize
    mu = lam // 2
    # strategy constants are trace-time Python floats (no dtype promotion)
    w_np = np.log(mu + 0.5) - np.log(np.arange(1, mu + 1))
    w_np = w_np / w_np.sum()
    w = jnp.asarray(w_np, dt)
    mu_eff = float(1.0 / np.sum(w_np**2))
    c_sigma = (mu_eff + 2.0) / (D + mu_eff + 5.0)
    d_sigma = 1.0 + 2.0 * max(0.0, np.sqrt((mu_eff - 1.0) / (D + 1.0)) - 1.0) + c_sigma
    c_c = (4.0 + mu_eff / D) / (D + 4.0 + 2.0 * mu_eff / D)
    c_1 = 2.0 / ((D + 1.3) ** 2 + mu_eff)
    c_mu = min(
        1.0 - c_1, 2.0 * (mu_eff - 2.0 + 1.0 / mu_eff) / ((D + 2.0) ** 2 + mu_eff)
    )
    chi_n = float(np.sqrt(D) * (1.0 - 1.0 / (4.0 * D) + 1.0 / (21.0 * D * D)))

    init = CMAState(
        mean=x0,
        sigma=jnp.asarray(1.0, x0.dtype),
        C=jnp.diag(sigma_scales**2),
        p_sigma=jnp.zeros_like(x0),
        p_c=jnp.zeros_like(x0),
    )

    def gen(carry, k):
        st, best_x, best_f = carry
        evals, B = jnp.linalg.eigh(st.C)
        evals = jnp.maximum(evals, 1e-20)
        Dm = B * jnp.sqrt(evals)[None, :]  # C^{1/2}
        z = jax.random.normal(k, (lam, D), x0.dtype)
        y = z @ Dm.T  # (λ, D) ~ N(0, C)
        x = st.mean[None, :] + st.sigma * y
        x = jnp.clip(x, lower[None, :], upper[None, :])
        f = objective(x)

        order = jnp.argsort(f)
        x_sel = x[order[:mu]]
        y_sel = (x_sel - st.mean[None, :]) / st.sigma

        mean_new = st.mean + jnp.sum(w[:, None] * (x_sel - st.mean[None, :]), axis=0)
        y_w = jnp.sum(w[:, None] * y_sel, axis=0)

        C_inv_sqrt = B * (1.0 / jnp.sqrt(evals))[None, :] @ B.T
        p_sigma = (1.0 - c_sigma) * st.p_sigma + jnp.sqrt(
            c_sigma * (2.0 - c_sigma) * mu_eff
        ) * (C_inv_sqrt @ y_w)
        sigma_new = st.sigma * jnp.exp(
            (c_sigma / d_sigma) * (jnp.linalg.norm(p_sigma) / chi_n - 1.0)
        )
        h_sigma = (
            jnp.linalg.norm(p_sigma) / jnp.sqrt(1.0 - (1.0 - c_sigma) ** 2)
            < (1.4 + 2.0 / (D + 1.0)) * chi_n
        ).astype(x0.dtype)
        p_c = (1.0 - c_c) * st.p_c + h_sigma * jnp.sqrt(
            c_c * (2.0 - c_c) * mu_eff
        ) * y_w
        rank1 = jnp.outer(p_c, p_c)
        rank_mu = jnp.einsum("i,ij,ik->jk", w, y_sel, y_sel)
        C_new = (
            (1.0 - c_1 - c_mu) * st.C
            + c_1 * (rank1 + (1.0 - h_sigma) * c_c * (2.0 - c_c) * st.C)
            + c_mu * rank_mu
        )
        C_new = 0.5 * (C_new + C_new.T)

        gen_best = f[order[0]]
        better = gen_best < best_f
        best_x = jnp.where(better, x[order[0]], best_x)
        best_f = jnp.where(better, gen_best, best_f)
        st = CMAState(mean_new, sigma_new, C_new, p_sigma, p_c)
        return (st, best_x, best_f), None

    keys = jax.random.split(key, maxiter)
    (st, best_x, best_f), _ = jax.lax.scan(
        gen, (init, x0, jnp.asarray(jnp.inf, x0.dtype)), keys
    )
    return best_x, best_f


class CMAESPlanner(Planner):
    """Greedy-init + CMA-ES refined replanning (reference IPPMashaMission)."""

    name = "cmaes"

    def __init__(self, world: IPPWorld, mission_cfg: MissionConfig):
        super().__init__(world, mission_cfg)
        self.horizon = max(mission_cfg.episode_horizon, 1)
        self.popsize = mission_cfg.cma_popsize
        self.maxiter = mission_cfg.cma_maxiter
        # per-coordinate sigma scales (reference :142-158): xy = sigma0,
        # z capped at half the altitude band
        con = self.cfg.constraints
        s = mission_cfg.cma_sigma
        sz = min(s, (con.max_altitude - con.min_altitude) / 2.0)
        self.sigma_scales = np.tile([s, s, sz], self.horizon).astype(np.float32)
        # mission-scan dispatch chunk (see run(); host-chunked to dodge
        # the axon big-program worker crash)
        self.scan_chunk = 4

    def _trajectory_loss(
        self,
        flat_wps: jnp.ndarray,  # (D,) = (H*3,)
        cov: jnp.ndarray,
        mean: jnp.ndarray,
        pos: jnp.ndarray,
        budget: jnp.ndarray,
    ) -> jnp.ndarray:
        """−Σ reward·(cost+1) / path_cost with OOB penalty
        (reference ipp_masha.py:102-140)."""
        cfg = self.cfg
        world = self.world
        H = self.horizon
        wps = flat_wps.reshape(H, 3)
        from ipp_rl_tpu.ops.geometry import out_of_bounds

        oob = jnp.any(out_of_bounds(wps, cfg))

        prevs = jnp.concatenate([pos[None, :], wps[:-1]], axis=0)
        seg_costs = travel_costs(wps, prevs, cfg.uav.max_v, cfg.uav.max_a)
        path_cost = jnp.sum(seg_costs)

        dm = None
        if cfg.scenario.adaptive:
            dm = adaptive_mask(
                mean, jnp.diag(cov),
                cfg.scenario.value_threshold, cfg.scenario.interval_factor,
            )

        def body(carry, wp_cost):
            from ipp_rl_tpu.ops.kalman import kf_gain_factor_t

            P, prev, rem, total, alive = carry
            wp, cost = wp_cost
            alive = alive & (cost <= rem)
            Hm, R, _, _ = world.measurement_model_at(wp)
            Wc, _ = kf_gain_factor_t(P, Hm, R)  # (M, N) transposed layout
            sq = jnp.sum(Wc * Wc, axis=-2)
            if dm is not None:
                sq = sq * dm
            gain = jnp.sum(sq)
            reward = gain / (cost + 1.0)
            total = total + jnp.where(alive, reward * (cost + 1.0), 0.0)
            P = jnp.where(alive, P - jnp.einsum("mn,mc->nc", Wc, Wc), P)
            rem = jnp.where(alive, rem - cost, rem)
            return (P, wp, rem, total, alive), None

        (P, _, _, total, _), _ = jax.lax.scan(
            body,
            (cov, pos, budget, jnp.asarray(0.0, cov.dtype), jnp.bool_(True)),
            (wps, seg_costs),
        )
        loss = -total / jnp.maximum(path_cost, 1e-12)
        bad = oob | (path_cost <= 0)
        return jnp.where(bad, 100.0, loss)

    def replan_batch(
        self, state: BeliefState, key: jax.Array
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, H, 3) refined waypoint plans + (B,) validity."""
        world = self.world
        H = self.horizon
        actions, valids = greedy_search_horizon(world, state, H)
        greedy_wps = world.actions_xyz[actions]  # (B, H, 3)
        any_valid = valids[:, 0]

        cfg = self.cfg
        lower = jnp.tile(
            jnp.asarray([0.0, 0.0, cfg.constraints.min_altitude], world.dtype), H
        )
        upper = jnp.tile(
            jnp.asarray(
                [cfg.environment.extent_x, cfg.environment.extent_y,
                 cfg.constraints.max_altitude],
                world.dtype,
            ),
            H,
        )
        scales = jnp.asarray(self.sigma_scales, world.dtype)

        def refine(P, mean, pos, budget, wps0, k):
            x0 = wps0.reshape(-1)
            obj = jax.vmap(
                lambda x: self._trajectory_loss(x, P, mean, pos, budget)
            )
            best_x, best_f = cma_es_minimize(
                obj, x0, scales, lower, upper, self.popsize, self.maxiter, k
            )
            greedy_f = self._trajectory_loss(x0, P, mean, pos, budget)
            # keep greedy if better (reference :214-215)
            use_cma = best_f < greedy_f
            return jnp.where(use_cma, best_x, x0).reshape(H, 3)

        keys = jax.random.split(key, state.batch_size)
        wps = jax.vmap(refine)(
            state.cov, state.mean, state.pos, state.budget, greedy_wps, keys
        )
        return wps, any_valid

    def run(
        self,
        key: jax.Array,
        batch_size: int,
        max_steps: Optional[int] = None,
        init_state: Optional[BeliefState] = None,
        think_time_per_step: float = 0.0,
    ) -> MissionResult:
        """Adaptive replanning loop: refine a horizon, execute the first
        waypoint, repeat (reference :221-251 adaptive branch)."""
        world, cfg = self.world, self.cfg
        # effective mission time (reference greedy_mission.py:105-106)
        think = (
            think_time_per_step
            if cfg.evaluation.use_effective_mission_time
            else 0.0
        )
        T = max_steps if max_steps is not None else self.max_steps()
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
            wps, any_valid = self.replan_batch(state, k_plan)
            wp = wps[:, 0, :]
            cost = travel_costs(wp, state.pos, cfg.uav.max_v, cfg.uav.max_a)
            # t < T masks the chunk-padding steps past the requested
            # horizon: without it a T % scan_chunk != 0 mission really
            # executes up to chunk-1 extra moves whose effects land in
            # final_state while the per-step outputs are trimmed below
            can_move = (
                state.active
                & any_valid
                & (cost <= state.budget)
                & (cost > 0)
                & (t < T)
            )
            state = state.replace(active=can_move)
            state = world.step_position(state, wp, k_meas)
            if think:
                state = state.replace(
                    budget=jnp.where(can_move, state.budget - think, state.budget)
                )
            metrics = world.evaluate(state)
            out_wp = jnp.where(can_move[:, None], wp, jnp.nan)
            return (state, t + 1), (metrics, out_wp, state.budget, can_move, cost)

        # The mission loop is scanned in fixed-size chunks dispatched
        # from the host rather than one T-step mega-scan: a single scan
        # whose body nests the full CMA-ES (maxiter × popsize × horizon
        # rollouts) × tens of mission steps reliably crashes this
        # environment's TPU worker (same axon big-program pathology as
        # the compile hang documented in CLAUDE.md).  One compiled
        # chunk program serves every dispatch; semantics are identical.
        chunk = min(self.scan_chunk, T)
        n_chunks = -(-T // chunk)
        keys = jax.random.split(k_run, n_chunks * chunk)

        @jax.jit
        def scan_chunk(carry, ks):
            return jax.lax.scan(step_fn, carry, ks)

        carry = (state0, jnp.int32(0))
        outs = []
        for c in range(n_chunks):
            carry, out = scan_chunk(carry, keys[c * chunk : (c + 1) * chunk])
            outs.append(out)
        state, _ = carry
        (metrics_h, wps, budgets, actives, costs) = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs
        )
        # trim the padding steps beyond the requested horizon
        metrics_h = {k: v[:T] for k, v in metrics_h.items()}
        wps, budgets = wps[:T], budgets[:T]
        actives, costs = actives[:T], costs[:T]
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

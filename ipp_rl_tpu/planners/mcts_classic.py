"""Classic (non-neural) MCTS planner with progressive widening
(reference planning/mcts_mission.py:24-415).

Behaviors reproduced:
  * progressive widening: expand while children ≤ k·visits^α and fewer
    than the available-action count (reference :263-272),
  * ε-greedy expansion and rollout policies — the greedy branch prices
    every available action with a one-step KF sweep (reference :232-256),
  * optional generalized cost-benefit (GCB) softmax rollout (:175-209),
  * UCT with min-max-normalized child values, c·√(ln N_parent / N_child),
    ∞ for unvisited children, −∞ for unaffordable ones (:42-75),
  * reward accumulation WITHOUT discount at interior edges — γ only
    inside rollouts (reference :298 vs :190,:226 — reference quirk kept),
  * root-parallel search: ``num_mcts_workers`` independent trees as a
    vmapped axis, each running num_simulations/num_workers sims, root
    stats merged by summed per-action visit/value (:312-389
    run_simulations_proxy / merge_roots / select_best_child).

TPU design: array tree vmapped over missions, rank-M edge factors for
covariance reconstruction (same trick as the zero search), the ε-greedy
sweep is the fused ``kf_sweep_gains`` kernel.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ipp_rl_tpu.config.schema import MissionConfig
from ipp_rl_tpu.env.world import BeliefState, IPPWorld
from ipp_rl_tpu.ops.geometry import travel_costs
from ipp_rl_tpu.ops.kalman import kf_sweep_gains_structured
from ipp_rl_tpu.ops.rewards import adaptive_mask
from ipp_rl_tpu.planners.base import Planner

NO_NODE = jnp.int32(-1)


class CTree(NamedTuple):
    """Classic-MCTS per-mission tree (leading axis: node capacity)."""

    parent: jnp.ndarray  # (C,) int32
    action_in: jnp.ndarray  # (C,) int32
    wc_in: jnp.ndarray  # (C, M, N) — transposed factor layout
    budget: jnp.ndarray  # (C,)
    visits: jnp.ndarray  # (C,)
    value_sum: jnp.ndarray  # (C,)
    num_children: jnp.ndarray  # (C,) int32
    children: jnp.ndarray  # (C, Cmax_children) int32 — child node ids
    next_free: jnp.ndarray  # () int32


class ClassicMCTSPlanner(Planner):
    name = "mcts"

    def __init__(self, world: IPPWorld, mission_cfg: MissionConfig):
        super().__init__(world, mission_cfg)
        mc = mission_cfg
        self.num_workers = max(1, mc.num_mcts_workers)
        # reference replan: num_simulations / num_workers sims per root
        # (reference mcts_mission.py:361-362)
        self.num_simulations = max(1, mc.num_simulations // self.num_workers)
        self.gamma = mc.gamma  # reference mcts_mission.py:89,149
        self.c = mc.uct_c
        self.horizon = max(mc.episode_horizon, 2)
        self.k = mc.k
        self.alpha = mc.alpha
        self.eps_expand = mc.epsilon_expand  # reference :94,154
        self.eps_rollout = mc.epsilon_rollout  # reference :95,155
        self.max_greedy_radius = mc.horizontal_spacing  # distance cap [m]
        self.use_gcb = mc.use_gcb_rollout
        self.max_children = min(world.num_actions, self.num_simulations + 1)

    # ------------------------------------------------------------ helpers

    def _available(self, pos: jnp.ndarray, budget: jnp.ndarray) -> jnp.ndarray:
        """Feasible actions: flight time within budget, distance-capped
        (reference mcts_mission.py:167-173)."""
        w = self.world
        ft = travel_costs(w.actions_xyz, pos[None, :], self.cfg.uav.max_v, self.cfg.uav.max_a)
        d = jnp.sqrt(jnp.sum(jnp.square(w.actions_xyz - pos[None, :]), axis=-1))
        return (ft > 0) & (ft <= budget) & (d < self.max_greedy_radius)

    def _diag_mask(self, mean: jnp.ndarray, P: jnp.ndarray):
        if not self.cfg.scenario.adaptive:
            return None
        return adaptive_mask(
            mean, jnp.diag(P),
            self.cfg.scenario.value_threshold, self.cfg.scenario.interval_factor,
        )

    def _sweep_rewards(self, P, pos, mean):
        """Reward of every action against covariance P from position pos."""
        w = self.world
        gains = kf_sweep_gains_structured(
            P, w.sweep_groups, w.sweep_perm, self._diag_mask(mean, P)
        )
        costs = travel_costs(w.actions_xyz, pos[None, :], self.cfg.uav.max_v, self.cfg.uav.max_a)
        return gains / (costs + 1.0), costs

    def _edge(self, P, a, mean):
        """(Wcᵀ (M, N), gain) for taking action a from covariance P
        (transposed factor layout, ops/kalman TPU cost model)."""
        from ipp_rl_tpu.ops.kalman import kf_gain_factor_t

        w = self.world
        WcT, _ = kf_gain_factor_t(P, w.H[a], w.R_diag[a])
        sq = jnp.sum(WcT * WcT, axis=-2)
        dm = self._diag_mask(mean, P)
        if dm is not None:
            sq = sq * dm
        return WcT, jnp.sum(sq)

    def _policy_action(
        self, P, pos, budget, mean, eps, key, gcb: bool
    ) -> jnp.ndarray:
        """ε-greedy (or GCB softmax) action (reference :192-256)."""
        rewards, costs = self._sweep_rewards(P, pos, mean)
        avail = self._available(pos, budget)
        k_mode, k_rand, k_soft = jax.random.split(key, 3)
        any_avail = jnp.any(avail)
        if gcb:
            logits = jnp.where(avail, rewards, -jnp.inf)
            return jax.random.categorical(k_soft, logits)
        greedy = jnp.argmax(jnp.where(avail, rewards, -jnp.inf))
        rand_logits = jnp.where(avail, 0.0, -jnp.inf)
        rand_a = jax.random.categorical(
            k_rand, jnp.where(any_avail, rand_logits, jnp.zeros_like(rand_logits))
        )
        use_greedy = (jax.random.uniform(k_mode) > eps) & any_avail
        return jnp.where(use_greedy, greedy, rand_a).astype(jnp.int32)

    # ----------------------------------------------------------- simulate

    def _rollout(self, P, pos, budget, mean, key) -> jnp.ndarray:
        """ε-greedy / GCB rollout to the horizon (reference :175-226)."""
        dt = P.dtype
        res = self.cfg.environment.resolution

        def body(carry, k):
            P, pos, budget, depth, G, disc, alive = carry
            alive = alive & (budget >= res)
            a = self._policy_action(
                P, pos, budget, mean, self.eps_rollout, k, self.use_gcb
            )
            Wc, gain = self._edge(P, a, mean)
            cost = travel_costs(
                self.world.actions_xyz[a], pos, self.cfg.uav.max_v, self.cfg.uav.max_a
            )
            reward = gain / (cost + 1.0)
            G = G + jnp.where(alive, disc * reward, 0.0)
            P = jnp.where(alive, P - jnp.einsum("mn,mc->nc", Wc, Wc), P)
            pos = jnp.where(alive, self.world.actions_xyz[a], pos)
            budget = jnp.where(alive, budget - cost, budget)
            return (P, pos, budget, depth + 1, G, disc * self.gamma, alive), None

        init = (P, pos, budget, jnp.int32(0), jnp.asarray(0.0, dt), jnp.asarray(1.0, dt), jnp.bool_(True))
        keys = jax.random.split(key, self.horizon)
        (P, pos, budget, _, G, _, _), _ = jax.lax.scan(body, init, keys)
        return G

    def _uct_select(self, tree: CTree, node, pos, budget, key) -> jnp.ndarray:
        """UCT over existing children (reference :42-75).  Returns child slot."""
        Cmax = self.max_children
        slots = jnp.arange(Cmax)
        cids = tree.children[node]
        exists = slots < tree.num_children[node]
        cvis = jnp.where(exists, tree.visits[jnp.maximum(cids, 0)], 1.0)
        cval = jnp.where(
            exists, tree.value_sum[jnp.maximum(cids, 0)] / jnp.maximum(cvis, 1.0), 0.0
        )
        vmin = jnp.min(jnp.where(exists, cval, jnp.inf))
        vmax = jnp.max(jnp.where(exists, cval, -jnp.inf))
        # reference Node.uct quirk KEPT verbatim (mcts_mission.py:48-55):
        # the "normalization" is value − min/(max−min) — an operator-
        # precedence bug in the reference that effectively ranks children
        # by raw mean value shifted by a constant.  Replicating it (not
        # the intended (v−min)/(max−min)) matches the reference's
        # exploit-leaning search behavior (quality-parity verified in
        # runs/parity).
        norm = jnp.where(
            vmax == 0,
            cval,
            jnp.where(
                vmax == vmin,
                cval / jnp.where(vmax == 0, 1.0, vmax),
                cval - vmin / jnp.maximum(vmax - vmin, 1e-30),
            ),
        )
        parent_visits = jnp.maximum(tree.visits[node], 1.0)
        explore = self.c * jnp.sqrt(jnp.log(parent_visits) / jnp.maximum(cvis, 1e-30))
        uct = jnp.where(
            tree.visits[jnp.maximum(cids, 0)] == 0, jnp.inf, norm + explore
        )
        # unaffordable children → -inf (reference :66-67)
        ca = jnp.maximum(tree.action_in[jnp.maximum(cids, 0)], 0)
        cost = travel_costs(
            self.world.actions_xyz[ca], pos[None, :].repeat(Cmax, 0),
            self.cfg.uav.max_v, self.cfg.uav.max_a,
        )
        uct = jnp.where((cost == 0) | (cost >= budget), -jnp.inf, uct)
        uct = jnp.where(exists, uct, -jnp.inf)
        from ipp_rl_tpu.planners.zero.mcts import _rand_argmax

        return _rand_argmax(key, uct)

    def _simulate_one(self, tree: CTree, P_root, root_pos, mean, key) -> CTree:
        """One MCTS simulation for one mission (reference :274-304)."""
        dt = P_root.dtype
        res = self.cfg.environment.resolution
        Hc = self.horizon + 1

        class Carry(NamedTuple):
            tree: CTree
            node: jnp.ndarray
            P: jnp.ndarray
            pos: jnp.ndarray
            budget: jnp.ndarray
            depth: jnp.ndarray
            done: jnp.ndarray
            rollout_node: jnp.ndarray  # node needing rollout (-1 none)
            path_nodes: jnp.ndarray
            path_rewards: jnp.ndarray
            path_len: jnp.ndarray
            key: jax.Array

        carry = Carry(
            tree=tree,
            node=jnp.int32(0),
            P=P_root,
            pos=root_pos,
            budget=tree.budget[0],
            depth=jnp.int32(0),
            done=jnp.bool_(False),
            rollout_node=NO_NODE,
            path_nodes=jnp.full((Hc,), NO_NODE),
            path_rewards=jnp.zeros((Hc,), dt),
            path_len=jnp.int32(0),
            key=key,
        )

        def step(i, c: Carry) -> Carry:
            tree = c.tree
            terminal = (c.depth >= self.horizon) | (c.budget < res)
            fresh = (tree.visits[c.node] == 0) & (c.node != 0)
            newly_done = ~c.done & (terminal | fresh)
            rollout_node = jnp.where(newly_done & fresh & ~terminal, c.node, c.rollout_node)
            done = c.done | terminal | fresh

            k_pw, k_exp, k_sel, k_next = jax.random.split(c.key, 4)

            # progressive widening (reference :263-272)
            avail = self._available(c.pos, c.budget)
            n_child = tree.num_children[c.node]
            widen = (n_child == 0) | (
                (n_child.astype(dt) <= self.k * tree.visits[c.node] ** self.alpha)
                & (n_child < jnp.sum(avail))
                & (n_child < self.max_children)
            )

            a_expand = self._policy_action(
                c.P, c.pos, c.budget, mean, self.eps_expand, k_exp, gcb=False
            )
            slot_sel = self._uct_select(tree, c.node, c.pos, c.budget, k_sel)
            child_sel = tree.children[c.node, slot_sel]

            new_idx = tree.next_free
            a = jnp.where(widen, a_expand, jnp.maximum(tree.action_in[jnp.maximum(child_sel, 0)], 0))
            Wc, gain = self._edge(c.P, a, mean)
            cost = travel_costs(
                self.world.actions_xyz[a], c.pos, self.cfg.uav.max_v, self.cfg.uav.max_a
            ).astype(dt)
            reward = gain / (cost + 1.0)

            def alloc(tr: CTree) -> CTree:
                return tr._replace(
                    parent=tr.parent.at[new_idx].set(c.node),
                    action_in=tr.action_in.at[new_idx].set(a),
                    wc_in=tr.wc_in.at[new_idx].set(Wc),
                    budget=tr.budget.at[new_idx].set(c.budget - cost),
                    children=tr.children.at[c.node, n_child].set(new_idx),
                    num_children=tr.num_children.at[c.node].add(1),
                    next_free=tr.next_free + 1,
                )

            do_widen = widen & ~done
            tree = jax.lax.cond(do_widen, alloc, lambda tr: tr, tree)
            child = jnp.where(do_widen, new_idx, child_sel)

            move = ~done
            w_in = tree.wc_in[child]  # (M, N)
            P_next = jnp.where(move, c.P - jnp.einsum("mn,mc->nc", w_in, w_in), c.P)
            return Carry(
                tree=tree,
                node=jnp.where(move, child, c.node),
                P=P_next,
                pos=jnp.where(move, self.world.actions_xyz[a], c.pos),
                budget=jnp.where(move, c.budget - cost, c.budget),
                depth=jnp.where(move, c.depth + 1, c.depth),
                done=done,
                rollout_node=rollout_node,
                path_nodes=c.path_nodes.at[i].set(jnp.where(move, child, NO_NODE)),
                path_rewards=c.path_rewards.at[i].set(jnp.where(move, reward, 0.0)),
                path_len=jnp.where(move, c.path_len + 1, c.path_len),
                key=k_next,
            )

        carry = jax.lax.fori_loop(0, Hc, step, carry)
        tree = carry.tree

        # rollout from the fresh node (reference :278-285)
        k_roll, _ = jax.random.split(carry.key)
        rollout_value = jnp.where(
            carry.rollout_node >= 0,
            self._rollout(carry.P, carry.pos, carry.budget, mean, k_roll),
            0.0,
        )

        # Backup (reference :278-304).  For the path root=n0 →r1→ n1 → … →
        # nk (fresh leaf or terminal), the reference's recursion yields:
        #   * fresh leaf: value_sum += rollout, visits += 1 (:283-284)
        #   * each edge j (1..k): the parent n_{j-1} gets value_sum +=
        #     Σ_{i≥j} r_i + rollout and visits += 1; the child n_j gets an
        #     extra visits += 1 (:300-302) — interior nodes are therefore
        #     double-counted per traversal, a quirk kept for parity.
        Hc_ = carry.path_nodes.shape[0]
        leaf_ok = carry.rollout_node >= 0
        leaf = jnp.maximum(carry.rollout_node, 0)

        def leaf_upd(tr: CTree) -> CTree:
            return tr._replace(
                value_sum=tr.value_sum.at[leaf].add(rollout_value),
                visits=tr.visits.at[leaf].add(1.0),
            )

        tree = jax.lax.cond(leaf_ok, leaf_upd, lambda tr: tr, tree)

        def back(i, state):
            tree, G = state
            kk = Hc_ - 1 - i
            on_path = kk < carry.path_len
            parent_node = jnp.where(
                kk == 0, jnp.int32(0), jnp.maximum(carry.path_nodes[kk - 1], 0)
            )
            child_node = jnp.maximum(carry.path_nodes[kk], 0)
            G_new = carry.path_rewards[kk] + G

            def upd(tr: CTree) -> CTree:
                return tr._replace(
                    value_sum=tr.value_sum.at[parent_node].add(G_new),
                    visits=tr.visits.at[parent_node]
                    .add(1.0)
                    .at[child_node]
                    .add(1.0),
                )

            tree = jax.lax.cond(on_path, upd, lambda tr: tr, tree)
            return tree, jnp.where(on_path, G_new, G)

        tree, _ = jax.lax.fori_loop(0, Hc_, back, (tree, rollout_value))
        return tree

    # -------------------------------------------------------------- plan

    def plan(self, state: BeliefState, key: jax.Array, step: jnp.ndarray) -> jnp.ndarray:
        B = state.batch_size
        dt = state.cov.dtype
        n = self.cfg.environment.num_cells
        m = self.world.H.shape[1]
        C = self.num_simulations + 2

        A = self.world.num_actions

        def worker(P, pos, budget, mean, kw):
            """One root-parallel worker: an independent tree whose root
            stats are returned as per-action (visit, value-sum) arrays
            ready for the summed merge (reference merge_roots,
            mcts_mission.py:320-338)."""
            tree = CTree(
                parent=jnp.full((C,), NO_NODE),
                action_in=jnp.full((C,), NO_NODE),
                wc_in=jnp.zeros((C, m, n), dt),
                budget=jnp.zeros((C,), dt).at[0].set(budget),
                visits=jnp.zeros((C,), dt),
                value_sum=jnp.zeros((C,), dt),
                num_children=jnp.zeros((C,), jnp.int32),
                children=jnp.full((C, self.max_children), NO_NODE),
                next_free=jnp.int32(1),
            )

            def sim(tree, kk):
                return self._simulate_one(tree, P, pos, mean, kk), None

            keys = jax.random.split(kw, self.num_simulations)
            tree, _ = jax.lax.scan(sim, tree, keys)

            slots = jnp.arange(self.max_children)
            cids = tree.children[0]
            exists = slots < tree.num_children[0]
            acts = jnp.maximum(tree.action_in[jnp.maximum(cids, 0)], 0)
            vis = jnp.where(exists, tree.visits[jnp.maximum(cids, 0)], 0.0)
            val = jnp.where(exists, tree.value_sum[jnp.maximum(cids, 0)], 0.0)
            vis_a = jnp.zeros((A,), dt).at[acts].add(vis)
            val_a = jnp.zeros((A,), dt).at[acts].add(val)
            # per-CHILD mean values for the single-root best-child rule:
            # duplicate children of the same action stay separate, so the
            # max-over-duplicates order statistic is preserved
            child_val = jnp.where(
                exists, val / jnp.maximum(vis, 1e-30), -jnp.inf
            )
            best_child_action = acts[jnp.argmax(child_val)]
            return vis_a, val_a, best_child_action

        def one(P, pos, budget, mean, k):
            # W vmapped trees replace the reference's process pool
            vis_a, val_a, best_single = jax.vmap(
                lambda kw: worker(P, pos, budget, mean, kw)
            )(jax.random.split(k, self.num_workers))
            if self.num_workers == 1:
                # reference select_best_child (mcts_mission.py:340-350):
                # argmax of PER-CHILD mean value, duplicates unmerged.
                # The root expands the greedy action ~(1−ε) of the time,
                # so its value estimate is a max over many samples —
                # merging duplicates to a per-action mean (below) loses
                # that and measurably degrades solution quality.
                return best_single[0]
            # W > 1: reference merge_roots sums visit/value stats by
            # action across roots, then best child = max merged mean
            # value (:320-350)
            vis = jnp.sum(vis_a, axis=0)
            val = jnp.sum(val_a, axis=0)
            mean_val = val / jnp.maximum(vis, 1e-30)
            return jnp.argmax(jnp.where(vis > 0, mean_val, -jnp.inf))

        keys = jax.random.split(key, B)
        return jax.vmap(one)(state.cov, state.pos, state.budget, state.mean, keys).astype(
            jnp.int32
        )

"""Batched neural PUCT search — the flagship planner's engine.

The reference implements AlphaZero-style MCTS with Python dict
transposition tables keyed by ``hash(str(cov_matrix))`` and a separate
GPU inference-server process fed over multiprocessing queues (reference
planning/mcts_zero/mcts.py:16-296, inference_workers.py:38-127).  Here
the whole search is ONE jitted program over a mission batch:

  * array tree (mctx-style): preallocated per-mission node arrays — no
    dicts, no hashing.  The reference's transposition merging is
    path-keyed here; since the hash key ignores position/budget anyway,
    path-keying is the more correct variant (documented deviation).
  * covariance states are never stored per node.  Each tree edge stores
    its rank-M whitened gain factor Wcᵀ (P_child = P_parent − Wc·Wcᵀ),
    and the running covariance is reconstructed incrementally during
    descent — 4 MB/mission/tree collapses to ~360 KB (SURVEY.md §7.5).
  * network inference is inlined: all missions' leaf evaluations fuse
    into one batched forward per simulation — the queue/batching server
    disappears.
  * KataGo ingredients preserved exactly: min-max-normalized Q in PUCT
    (reference mcts.py:267-284), forced playouts √(k·P·N) at the root
    (:286-293), Dirichlet root noise on first expansion (:160-164),
    and policy-target pruning of forced playouts in closed form
    (:99-128 — the reference's per-action decrement loop solves to a
    threshold v* = ⌊K/(max_puct − q)⌋ + 1, see ``prune_forced_visits``).

Per-sim history semantics: each simulation's leaf features use the
episode history extended by the states along the current search path.
(The reference mutates one shared history object across simulations,
reference mcts.py:178 — we reset to the episode history each sim, the
clean variant of the same intent.)
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from ipp_rl_tpu.config.schema import Config, MCTSZeroHyperParams
from ipp_rl_tpu.env.world import IPPWorld
from ipp_rl_tpu.ops.rewards import adaptive_mask
from ipp_rl_tpu.planners.zero.features import EpisodeHistory, feature_planes, push_history

NO_CHILD = jnp.int32(-1)
ROOT_ACTION = jnp.int32(-1)


class Tree(NamedTuple):
    """Per-mission search tree; all arrays have leading node capacity C.

    vmapped over the mission batch — a (B,)-batched Tree is "the forest".
    """

    parent: jnp.ndarray  # (C,) int32
    action_in: jnp.ndarray  # (C,) int32 — lattice action taken from parent
    reward_in: jnp.ndarray  # (C,) — edge reward (info gain / cost+1)
    wc_in: jnp.ndarray  # (C, M, N) — edge whitened gain factor, transposed
    # layout: the M=9 axis in the sublane position (ops/kalman cost model)
    budget: jnp.ndarray  # (C,) — remaining budget at node
    depth: jnp.ndarray  # (C,) int32
    expanded: jnp.ndarray  # (C,) bool — network-evaluated
    children: jnp.ndarray  # (C, A) int32
    Nsa: jnp.ndarray  # (C, A)
    Qsa: jnp.ndarray  # (C, A)
    prior: jnp.ndarray  # (C, A)
    valid: jnp.ndarray  # (C, A) bool
    Ns: jnp.ndarray  # (C,)
    next_free: jnp.ndarray  # () int32


def init_tree(
    num_sims: int, num_actions: int, n: int, m: int, dtype, edge_dtype=None
) -> Tree:
    # capacity: root + ≤1 allocation per simulation + one DUMP slot
    # (index c−1) that masked no-op scatters write to in _descend_step —
    # never allocated, never read
    c = num_sims + 2
    return Tree(
        parent=jnp.full((c,), NO_CHILD),
        action_in=jnp.full((c,), ROOT_ACTION),
        reward_in=jnp.zeros((c,), dtype),
        wc_in=jnp.zeros((c, m, n), edge_dtype or dtype),
        budget=jnp.zeros((c,), dtype),
        depth=jnp.zeros((c,), jnp.int32),
        expanded=jnp.zeros((c,), bool),
        children=jnp.full((c, num_actions), NO_CHILD),
        Nsa=jnp.zeros((c, num_actions), dtype),
        Qsa=jnp.zeros((c, num_actions), dtype),
        prior=jnp.zeros((c, num_actions), dtype),
        valid=jnp.zeros((c, num_actions), bool),
        Ns=jnp.zeros((c,), dtype),
        next_free=jnp.int32(1),
    )


class DescentCarry(NamedTuple):
    """Per-mission descent state (see ZeroMCTS._descend_step)."""

    tree: Tree
    node: jnp.ndarray
    P: jnp.ndarray
    budget: jnp.ndarray
    prev_pos: jnp.ndarray  # (3,)
    depth: jnp.ndarray
    done: jnp.ndarray  # stop descending
    leaf: jnp.ndarray  # node to NN-evaluate (-1 = terminal)
    path_nodes: jnp.ndarray  # (Hc,)
    path_actions: jnp.ndarray  # (Hc,)
    path_rewards: jnp.ndarray  # (Hc,)
    path_covs: jnp.ndarray  # (Hc, N, N) — P after each move
    path_bfr: jnp.ndarray  # (Hc,) — budget fraction after each move
    path_len: jnp.ndarray
    key: jax.Array


def normalize_q(values: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalization with the reference's degenerate-case rules
    (reference mcts.py:267-278): all-zero → zeros; min==max → v/max."""
    lo, hi = jnp.min(values), jnp.max(values)
    all_zero = jnp.all(values == 0)
    same = lo == hi
    safe_hi = jnp.where(hi == 0, 1.0, hi)
    out = jnp.where(same, values / safe_hi, (values - lo) / (hi - lo))
    return jnp.where(all_zero, values, out)


def _rand_argmax(key: jax.Array, scores: jnp.ndarray) -> jnp.ndarray:
    """Uniform choice among maxima (reference mcts.py:236 np.random.choice)."""
    is_max = scores == jnp.max(scores)
    logits = jnp.where(is_max, 0.0, -jnp.inf)
    return jax.random.categorical(key, logits).astype(jnp.int32)


class ZeroMCTS:
    """Batched PUCT search bound to a world + network.

    ``search`` runs ``num_simulations`` lockstep simulations for B
    missions and returns the visit-count policy (reference
    mcts.py:83-143 get_policy).
    """

    def __init__(
        self,
        world: IPPWorld,
        hp: MCTSZeroHyperParams,
        episode_horizon: int,
        predict_fn,  # (variables, planes (B,S,S,C), masks (B,A)) -> (policy, value)
        edge_dtype=None,
        eval_chunk: int = 0,
    ):
        """``edge_dtype`` (e.g. jnp.bfloat16) stores the per-edge whitened
        gain factors Wcᵀ at half width — the dominant tree array (C, M, N);
        descent casts back to the tree dtype, and the edge reward is
        computed from the *rounded* factor so the backed-up gains stay
        consistent with the reconstructed covariances.

        ``eval_chunk`` > 0 evaluates leaf planes + network in fixed-size
        mission chunks (lax.map) instead of one full-batch forward.  The
        CNN activations at (B, N, N, num_channels) are what cap the
        mission batch in HBM — chunking bounds activation peak by the
        chunk size so B scales until the *tree* arrays fill HBM
        (thousands of missions instead of 256 on 16 GiB)."""
        self.world = world
        self.hp = hp
        self.horizon = episode_horizon
        self.predict = predict_fn
        self.edge_dtype = edge_dtype
        self.eval_chunk = eval_chunk
        cfg = world.cfg
        self.A = world.num_actions
        self.N = cfg.environment.num_cells
        self.M = world.H.shape[1]
        self.L = hp.input_history_length

    # ----------------------------------------------------------- primitives

    def valid_actions(self, pos: jnp.ndarray, budget: jnp.ndarray) -> jnp.ndarray:
        """Distance-gated feasibility (reference mcts.py:148-153: Euclidean
        distances vs budget and max_valid_action_distance)."""
        d = jnp.sqrt(
            jnp.sum(jnp.square(self.world.actions_xyz - pos[None, :]), axis=-1)
        )
        return (d > 0) & (d <= budget) & (d < self.hp.max_valid_action_distance)

    def edge_update(
        self, P: jnp.ndarray, a: jnp.ndarray, diag_mask: Optional[jnp.ndarray]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """KF covariance-only update for action ``a`` against running
        covariance P: returns (Wcᵀ (M, N), gain) — one simulate_prediction_step
        (reference planning/common/optimization.py:14-30).  Uses the
        unrolled small-SPD path (no sequential solves in the sim loop);
        transposed factor layout per the ops/kalman TPU cost model."""
        from ipp_rl_tpu.ops.kalman import kf_gain_factor_t

        H = self.world.H[a]  # (M, N)
        R = self.world.R_diag[a]
        WcT, _ = kf_gain_factor_t(P, H, R)
        if self.edge_dtype is not None and self.edge_dtype != P.dtype:
            # round-trip through the storage dtype so the gain backed up
            # along the path matches the covariance the descent rebuilds
            WcT = WcT.astype(self.edge_dtype).astype(P.dtype)
        sq = jnp.sum(WcT * WcT, axis=-2)  # (N,)
        if diag_mask is not None:
            sq = sq * diag_mask
        return WcT, jnp.sum(sq)

    def puct(
        self,
        tree: Tree,
        node: jnp.ndarray,
        puct_init: jnp.ndarray,
        force: jnp.ndarray,
    ) -> jnp.ndarray:
        """PUCT scores for one node (reference mcts.py:280-296)."""
        hp = self.hp
        q = normalize_q(tree.Qsa[node])
        ns = tree.Ns[node]
        c = puct_init + jnp.log((ns + hp.puct_base + 1.0) / hp.puct_base)
        prior_score = c * tree.prior[node] * (jnp.sqrt(ns + 1.0) / (1.0 + tree.Nsa[node]))
        uct = q + prior_score
        num_forced = jnp.ceil(
            jnp.sqrt(hp.forced_playout_factor * tree.prior[node] * ns)
        )
        num_forced = jnp.where(tree.Nsa[node] == 0, 0.0, num_forced)
        forced = force & (tree.Nsa[node] < num_forced)
        uct = jnp.where(forced, jnp.inf, uct)
        return jnp.where(tree.valid[node], uct, -jnp.inf)

    # ------------------------------------------------------------ simulation
    #
    # The descent is structured as init / step / leaf-output pieces so the
    # batched search can run the step under ONE while_loop placed OUTSIDE
    # the vmap: the loop exits as soon as every mission's path hit a leaf
    # (typical depth 1–3 of the Hc bound), and because the step body is
    # already fully masked for done lanes, no automatic while-batching
    # carry-select is introduced.

    def _descend_init(
        self,
        tree: Tree,
        P_root: jnp.ndarray,
        root_pos: jnp.ndarray,
        key: jax.Array,
    ):
        """Per-mission descent state (the root-pushed history ring is
        search-invariant and computed once in ``search``)."""
        dt = tree.Qsa.dtype
        Hc = self.horizon + 1  # max path edges

        init_budget = tree.budget[0]

        # The leaf's history ring is NOT carried through the descent loop
        # (rewriting the (L, N, N) ring + its select every iteration was
        # ~60% of the whole search's HBM traffic); instead each move
        # writes one P snapshot into path_covs and the ring is assembled
        # from (path, hist_root) after the loop.
        carry = DescentCarry(
            tree=tree,
            node=jnp.int32(0),
            P=P_root,
            budget=init_budget,
            prev_pos=root_pos,
            depth=jnp.int32(0),
            done=jnp.bool_(False),
            leaf=jnp.int32(-1),
            path_nodes=jnp.full((Hc,), NO_CHILD),
            path_actions=jnp.full((Hc,), ROOT_ACTION),
            path_rewards=jnp.zeros((Hc,), dt),
            path_covs=jnp.zeros((Hc, P_root.shape[0], P_root.shape[0]), dt),
            path_bfr=jnp.zeros((Hc,), dt),
            path_len=jnp.int32(0),
            key=key,
        )
        return carry

    def _descend_step(self, i, c, diag_mask, puct_init, forced_playouts=True):
        """One per-mission descent iteration (fully masked when done)."""
        cfg = self.world.cfg
        dt = c.tree.Qsa.dtype
        tree = c.tree
        # terminal: past horizon or out of budget
        terminal = (c.depth > self.horizon) | (c.budget <= 0)
        # unexpanded node → this is the NN leaf
        is_leaf = ~tree.expanded[c.node] & ~terminal
        newly_done = ~c.done & (terminal | is_leaf)
        leaf = jnp.where(newly_done & is_leaf, c.node, c.leaf)
        done = c.done | terminal | is_leaf

        k_sel, k_next = jax.random.split(c.key)
        uct = self.puct(
            tree, c.node, puct_init, force=(c.depth == 0) & forced_playouts
        )
        a = _rand_argmax(k_sel, uct)

        # edge dynamics (discarded when done — masked below)
        WcT, gain = self.edge_update(c.P, a, diag_mask)
        cost = _flight_cost(self.world, c.prev_pos, a).astype(dt)
        reward = gain / (cost + 1.0)

        existing = tree.children[c.node, a]
        need_new = (existing == NO_CHILD) & ~done
        new_idx = tree.next_free
        child = jnp.where(need_new, new_idx, existing)

        # Allocate child node with UNCONDITIONAL masked scatters
        # instead of lax.cond: under vmap, cond lowers to select over
        # BOTH branch results — a full copy of every tree array per
        # descent step per mission.  Masked one-row scatters (dump
        # slot C−1 when not allocating; init_tree reserves it) keep
        # the tree buffers threaded in-place through the fori_loop.
        dump = jnp.int32(tree.parent.shape[0] - 1)
        w_idx = jnp.where(need_new, new_idx, dump)
        child_entry = jnp.where(need_new, new_idx, existing)
        tree = tree._replace(
            parent=tree.parent.at[w_idx].set(c.node),
            action_in=tree.action_in.at[w_idx].set(a),
            reward_in=tree.reward_in.at[w_idx].set(reward),
            wc_in=tree.wc_in.at[w_idx].set(WcT.astype(tree.wc_in.dtype)),
            budget=tree.budget.at[w_idx].set(c.budget - cost),
            depth=tree.depth.at[w_idx].set(c.depth + 1),
            children=tree.children.at[c.node, a].set(child_entry),
            next_free=tree.next_free + need_new.astype(jnp.int32),
        )

        # move into child, subtract the edge factor from running P
        move = ~done
        w = tree.wc_in[child].astype(c.P.dtype)  # (M, N)
        P_next = jnp.where(move, c.P - jnp.einsum("mn,mc->nc", w, w), c.P)
        budget_next = jnp.where(move, tree.budget[child], c.budget)

        return DescentCarry(
            tree=tree,
            node=jnp.where(move, child, c.node),
            P=P_next,
            budget=budget_next,
            prev_pos=jnp.where(move, self.world.actions_xyz[a], c.prev_pos),
            depth=jnp.where(move, c.depth + 1, c.depth),
            done=done,
            leaf=leaf,
            path_nodes=c.path_nodes.at[i].set(jnp.where(move, c.node, NO_CHILD)),
            path_actions=c.path_actions.at[i].set(jnp.where(move, a, ROOT_ACTION)),
            path_rewards=c.path_rewards.at[i].set(
                jnp.where(move, tree.reward_in[child], 0.0)
            ),
            # P_next already equals c.P when not moving; slots ≥
            # path_len are never read by the ring assembly below
            path_covs=c.path_covs.at[i].set(P_next),
            path_bfr=c.path_bfr.at[i].set(
                budget_next / jnp.asarray(cfg.constraints.budget, dt)
            ),
            path_len=jnp.where(move, c.path_len + 1, c.path_len),
            key=k_next,
        )

    def _leaf_outputs(self, carry, hist_root, root_pos):
        """Assemble the leaf's history ring from the path snapshots + the
        root-pushed episode history: ring[j] = j-th most recent snapshot
        = path entry (plen−1−j), falling back to hist_root[j − plen]."""
        L = self.L
        plen = carry.path_len
        js = jnp.arange(L)
        kk = plen - 1 - js  # (L,)
        on_path = kk >= 0
        p_sel = jnp.maximum(kk, 0)
        h_sel = jnp.clip(js - plen, 0, L - 1)
        path_pos = self.world.actions_xyz[
            jnp.maximum(carry.path_actions[p_sel], 0)
        ]
        hist_leaf = EpisodeHistory(
            covs=jnp.where(
                on_path[:, None, None],
                carry.path_covs[p_sel],
                hist_root.covs[h_sel],
            ),
            positions=jnp.where(
                on_path[:, None], path_pos, hist_root.positions[h_sel]
            ),
            budgets=jnp.where(on_path, carry.path_bfr[p_sel], hist_root.budgets[h_sel]),
            length=jnp.minimum(hist_root.length + plen, L),
        )
        # leaf planes are inference-only: materialize the ring at the
        # inference dtype (e.g. bf16) so the (B, L, N, N) buffer and the
        # plane build are half-width end to end
        infer_dt = getattr(self.predict, "infer_dtype", None)
        if infer_dt is not None:
            hist_leaf = EpisodeHistory(
                covs=hist_leaf.covs.astype(infer_dt),
                positions=hist_leaf.positions.astype(infer_dt),
                budgets=hist_leaf.budgets.astype(infer_dt),
                length=hist_leaf.length,
            )

        # leaf evaluation inputs: the history ring is returned instead of
        # materialized planes — the (B, N, N, C) plane build + CNN forward
        # happen in mission chunks in ``search`` so activation memory does
        # not scale with B
        leaf_pos = jnp.where(
            carry.path_len > 0,
            self.world.actions_xyz[
                jnp.maximum(carry.path_actions[jnp.maximum(carry.path_len - 1, 0)], 0)
            ],
            root_pos,
        )
        leaf_mask = self.valid_actions(leaf_pos, carry.budget)
        return hist_leaf, leaf_mask, leaf_pos

    def _integrate_eval(
        self,
        tree: Tree,
        leaf: jnp.ndarray,
        policy: jnp.ndarray,
        value: jnp.ndarray,
        leaf_mask: jnp.ndarray,
        is_root_first: jnp.ndarray,
        noise: jnp.ndarray,
    ) -> Tuple[Tree, jnp.ndarray]:
        """Store the network prior/valid mask at the leaf (reference
        mcts.py:185-233), adding precomputed Dirichlet noise at the
        root's first evaluation (:160-164, 221-222).

        ``noise`` is drawn ONCE per search in ``search`` (from the
        sim-0 keys, so the applied values are unchanged): root noise is
        only ever used at the first root evaluation, and drawing B×A
        gamma rejections per simulation inside the loop was measurable
        per-sim cost."""
        hp = self.hp
        dt = tree.prior.dtype
        leaf_ok = leaf >= 0
        idx = jnp.maximum(leaf, 0)

        p = policy.astype(dt) * leaf_mask.astype(dt)
        p_noised = (1.0 - hp.dirichlet_eps) * p + hp.dirichlet_eps * noise.astype(dt)
        p = jnp.where(is_root_first & leaf_ok, p_noised * leaf_mask.astype(dt), p)
        s = jnp.sum(p)
        # degenerate-policy repair (reference mcts.py:224-229)
        p = jnp.where(s > 0, p / jnp.maximum(s, 1e-30), leaf_mask.astype(dt))
        s2 = jnp.sum(p)
        p = p / jnp.maximum(s2, 1e-30)

        no_valid = jnp.sum(leaf_mask) == 0
        value_out = jnp.where(leaf_ok & ~no_valid, value, 0.0)

        # masked one-row scatters instead of cond (see _descend_step)
        ok = leaf_ok & ~no_valid
        tree = tree._replace(
            prior=tree.prior.at[idx].set(jnp.where(ok, p, tree.prior[idx])),
            valid=tree.valid.at[idx].set(
                jnp.where(ok, leaf_mask, tree.valid[idx])
            ),
            expanded=tree.expanded.at[idx].set(ok | tree.expanded[idx]),
            Ns=tree.Ns.at[idx].set(jnp.where(ok, 0.0, tree.Ns[idx])),
        )
        return tree, value_out

    def _backup(
        self,
        tree: Tree,
        path_nodes: jnp.ndarray,
        path_actions: jnp.ndarray,
        path_rewards: jnp.ndarray,
        path_len: jnp.ndarray,
        leaf_value: jnp.ndarray,
    ) -> Tree:
        """Backward accumulation G_k = r_k + γ·G_{k+1}; Q ← (N·Q + G)/(N+1)
        (reference mcts.py:250-265)."""
        hp = self.hp
        Hc = path_nodes.shape[0]

        def body(i, carry):
            tree, G = carry
            k = Hc - 1 - i
            on_path = k < path_len
            node = jnp.maximum(path_nodes[k], 0)
            a = jnp.maximum(path_actions[k], 0)
            G_new = path_rewards[k] + hp.gamma * G

            nsa = tree.Nsa[node, a]
            q_new = jnp.where(
                nsa > 0, (nsa * tree.Qsa[node, a] + G_new) / (nsa + 1.0), G_new
            )

            # masked scatters instead of cond (see _descend_step): a
            # zero .add and a rewrite-same-value .set are exact no-ops
            on = on_path.astype(tree.Nsa.dtype)
            tree = tree._replace(
                Qsa=tree.Qsa.at[node, a].set(
                    jnp.where(on_path, q_new, tree.Qsa[node, a])
                ),
                Nsa=tree.Nsa.at[node, a].add(on),
                Ns=tree.Ns.at[node].add(on),
            )
            return tree, jnp.where(on_path, G_new, G)

        tree, _ = jax.lax.fori_loop(0, Hc, body, (tree, leaf_value))
        return tree

    # --------------------------------------------------------------- search

    def search(
        self,
        cov: jnp.ndarray,  # (B, N, N) root covariances
        mean: jnp.ndarray,  # (B, N) root means
        pos: jnp.ndarray,  # (B, 3) current positions
        budget: jnp.ndarray,  # (B,)
        history: EpisodeHistory,  # (B,)-batched episode history
        key: jax.Array,
        net_variables=None,
        puct_init: Optional[float] = None,
        dirichlet_alpha: Optional[float] = None,
        num_simulations: Optional[int] = None,
        forced_playouts: bool = True,
        root_noise: bool = True,
    ) -> Tuple[Tree, jnp.ndarray]:
        """Run the full search; returns the (B,)-batched trees and the
        root valid-action masks.  ``net_variables`` are threaded to the
        predict function so jitted callers can swap weights without
        retracing.

        ``forced_playouts`` / ``root_noise`` (static) switch off the
        KataGo root forced playouts and the Dirichlet root noise.  The
        reference keeps BOTH on even at deploy time (reference
        mcts.py:221-222 noise at num_sim==0, :236 force at depth==0
        unconditionally); they are self-play exploration mechanisms, so
        deployment may disable them (ZeroPlanner deploy_mode="clean") —
        documented deviation, reference behavior is the default."""
        hp = self.hp
        B = cov.shape[0]
        dt = cov.dtype
        sims = num_simulations or hp.num_mcts_simulations
        p_init = jnp.asarray(
            hp.puct_init if puct_init is None else puct_init, dt
        )
        d_alpha = jnp.asarray(
            hp.dirichlet_alpha if dirichlet_alpha is None else dirichlet_alpha, dt
        )

        one_tree = init_tree(sims, self.A, self.N, self.M, dt, self.edge_dtype)
        tree = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), one_tree
        )
        tree = tree._replace(budget=tree.budget.at[:, 0].set(budget))

        root_mask = jax.vmap(self.valid_actions)(pos, budget)

        # hoist the inference-dtype weight cast out of the simulation loop
        # (predict's internal cast is then an identity) — see predict_fn
        infer_dt = getattr(self.predict, "infer_dtype", None)
        if infer_dt is not None:
            net_variables = jax.tree_util.tree_map(
                lambda x: x.astype(infer_dt)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                net_variables,
            )

        def eval_leaves(hist_leaf, leaf_mask):
            """Plane build + batched CNN forward, in mission chunks.

            The chunk loop is a fori_loop with a DYNAMIC trip count (like
            the simulation loop) — a static-trip scan with the CNN in its
            body trips this environment's remote-compiler loop-unrolling
            hang (see CLAUDE.md)."""

            def fwd(h, lm, mn):
                if infer_dt is not None:
                    # keep every plane-build operand at the inference
                    # dtype so no op silently promotes back to f32
                    mn = mn.astype(infer_dt)
                planes = jax.vmap(
                    lambda hh, m: feature_planes(self.world, self.hp, hh, mean=m)
                )(h, mn)
                return self.predict(net_variables, planes, lm.astype(dt))

            G = self.eval_chunk
            if not (G and B > G):
                return fwd(hist_leaf, leaf_mask, mean)

            # pad to a whole number of chunks (duplicate leading rows —
            # pad < G < B so the source rows exist) so a B % G != 0
            # batch stays chunked instead of silently falling back to
            # one full-batch forward and its O(B) activation peak
            pad = (-B) % G
            mean_p = mean
            if pad:
                cat = lambda x: jnp.concatenate([x, x[:pad]], axis=0)
                hist_leaf = jax.tree_util.tree_map(cat, hist_leaf)
                leaf_mask = cat(leaf_mask)
                mean_p = cat(mean)
            Bp = B + pad

            def chunk_body(c, out):
                pol_all, val_all = out
                start = c * G
                h = jax.tree_util.tree_map(
                    lambda x: jax.lax.dynamic_slice_in_dim(x, start, G, axis=0),
                    hist_leaf,
                )
                lm = jax.lax.dynamic_slice_in_dim(leaf_mask, start, G, axis=0)
                mn = jax.lax.dynamic_slice_in_dim(mean_p, start, G, axis=0)
                pol, val = fwd(h, lm, mn)
                return (
                    jax.lax.dynamic_update_slice_in_dim(pol_all, pol, start, axis=0),
                    jax.lax.dynamic_update_slice_in_dim(val_all, val, start, axis=0),
                )

            out0 = (
                jnp.zeros((Bp, self.A), jnp.float32),
                jnp.zeros((Bp,), jnp.float32),
            )
            pol_all, val_all = jax.lax.fori_loop(
                0, jnp.asarray(Bp // G, jnp.int32), chunk_body, out0
            )
            return pol_all[:B], val_all[:B]

        # Dirichlet root noise: only the FIRST root evaluation (sim 0)
        # ever applies it, so draw it once here with sim-0's noise keys
        # — the applied values are identical to the former in-loop draw
        if root_noise:
            k0_sel, k0_noise = jax.random.split(jax.random.fold_in(key, 0))
            noise_keys0 = jax.random.split(k0_noise, B)
            noise_arr = jax.vmap(
                lambda kk: jax.random.dirichlet(
                    kk, jnp.full((self.A,), d_alpha, dt), dtype=dt
                )
            )(noise_keys0)
        else:
            noise_arr = jnp.zeros((B, self.A), dt)

        # the root-pushed history ring is the same for every simulation:
        # push it once (the former per-sim push was (L, N, N) of traffic
        # per mission per simulation)
        hist_root = jax.vmap(
            lambda h, P, ps, bg: push_history(
                h, P, ps, bg / jnp.asarray(self.world.cfg.constraints.budget, dt)
            )
        )(history, cov, pos, budget)

        # adaptive mask vs ROOT mean/state: constant across the whole
        # search (reference mcts.py:73-81 get_adaptive_info)
        if self.world.cfg.scenario.adaptive:
            scen = self.world.cfg.scenario
            dmask = jax.vmap(
                lambda mn, P: adaptive_mask(
                    mn, jnp.diag(P), scen.value_threshold, scen.interval_factor
                )
            )(mean, cov)
        else:
            dmask = None

        Hc = self.horizon + 1

        def sim_step(i, carry):
            tree, first = carry
            k = jax.random.fold_in(key, i)
            k_sel, _ = jax.random.split(k)
            sel_keys = jax.random.split(k_sel, B)

            dc = jax.vmap(
                lambda tr, P, ps, kk: self._descend_init(tr, P, ps, kk)
            )(tree, cov, pos, sel_keys)

            # early-exit descent: the while_loop sits OUTSIDE the vmap and
            # stops as soon as EVERY mission hit its leaf (typical path
            # depth 1–3 ≪ Hc); the step body is fully masked for done
            # lanes, so no automatic while-batching carry-select appears
            def cond(st):
                j, c = st
                return (j < Hc) & jnp.any(~c.done)

            def body(st):
                j, c = st
                if dmask is None:
                    c2 = jax.vmap(
                        lambda cc: self._descend_step(
                            j, cc, None, p_init, forced_playouts
                        )
                    )(c)
                else:
                    c2 = jax.vmap(
                        lambda cc, dm: self._descend_step(
                            j, cc, dm, p_init, forced_playouts
                        )
                    )(c, dmask)
                return j + 1, c2

            _, dc = jax.lax.while_loop(cond, body, (jnp.int32(0), dc))
            tree = dc.tree
            p_nodes, p_actions = dc.path_nodes, dc.path_actions
            p_rewards, p_len, leaf = dc.path_rewards, dc.path_len, dc.leaf

            hist_leaf, leaf_mask, _ = jax.vmap(
                lambda cc, hr, rp: self._leaf_outputs(cc, hr, rp)
            )(dc, hist_root, pos)
            policy, value = eval_leaves(hist_leaf, leaf_mask)
            is_root_first = first & (leaf == 0) & root_noise
            tree, leaf_value = jax.vmap(
                lambda tr, lf, po, va, lm, rf, nz: self._integrate_eval(
                    tr, lf, po, va, lm, rf, nz
                )
            )(tree, leaf, policy, value, leaf_mask, is_root_first, noise_arr)
            tree = jax.vmap(self._backup)(
                tree, p_nodes, p_actions, p_rewards, p_len, leaf_value
            )
            return (tree, first & ~(leaf == 0))

        # DYNAMIC trip count: node capacity is static (sims), but the loop
        # bound is a traced scalar — prevents backend loop unrolling, which
        # hangs this environment's remote compiler for >32-iteration
        # network-bearing loops (see CLAUDE.md)
        (tree, _) = jax.lax.fori_loop(
            0,
            jnp.asarray(sims, jnp.int32),
            sim_step,
            (tree, jnp.ones((B,), bool)),
        )
        return tree, root_mask

    # ------------------------------------------------------- policy readout

    def root_policy(
        self,
        tree: Tree,
        key: jax.Array,
        temperature: jnp.ndarray,
        deploy_time: bool = False,
        puct_init: Optional[float] = None,
    ) -> jnp.ndarray:
        """Visit-count policy with forced-playout pruning (training) or raw
        visits (deploy) (reference mcts.py:96-143)."""
        B = tree.Ns.shape[0]
        keys = jax.random.split(key, B)
        p_init = jnp.asarray(
            self.hp.puct_init if puct_init is None else puct_init, tree.Qsa.dtype
        )

        def one(tr: Tree, k: jax.Array):
            visits = tr.Nsa[0]
            if not deploy_time:
                visits = self.prune_forced_visits(tr, visits, k, p_init)
            k1, k2 = jax.random.split(k)
            total = jnp.sum(visits)

            def temp_policy():
                v = jnp.where(
                    temperature == 0.0,
                    jnp.zeros_like(visits).at[_rand_argmax(k2, visits)].set(1.0),
                    visits ** (1.0 / jnp.maximum(temperature, 1e-8)),
                )
                return v / jnp.maximum(jnp.sum(v), 1e-30)

            # degenerate case: no visited root action (reference :130-132)
            fallback = tr.valid[0].astype(visits.dtype)
            fallback = fallback / jnp.maximum(jnp.sum(fallback), 1e-30)
            return jnp.where(total > 0, temp_policy(), fallback)

        return jax.vmap(one)(tree, keys)

    def prune_forced_visits(
        self, tr: Tree, visits: jnp.ndarray, key: jax.Array, puct_init: jnp.ndarray
    ) -> jnp.ndarray:
        """Closed-form policy-target pruning (reference mcts.py:99-128).

        The reference repeatedly decrements an action's visit count while
        the resulting PUCT stays below the chosen action's; the decrement
        from v restores iff q + K/v ≥ max_puct (prior score K/(1+v') with
        v' = v − 1), so descending visit counts stop at the first
        v ≤ K/(max_puct − q): final = clip(⌊K/margin⌋, visits − num_forced,
        visits).  Visits equal to 1 are then zeroed (:128)."""
        hp = self.hp
        argmax_v = _rand_argmax(key, visits)
        q = normalize_q(tr.Qsa[0])
        ns = tr.Ns[0]
        c = puct_init + jnp.log((ns + hp.puct_base + 1.0) / hp.puct_base)
        K = c * tr.prior[0] * jnp.sqrt(ns + 1.0)
        uct_plain = jnp.where(
            tr.valid[0], q + K / (1.0 + tr.Nsa[0]), -jnp.inf
        )
        max_puct = uct_plain[argmax_v]

        num_forced = jnp.ceil(
            jnp.sqrt(hp.forced_playout_factor * tr.prior[0] * ns)
        )
        num_forced = jnp.where(tr.Nsa[0] == 0, 0.0, num_forced)

        margin = max_puct - q
        v_star = jnp.where(
            margin > 0, jnp.floor(K / jnp.maximum(margin, 1e-30)), visits
        )
        pruned = jnp.clip(v_star, visits - num_forced, visits)
        out = jnp.where(
            (jnp.arange(self.A) == argmax_v) | (num_forced <= 0), visits, pruned
        )
        return jnp.where(out == 1.0, 0.0, out)


def _flight_cost(world: IPPWorld, prev_pos: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Trapezoidal flight-time cost from an arbitrary position to action a
    (budget decrement uses flight time, reference mcts.py:249)."""
    from ipp_rl_tpu.ops.geometry import travel_costs

    return travel_costs(
        world.actions_xyz[a], prev_pos, world.cfg.uav.max_v, world.cfg.uav.max_a
    )

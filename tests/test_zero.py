"""MCTS-zero subsystem tests: feature planes, batched PUCT search,
forced-playout pruning oracle, network forward, train step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipp_rl_tpu.config.schema import MCTSZeroHyperParams
from ipp_rl_tpu.env.world import IPPWorld
from ipp_rl_tpu.planners.zero.features import (
    feature_planes,
    init_history,
    push_history,
)
from ipp_rl_tpu.planners.zero.mcts import Tree, ZeroMCTS, init_tree, normalize_q


@pytest.fixture(scope="module")
def world(small_cfg):
    return IPPWorld(small_cfg, dtype=jnp.float64)


@pytest.fixture(scope="module")
def hp():
    return MCTSZeroHyperParams(
        num_mcts_simulations=12,
        num_channels=16,
        num_encoder_res_blocks=2,
        num_global_pooling_channels=4,
        input_history_length=3,
        max_valid_action_distance=11.5,
    )


# ---------------------------------------------------------------- features


def test_history_ring(small_cfg, hp, world):
    h = init_history(small_cfg, hp, jnp.float64)
    n = small_cfg.environment.num_cells
    assert int(h.length) == 0
    cov = jnp.eye(n, dtype=jnp.float64)
    h = push_history(h, cov, jnp.asarray([1.0, 2.0, 8.0]), jnp.asarray(0.9))
    h = push_history(h, 2 * cov, jnp.asarray([3.0, 2.0, 8.0]), jnp.asarray(0.8))
    assert int(h.length) == 2
    np.testing.assert_allclose(np.asarray(h.covs[0]), 2 * np.eye(n))
    np.testing.assert_allclose(np.asarray(h.budgets[:2]), [0.8, 0.9])
    for _ in range(4):
        h = push_history(h, cov, jnp.zeros(3), jnp.asarray(0.1))
    assert int(h.length) == 3  # capped at L


def test_feature_planes_shape_and_padding(small_cfg, hp, world):
    n = small_cfg.environment.num_cells
    h = init_history(small_cfg, hp, jnp.float64)
    state = world.init_state(jax.random.key(0), 1)
    h = push_history(h, state.cov[0], state.pos[0], jnp.asarray(1.0, jnp.float64))
    planes = feature_planes(world, hp, h, mean=state.mean[0])
    assert planes.shape == (n, n, 16)  # 3*5 + costs
    # only the first history slot is populated; slots 2, 3 are zero-padded
    np.testing.assert_allclose(np.asarray(planes[..., 5:15]), 0.0)
    # state plane is min-max normalized
    assert float(planes[..., 0].max()) == 1.0
    assert float(planes[..., 0].min()) == 0.0
    # budget plane is constant 1.0
    np.testing.assert_allclose(np.asarray(planes[..., 4]), 1.0)
    # costs plane rows are constant (row i = cost to cell i)
    costs = np.asarray(planes[..., 15])
    np.testing.assert_allclose(costs, costs[:, :1] * np.ones((1, n)))


def test_feature_planes_vmappable(small_cfg, hp, world):
    state = world.init_state(jax.random.key(1), 3)
    h = jax.vmap(lambda c, p: push_history(
        init_history(small_cfg, hp, jnp.float64), c, p, jnp.asarray(1.0, jnp.float64)
    ))(state.cov, state.pos)
    planes = jax.vmap(lambda hh, m: feature_planes(world, hp, hh, m))(h, state.mean)
    n = small_cfg.environment.num_cells
    assert planes.shape == (3, n, n, 16)


# ------------------------------------------------------------------ search


def uniform_predict(A):
    def predict(variables, planes, masks):
        B = planes.shape[0]
        p = masks / jnp.maximum(jnp.sum(masks, axis=-1, keepdims=True), 1e-30)
        return p, 0.5 * jnp.ones((B,), planes.dtype)

    return predict


def test_search_runs_and_counts(small_cfg, hp, world):
    mcts = ZeroMCTS(world, hp, episode_horizon=3, predict_fn=uniform_predict(world.num_actions))
    B = 2
    state = world.init_state(jax.random.key(0), B)
    hist = jax.vmap(lambda _: init_history(small_cfg, hp, jnp.float64))(jnp.arange(B))
    tree, root_mask = mcts.search(
        state.cov, state.mean, state.pos, state.budget, hist, jax.random.key(1)
    )
    # root expanded, visits accumulated
    assert bool(jnp.all(tree.expanded[:, 0]))
    ns = np.asarray(tree.Ns[:, 0])
    # sims - 1 (first sim evaluates the root itself)
    assert np.all(ns == hp.num_mcts_simulations - 1)
    # visits only on valid actions
    nsa = np.asarray(tree.Nsa[:, 0])
    assert np.all(nsa[~np.asarray(root_mask)] == 0)
    # children exist where visits > 0
    ch = np.asarray(tree.children[:, 0])
    assert np.all((ch >= 0) == (nsa > 0))


def test_search_policy(small_cfg, hp, world):
    mcts = ZeroMCTS(world, hp, episode_horizon=3, predict_fn=uniform_predict(world.num_actions))
    B = 2
    state = world.init_state(jax.random.key(2), B)
    hist = jax.vmap(lambda _: init_history(small_cfg, hp, jnp.float64))(jnp.arange(B))
    tree, root_mask = mcts.search(
        state.cov, state.mean, state.pos, state.budget, hist, jax.random.key(3)
    )
    pol = np.asarray(
        mcts.root_policy(tree, jax.random.key(4), jnp.asarray(1.0), deploy_time=True)
    )
    np.testing.assert_allclose(pol.sum(axis=-1), 1.0, rtol=1e-6)
    assert np.all(pol[~np.asarray(root_mask)] == 0)
    # temperature 0 → one-hot
    pol0 = np.asarray(
        mcts.root_policy(tree, jax.random.key(5), jnp.asarray(0.0), deploy_time=True)
    )
    assert np.all(pol0.max(axis=-1) == 1.0)
    # training policy (with pruning) is a valid distribution too
    polt = np.asarray(mcts.root_policy(tree, jax.random.key(6), jnp.asarray(1.0)))
    np.testing.assert_allclose(polt.sum(axis=-1), 1.0, rtol=1e-6)


def test_edge_factors_consistent(small_cfg, hp, world):
    """Descending an edge must reproduce the full KF covariance update."""
    from ipp_rl_tpu.ops.kalman import kf_update

    mcts = ZeroMCTS(world, hp, episode_horizon=3, predict_fn=uniform_predict(world.num_actions))
    state = world.init_state(jax.random.key(7), 1)
    P = state.cov[0]
    a = jnp.int32(5)
    WcT, gain = mcts.edge_update(P, a, None)  # (M, N) transposed layout
    _, P_ref = kf_update(P, state.mean[0], world.H[a], world.R_diag[a], z=None)
    np.testing.assert_allclose(
        np.asarray(P - WcT.T @ WcT), np.asarray(P_ref), atol=1e-10
    )
    np.testing.assert_allclose(
        float(gain), float(jnp.trace(P) - jnp.trace(P_ref)), rtol=1e-9
    )


def test_normalize_q_reference_semantics():
    np.testing.assert_allclose(np.asarray(normalize_q(jnp.zeros(4))), 0.0)
    v = jnp.asarray([2.0, 2.0, 2.0])
    np.testing.assert_allclose(np.asarray(normalize_q(v)), 1.0)  # v / max
    v = jnp.asarray([1.0, 3.0, 2.0])
    np.testing.assert_allclose(np.asarray(normalize_q(v)), [0.0, 1.0, 0.5])


def prune_oracle(visits, q_norm, prior, ns, valid, puct_init, puct_base, factor, argmax_v):
    """Literal per-action decrement loop from the reference (mcts.py:99-128)."""
    visits = visits.copy().astype(float)
    K = (puct_init + np.log((ns + puct_base + 1) / puct_base)) * prior * np.sqrt(ns + 1)
    uct = np.where(valid, q_norm + K / (1 + visits), -np.inf)
    max_puct = uct[argmax_v]
    num_forced = np.ceil(np.sqrt(factor * prior * ns))
    num_forced[visits == 0] = 0
    for a in range(len(visits)):
        if a == argmax_v or num_forced[a] <= 0:
            continue
        for _ in range(int(num_forced[a])):
            visits[a] -= 1
            pruned = q_norm[a] + K[a] / (1 + visits[a])
            if pruned >= max_puct:
                visits[a] += 1
                break
    visits[visits == 1] = 0
    return visits


def test_prune_closed_form_matches_oracle(small_cfg, hp, world):
    rng = np.random.default_rng(0)
    A = world.num_actions
    mcts = ZeroMCTS(world, hp, 3, uniform_predict(A))
    for trial in range(5):
        visits = rng.integers(0, 12, A).astype(np.float64)
        qsa = rng.uniform(0, 2, A) * (visits > 0)
        prior = rng.dirichlet(np.ones(A))
        valid = rng.uniform(size=A) > 0.3
        visits = visits * valid
        qsa = qsa * valid
        ns = float(visits.sum())
        if ns == 0:
            continue
        tree1 = init_tree(hp.num_mcts_simulations, A, 4, 4, jnp.float64)
        tree1 = tree1._replace(
            Nsa=tree1.Nsa.at[0].set(visits),
            Qsa=tree1.Qsa.at[0].set(qsa),
            prior=tree1.prior.at[0].set(prior),
            valid=tree1.valid.at[0].set(valid),
            Ns=tree1.Ns.at[0].set(ns),
        )
        key = jax.random.key(trial)
        got = np.asarray(
            mcts.prune_forced_visits(
                tree1, jnp.asarray(visits), key, jnp.asarray(hp.puct_init)
            )
        )
        # reproduce the tie-break the jax code made
        from ipp_rl_tpu.planners.zero.mcts import _rand_argmax

        argmax_v = int(_rand_argmax(key, jnp.asarray(visits)))
        q_norm = np.asarray(normalize_q(jnp.asarray(qsa)))
        want = prune_oracle(
            visits, q_norm, prior, ns, valid,
            hp.puct_init, hp.puct_base, hp.forced_playout_factor, argmax_v,
        )
        np.testing.assert_allclose(got, want, atol=1e-9, err_msg=f"trial {trial}")


# ---------------------------------------------------------- network + train


def test_network_forward_and_train_step(small_cfg):
    from ipp_rl_tpu.planners.zero.train import (
        TrainBatch,
        init_train_state,
        make_train_step,
        predict_fn,
    )

    hp = MCTSZeroHyperParams(
        num_channels=16,
        num_encoder_res_blocks=2,
        num_global_pooling_channels=4,
    )
    net, state = init_train_state(
        small_cfg, hp, jax.random.key(0), dtype=jnp.float32
    )
    n = small_cfg.environment.num_cells
    A = small_cfg.num_actions
    B = 3
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.normal(size=(B, n, n, hp.input_channels)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, A)) > 0.5, jnp.float32)

    probs, value = predict_fn(net)(state.variables(), planes, mask)
    probs, value = np.asarray(probs), np.asarray(value)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=1e-4)
    # masked logits get -1000 → ~zero probability
    assert probs[np.asarray(mask) == 0].max() < 1e-8
    assert np.all(value >= 0)  # softplus → scaled value ≥ 0, inverted ≥ 0

    batch = TrainBatch(
        planes=planes,
        policy=jnp.full((B, A), 1.0 / A, jnp.float32),
        value=jnp.asarray(rng.uniform(0, 1, B), jnp.float32),
        reward=jnp.zeros((B,), jnp.float32),
        valid_mask=mask,
        weight=jnp.ones((B,), jnp.float32),
    )
    step = make_train_step(net, hp)
    state2, metrics, value_l = step(state, batch, jax.random.key(1), 1e-3)
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["total_loss"]))
    assert value_l.shape == (B,)
    # params actually changed
    flat1 = jax.tree_util.tree_leaves(state.params)
    flat2 = jax.tree_util.tree_leaves(state2.params)
    assert any(not np.allclose(a, b) for a, b in zip(flat1, flat2))


# ------------------------------------------------------- training recipe


def test_onecycle_lr_matches_torch():
    """onecycle_lr must reproduce torch.optim.lr_scheduler.OneCycleLR
    (the reference's exact scheduler construction, reference
    network_wrappers/policy_value_network_wrappers.py:57-69) bit-close
    over the whole step range for several schedule lengths."""
    import torch

    from ipp_rl_tpu.planners.zero.train import onecycle_lr

    hp = MCTSZeroHyperParams()  # learning_rate 5e-4, max 5e-3
    for epochs, num_batches in [(3, 7), (1, 1), (2, 50), (3, 128)]:
        total = epochs * num_batches
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=hp.learning_rate)
        sched = torch.optim.lr_scheduler.OneCycleLR(
            opt,
            max_lr=hp.max_learning_rate,
            epochs=epochs,
            steps_per_epoch=num_batches,
            div_factor=hp.max_learning_rate / hp.learning_rate,
            final_div_factor=100,
            anneal_strategy="linear",
            three_phase=True,
            pct_start=0.40,
        )
        for step in range(total):
            want = opt.param_groups[0]["lr"]  # LR used at this step
            got = onecycle_lr(hp, step, total)
            assert abs(got - want) < 1e-12 * max(1.0, abs(want)) + 1e-15, (
                f"step {step}/{total}: got {got}, torch {want}"
            )
            opt.step()
            sched.step()


def test_optimizer_reset_per_iteration(small_cfg):
    """reset_optimizer zeroes the momentum buffers and step counter —
    the reference rebuilds SGD every train() call (wrappers :51-56)."""
    from ipp_rl_tpu.planners.zero.train import (
        TrainBatch,
        init_train_state,
        make_train_step,
        reset_optimizer,
    )

    hp = MCTSZeroHyperParams(
        num_channels=16, num_encoder_res_blocks=2, num_global_pooling_channels=4
    )
    net, state = init_train_state(small_cfg, hp, jax.random.key(0), dtype=jnp.float32)
    n = small_cfg.environment.num_cells
    A = small_cfg.num_actions
    rng = np.random.default_rng(0)
    batch = TrainBatch(
        planes=jnp.asarray(rng.normal(size=(2, n, n, hp.input_channels)), jnp.float32),
        policy=jnp.full((2, A), 1.0 / A, jnp.float32),
        value=jnp.asarray(rng.uniform(0, 1, 2), jnp.float32),
        reward=jnp.zeros((2,), jnp.float32),
        valid_mask=jnp.ones((2, A), jnp.float32),
        weight=jnp.ones((2,), jnp.float32),
    )
    step = make_train_step(net, hp)
    state, _, _ = step(state, batch, jax.random.key(1), 1e-3)
    assert int(state.step) == 1
    # trace (momentum) state is nonzero after a step
    trace_leaves = [
        x for x in jax.tree_util.tree_leaves(state.opt_state) if hasattr(x, "shape")
    ]
    assert any(np.any(np.asarray(x) != 0) for x in trace_leaves if x.ndim > 0)
    reset = reset_optimizer(hp, state)
    assert int(reset.step) == 0
    reset_leaves = [
        x for x in jax.tree_util.tree_leaves(reset.opt_state) if hasattr(x, "shape")
    ]
    assert all(np.all(np.asarray(x) == 0) for x in reset_leaves if x.ndim > 0)
    # params themselves are untouched by the reset
    l1 = jax.tree_util.tree_leaves(state.params)
    l2 = jax.tree_util.tree_leaves(reset.params)
    assert all(np.array_equal(a, b) for a, b in zip(l1, l2))

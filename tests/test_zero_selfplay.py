"""End-to-end MCTS-zero pipeline tests at tiny scale: self-play episode
generation, replay sampling, one learner iteration with arena gating,
and the deploy-time planner."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipp_rl_tpu.config.schema import MCTSZeroHyperParams, MissionConfig
from ipp_rl_tpu.env.world import IPPWorld
from ipp_rl_tpu.planners.zero.mcts import ZeroMCTS
from ipp_rl_tpu.planners.zero.mission import ZeroPlanner
from ipp_rl_tpu.planners.zero.replay import PrioritizedReplayBuffer, ReplayBuffer
from ipp_rl_tpu.planners.zero.selfplay import SelfPlay
from ipp_rl_tpu.planners.zero.train import init_train_state, predict_fn


TINY_HP = MCTSZeroHyperParams(
    num_mcts_simulations=6,
    max_episode_steps=5,
    num_channels=16,
    num_encoder_res_blocks=2,
    num_global_pooling_channels=4,
    input_history_length=3,
    batch_size=8,
    num_epochs=1,
    temperature_threshold=3,
    shuffle_prior_cov=True,
)


@pytest.fixture(scope="module")
def world(small_cfg):
    return IPPWorld(small_cfg, dtype=jnp.float32)


@pytest.fixture(scope="module")
def net_and_state(small_cfg):
    from ipp_rl_tpu.planners.zero.train import init_train_state

    return init_train_state(small_cfg, TINY_HP, jax.random.key(0))


@pytest.fixture(scope="module")
def trajectory(world, net_and_state):
    net, state = net_and_state
    mcts = ZeroMCTS(world, TINY_HP, episode_horizon=2, predict_fn=predict_fn(net))
    sp = SelfPlay(world, TINY_HP, episode_horizon=2, mcts=mcts)
    traj, ep_values = sp.run(
        jax.random.key(1), num_envs=2, net_variables=state.variables()
    )
    return jax.tree_util.tree_map(np.asarray, traj), np.asarray(ep_values)


def test_selfplay_trajectory(world, trajectory):
    traj, ep_values = trajectory
    E, T = 2, TINY_HP.max_episode_steps
    n = world.cfg.environment.num_cells
    A = world.num_actions
    assert traj.cov.shape == (E, T, n, n)
    assert traj.policy.shape == (E, T, A)
    ok = traj.sample_ok
    assert ok.any(), "no samples generated"
    # policies are distributions over valid actions
    sums = traj.policy[ok].sum(axis=-1)
    np.testing.assert_allclose(sums, 1.0, rtol=1e-4)
    assert np.all(traj.policy[ok][traj.valid_mask[ok] == 0] == 0)
    # rewards are positive while running (information is always gained)
    assert np.all(traj.reward[ok] > 0)
    # value targets are sqrt-scaled sums of forward rewards
    assert np.all(traj.value[ok] >= 0)
    assert np.all(ep_values > 0)
    # budgets decrease along each episode
    for e in range(E):
        steps = np.nonzero(ok[e])[0]
        b = traj.budget[e, steps]
        assert np.all(np.diff(b) < 0)


def test_value_targets_match_reference_window(world, trajectory):
    traj, _ = trajectory
    from ipp_rl_tpu.ops.rewards import scale_value_target

    H = 2  # episode_horizon used in fixture
    T = TINY_HP.max_episode_steps
    gamma = TINY_HP.gamma
    for e in range(2):
        r = traj.reward[e]
        for i in range(T):
            end = min(i + H, T)
            want = sum(gamma ** (j - i) * r[j] for j in range(i, end))
            want = float(np.sqrt(want + 1) - 1)
            np.testing.assert_allclose(traj.value[e, i], want, rtol=1e-4, atol=1e-5)


def test_replay_uniform(world, trajectory):
    traj, _ = trajectory
    from ipp_rl_tpu.planners.zero.selfplay import Trajectory

    buf = ReplayBuffer(world, TINY_HP, window_size=2)
    buf.add_iteration(0, Trajectory(*[jnp.asarray(x) for x in traj]))
    assert len(buf) == traj.sample_ok.sum()
    rng = np.random.default_rng(0)
    batch, idx = buf.sample(4, rng, jax.random.key(2))
    n = world.cfg.environment.num_cells
    assert batch.planes.shape == (4, n, n, TINY_HP.input_channels)
    assert batch.policy.shape == (4, world.num_actions)
    assert np.all(np.asarray(batch.weight) == 1.0)
    # window eviction
    buf.add_iteration(1, Trajectory(*[jnp.asarray(x) for x in traj]))
    buf.add_iteration(2, Trajectory(*[jnp.asarray(x) for x in traj]))
    assert len(buf) == 2 * traj.sample_ok.sum()  # iteration 0 evicted


def test_replay_per(world, trajectory):
    traj, _ = trajectory
    from ipp_rl_tpu.planners.zero.selfplay import Trajectory

    buf = PrioritizedReplayBuffer(world, TINY_HP, window_size=2)
    buf.add_iteration(0, Trajectory(*[jnp.asarray(x) for x in traj]))
    buf.begin_training(batch_size=4, num_epochs=1)
    rng = np.random.default_rng(0)
    batch, idx = buf.sample(4, rng, jax.random.key(3))
    w = np.asarray(batch.weight)
    assert w.max() <= 1.0 + 1e-6
    beta_before = buf.beta
    buf.step()
    assert buf.beta > beta_before
    buf.update(idx, np.full(len(idx), 5.0))
    assert np.all(buf._priorities[idx] == 5.0)


def test_fused_per_sampling_matches_host(world):
    """per_sample_rows draws from the exact host distribution
    p^α/Σp^α over valid slots, with the host importance-weight formula
    (reference replay_buffers.py:129-137)."""
    from ipp_rl_tpu.planners.zero.replay import per_sample_rows

    rng = np.random.default_rng(7)
    K, E, T = 2, 3, 5
    alpha, beta = 0.6, 0.5
    valid = rng.random((K, E, T)) < 0.7
    valid.flat[0] = True  # at least one valid
    pri = np.where(valid, rng.random((K, E, T)) + 0.05, 0.0).astype(np.float32)
    n_valid = valid.sum()

    host_probs = np.where(valid, pri**alpha, 0.0).reshape(-1)
    host_probs = host_probs / host_probs.sum()

    draw = 20000
    flat_idx, rows, w = per_sample_rows(
        jnp.asarray(pri), jnp.asarray(valid.reshape(-1)), alpha,
        jnp.float32(beta), jnp.float32(n_valid), jax.random.key(3), draw,
    )
    flat_idx, w = np.asarray(flat_idx), np.asarray(w)
    # no invalid slot ever drawn
    assert valid.reshape(-1)[flat_idx].all()
    # empirical frequencies match the host sampling distribution
    freq = np.bincount(flat_idx, minlength=K * E * T) / draw
    assert np.abs(freq - host_probs).max() < 0.01
    # weights: (prob·n)^(−β), max-normalized — exact vs host formula
    host_w = (host_probs[flat_idx] * n_valid) ** (-beta)
    host_w = host_w / host_w.max()
    np.testing.assert_allclose(w, host_w, rtol=1e-4)
    # rows decode the flat index
    dec = rows[:, 0] * E * T + rows[:, 1] * T + rows[:, 2]
    np.testing.assert_array_equal(dec, flat_idx)


def test_learner_fused_per_smoke(world, tmp_path):
    """One fused-PER learner iteration trains end-to-end on device."""
    from ipp_rl_tpu.planners.zero.learn import ZeroLearner

    hp = MCTSZeroHyperParams(
        **{**TINY_HP.__dict__, "use_per": True, "num_augmented_samples": 1}
    )
    mc = MissionConfig(type="mcts_zero", episode_horizon=2, hyper_params=hp)
    learner = ZeroLearner(
        world, mc,
        checkpoints_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
        num_envs=2,
    )
    assert learner.fused_per
    learner.learn(num_iterations=1, num_train_batches=2)
    import json, os

    assert os.path.exists(learner.deployment_path())
    lines = open(str(tmp_path / "logs" / "train_metrics.jsonl")).read().splitlines()
    rec = json.loads(lines[-1])
    assert np.isfinite(rec["total_loss"])


def test_learner_smoke(world, tmp_path):
    from ipp_rl_tpu.planners.zero.learn import ZeroLearner, load_checkpoint

    mc = MissionConfig(type="mcts_zero", episode_horizon=2, hyper_params=TINY_HP)
    learner = ZeroLearner(
        world,
        mc,
        checkpoints_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
        num_envs=2,
    )
    learner.learn(num_iterations=1, num_train_batches=2)
    import os

    assert os.path.exists(learner.deployment_path())
    assert os.path.exists(str(tmp_path / "logs" / "train_metrics.jsonl"))
    # schedules decayed on iteration > 0 only
    assert learner.puct_init == TINY_HP.puct_init
    learner.schedule_exploration(1)
    assert learner.puct_init == TINY_HP.puct_init * TINY_HP.puct_init_decay
    # checkpoint roundtrip
    state2 = load_checkpoint(learner.deployment_path(), learner.state)
    l1 = jax.tree_util.tree_leaves(state2.params)
    l2 = jax.tree_util.tree_leaves(learner.state.params)
    assert all(np.allclose(a, b) for a, b in zip(l1, l2))


def test_zero_planner_deploy(world, net_and_state):
    net, state = net_and_state
    mc = MissionConfig(type="mcts_zero", episode_horizon=2, hyper_params=TINY_HP)
    p = ZeroPlanner(world, mc, predict_fn(net), state.variables())
    res = p.run(jax.random.key(5), batch_size=2, max_steps=4)
    assert np.all(res.num_steps >= 1)
    unc = res.metrics["uncertainty"]
    assert unc[:, -1].mean() < unc[:, 0].mean()


def test_zero_planner_raw_policy(world, net_and_state):
    net, state = net_and_state
    hp_raw = TINY_HP.__class__(**{**TINY_HP.__dict__, "num_mcts_simulations": 0})
    mc = MissionConfig(type="mcts_zero", episode_horizon=2, hyper_params=hp_raw)
    p = ZeroPlanner(world, mc, predict_fn(net), state.variables())
    res = p.run(jax.random.key(6), batch_size=2, max_steps=3)
    assert np.all(res.num_steps >= 1)


@pytest.mark.slow
def test_split_network_learner(world, tmp_path):
    """hp.shared_network=False trains split policy/value nets end-to-end."""
    from ipp_rl_tpu.planners.zero.learn import ZeroLearner, load_checkpoint

    hp_split = TINY_HP.__class__(**{**TINY_HP.__dict__, "shared_network": False})
    mc = MissionConfig(type="mcts_zero", episode_horizon=2, hyper_params=hp_split)
    learner = ZeroLearner(
        world,
        mc,
        checkpoints_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
        num_envs=2,
    )
    learner.learn(num_iterations=1, num_train_batches=2)
    import os

    assert os.path.exists(learner.deployment_path())
    state2 = load_checkpoint(learner.deployment_path(), learner.state)
    l1 = jax.tree_util.tree_leaves(state2.policy.params)
    l2 = jax.tree_util.tree_leaves(learner.state.policy.params)
    assert all(np.allclose(a, b) for a, b in zip(l1, l2))


def test_gather_vectorization_exact(world, trajectory):
    """The vectorized _gather must match the naive per-row/per-step loop
    (the round-1 implementation) exactly."""
    traj, _ = trajectory
    from ipp_rl_tpu.planners.zero.selfplay import Trajectory

    buf = ReplayBuffer(world, TINY_HP, window_size=2)
    buf.add_iteration(0, Trajectory(*[np.asarray(x) for x in traj]))
    buf.add_iteration(1, Trajectory(*[np.asarray(x * 0 + x) for x in traj]))
    rng = np.random.default_rng(3)
    rows = buf._index[rng.integers(0, len(buf), size=16)]

    # naive oracle
    hp, L = TINY_HP, TINY_HP.input_history_length
    n = world.cfg.environment.num_cells
    B = len(rows)
    covs = np.zeros((B, L, n, n), np.float32)
    poss = np.zeros((B, L, 3), np.float32)
    bfrs = np.zeros((B, L), np.float32)
    lens = np.zeros((B,), np.int32)
    budget0 = world.cfg.constraints.budget
    for i, (it, e, t) in enumerate(rows):
        tr = buf._iters[int(it)]
        hist_len = min(L, t + 1)
        lens[i] = hist_len
        for k in range(hist_len):
            covs[i, k] = tr.cov[e, t - k]
            poss[i, k] = tr.prev_pos[e, t - k]
            bfrs[i, k] = tr.budget[e, t - k] / budget0

    batch = buf._gather(rows)
    planes_oracle = buf._build_planes(
        jnp.asarray(covs), jnp.asarray(poss), jnp.asarray(bfrs),
        jnp.asarray(lens),
        jnp.asarray(
            np.stack([buf._iters[int(it)].mean[e, t] for it, e, t in rows])
        ),
    )
    np.testing.assert_array_equal(np.asarray(batch.planes), np.asarray(planes_oracle))
    for i, (it, e, t) in enumerate(rows):
        tr = buf._iters[int(it)]
        np.testing.assert_array_equal(np.asarray(batch.policy[i]), tr.policy[e, t])
        np.testing.assert_allclose(float(batch.value[i]), tr.value[e, t], rtol=1e-6)


def test_device_gather_matches_host_gather(world, trajectory):
    """The fused path's in-jit gather against a DeviceWindow must equal
    the host-side _gather for the same index rows."""
    traj, _ = trajectory
    from ipp_rl_tpu.planners.zero.selfplay import Trajectory

    buf = ReplayBuffer(world, TINY_HP, window_size=2)
    buf.add_iteration(0, Trajectory(*[np.asarray(x) for x in traj]))
    buf.add_iteration(1, Trajectory(*[np.asarray(x + 0) for x in traj]))
    rng = np.random.default_rng(5)
    win, slot_map = buf.device_window(max_slots=4)
    rows = buf.epoch_rows(3, 8, rng, slot_map)  # (3, 8, 3) slot rows

    # slot == iteration key order here, so host rows are identical
    inv = {v: k for k, v in slot_map.items()}
    for step in range(rows.shape[0]):
        host_rows = np.stack(
            [
                np.vectorize(inv.__getitem__)(rows[step, :, 0]),
                rows[step, :, 1],
                rows[step, :, 2],
            ],
            axis=-1,
        )
        host_batch = buf._gather(host_rows)
        dev_batch = buf._gather_device(win, jnp.asarray(rows[step]))
        for name in host_batch._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(dev_batch, name)),
                np.asarray(getattr(host_batch, name)),
                rtol=1e-6,
                atol=1e-7,
                err_msg=name,
            )


def test_fused_epoch_runner_trains(world, net_and_state, trajectory):
    """The scanned epoch runner advances the train state and matches a
    manual per-batch replay of the same rows/keys/LRs."""
    from ipp_rl_tpu.planners.zero.selfplay import Trajectory
    from ipp_rl_tpu.planners.zero.train import make_train_step

    traj, _ = trajectory
    net, state0 = init_train_state(world.cfg, TINY_HP, jax.random.key(11))
    step = make_train_step(net, TINY_HP)
    buf = ReplayBuffer(world, TINY_HP, window_size=1)
    buf.add_iteration(0, Trajectory(*[np.asarray(x) for x in traj]))
    win, slot_map = buf.device_window(max_slots=2)
    rng = np.random.default_rng(7)
    rows = jnp.asarray(buf.epoch_rows(4, 8, rng, slot_map))
    lrs = jnp.asarray(np.full((4,), 1e-3, np.float32))
    key = jax.random.key(21)

    runner = buf.make_epoch_runner(step)
    out_state, metrics = runner(state0, win, rows, lrs, key)
    assert int(out_state.step) == 4
    assert np.isfinite(np.asarray(metrics["total_loss"])).all()

    # manual oracle with the same key schedule
    st = init_train_state(world.cfg, TINY_HP, jax.random.key(11))[1]
    keys = jax.random.split(key, 4)
    for i in range(4):
        k_aug, k_drop = jax.random.split(keys[i])
        batch = buf._gather_device(win, rows[i])
        batch = buf._augment(batch, k_aug)
        st, m, _ = step(st, batch, k_drop, lrs[i])
    np.testing.assert_allclose(
        float(m["total_loss"]),
        float(np.asarray(metrics["total_loss"])[-1]),
        rtol=1e-5,
    )
    chex = jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        ),
        out_state.params,
        st.params,
    )
    del chex


@pytest.mark.slow
def test_train_resume(world, tmp_path):
    """Kill-and-resume: a fresh learner with restart_training=True +
    train_examples_iter=k reloads the persisted replay window and skips
    the first self-play (reference mcts_zero_mission.py:304,313,525-531)."""
    import os

    from ipp_rl_tpu.planners.zero.learn import ZeroLearner

    mc = MissionConfig(type="mcts_zero", episode_horizon=2, hyper_params=TINY_HP)
    dirs = dict(
        checkpoints_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
        train_data_dir=str(tmp_path / "data"),
    )
    learner = ZeroLearner(world, mc, num_envs=2, **dirs)
    learner.learn(num_iterations=2, num_train_batches=1)
    # TINY_HP window is 1 at iteration 1 → iter_0 pruned, iter_1 kept
    # (sliding-window deletion, reference mission :364-368)
    assert not os.path.exists(str(tmp_path / "data" / "iter_0.npz"))
    assert os.path.exists(str(tmp_path / "data" / "iter_1.npz"))
    window_samples = len(learner.replay)
    orig_index = learner.replay._index.copy()

    # simulate a crash: brand-new learner resuming from iteration 1
    mc2 = MissionConfig(
        type="mcts_zero", episode_horizon=2, hyper_params=TINY_HP,
        restart_training=True, train_examples_iter=1,
    )
    learner2 = ZeroLearner(world, mc2, num_envs=2, **dirs)
    start, skip = learner2._resume()
    assert (start, skip) == (1, True)
    assert len(learner2.replay) == window_samples
    np.testing.assert_array_equal(learner2.replay._index, orig_index)
    # resumed weights come from the persisted deployment checkpoint
    l1 = jax.tree_util.tree_leaves(learner.state.params)
    l2 = jax.tree_util.tree_leaves(learner2.state.params)
    assert all(np.allclose(a, b) for a, b in zip(l1, l2))

    # a full resumed learn() call runs the remaining iterations
    learner3 = ZeroLearner(world, mc2, num_envs=2, **dirs)
    learner3.learn(num_iterations=3, num_train_batches=1)
    assert os.path.exists(str(tmp_path / "data" / "iter_2.npz"))

    # missing data → resume degrades to a cold start (reference :528)
    mc3 = MissionConfig(
        type="mcts_zero", episode_horizon=2, hyper_params=TINY_HP,
        restart_training=True, train_examples_iter=99,
    )
    learner4 = ZeroLearner(world, mc3, num_envs=2, **dirs)
    assert learner4._resume() == (0, False)


@pytest.mark.slow
def test_learner_best_snapshot_selection(world, tmp_path):
    """deploy_eval_every tracks held-out deploy quality per iteration
    and keeps the best snapshot at shared_net.best — deploy quality
    peaks mid-training (docs/PERFORMANCE.md r4), so the learner must
    not force deployment of the last iteration."""
    import json
    import os

    from ipp_rl_tpu.planners.zero.learn import ZeroLearner

    mc = MissionConfig(type="mcts_zero", episode_horizon=2, hyper_params=TINY_HP)
    learner = ZeroLearner(
        world,
        mc,
        checkpoints_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
        num_envs=2,
        deploy_eval_every=1,
        deploy_eval_envs=2,
        deploy_eval_steps=2,
    )
    learner.learn(num_iterations=2, num_train_batches=2)
    assert os.path.exists(learner.best_path())
    assert learner.best_iteration in (0, 1)
    rows = [
        json.loads(l)
        for l in open(str(tmp_path / "logs" / "train_metrics.jsonl"))
    ]
    evals = [r["deploy_eval"] for r in rows if "deploy_eval" in r]
    assert len(evals) == 2 and all(e > 0 for e in evals)
    assert learner.best_deploy_eval == min(evals)
    # raw-policy eval runs alongside and keeps its own best snapshot (r5)
    pevals = [r["policy_eval"] for r in rows if "policy_eval" in r]
    assert len(pevals) == 2 and all(e > 0 for e in pevals)
    assert learner.best_policy_eval == min(pevals)
    assert os.path.exists(learner.best_policy_path())
    # best tracking is persisted and restored on resume (ADVICE r4)
    assert os.path.exists(learner._best_meta_path())
    learner2 = ZeroLearner(
        world,
        mc,
        checkpoints_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
        num_envs=2,
    )
    learner2._load_best_meta()
    assert learner2.best_deploy_eval == learner.best_deploy_eval
    assert learner2.best_iteration == learner.best_iteration
    assert learner2.best_policy_eval == learner.best_policy_eval


def test_deploy_gate_rolls_back(world, tmp_path):
    """deploy_gate: when the current deploy eval degrades past
    tolerance × best, the learner rolls the network back to the best
    snapshot (the arena accept/rollback mechanism driven by held-out
    deploy quality — fixes late-training collapse at the source)."""
    import json
    import os

    from ipp_rl_tpu.planners.zero.learn import (
        ZeroLearner,
        load_checkpoint,
        save_checkpoint,
    )

    mc = MissionConfig(type="mcts_zero", episode_horizon=2, hyper_params=TINY_HP)
    learner = ZeroLearner(
        world,
        mc,
        checkpoints_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
        num_envs=2,
        deploy_eval_every=1,
        deploy_eval_envs=2,
        deploy_eval_steps=2,
        deploy_gate=1.1,
    )
    # seed a known best snapshot, then force the next eval to look bad
    save_checkpoint(learner.best_path(), learner.state)
    learner.best_deploy_eval = 1.0
    learner.best_iteration = 0
    learner.deploy_eval = lambda: 100.0  # way past 1.1 × best
    learner.policy_eval = lambda: 50.0
    learner.learn(num_iterations=1, num_train_batches=1)
    best_leaves = jax.tree_util.tree_leaves(
        load_checkpoint(learner.best_path(), learner.state).params
    )
    rows = [
        json.loads(l)
        for l in open(str(tmp_path / "logs" / "train_metrics.jsonl"))
    ]
    assert rows[-1]["deploy_rolled_back"] is True
    # network state equals the best snapshot again
    cur = jax.tree_util.tree_leaves(learner.state.params)
    assert all(np.allclose(a, b) for a, b in zip(best_leaves, cur))
    # and the deployment checkpoint holds the rolled-back weights
    dep = load_checkpoint(learner.deployment_path(), learner.state)
    dep_leaves = jax.tree_util.tree_leaves(dep.params)
    assert all(np.allclose(a, b) for a, b in zip(best_leaves, dep_leaves))


def test_policy_target_smoothing(world, net_and_state):
    """policy_target_smoothing blends the STORED target toward uniform-
    over-valid (higher entropy) while keeping it a valid masked
    distribution; default 0.0 is the reference behavior (r5 extension,
    schema.policy_target_smoothing)."""
    import dataclasses

    net, state = net_and_state
    hp_s = dataclasses.replace(TINY_HP, policy_target_smoothing=0.5)
    mcts = ZeroMCTS(world, hp_s, episode_horizon=2, predict_fn=predict_fn(net))
    sp = SelfPlay(world, hp_s, episode_horizon=2, mcts=mcts)
    traj, _ = sp.run(jax.random.key(1), num_envs=2, net_variables=state.variables())
    traj = jax.tree_util.tree_map(np.asarray, traj)
    ok = traj.sample_ok
    assert ok.any()
    pol = traj.policy[ok]
    msk = traj.valid_mask[ok]
    np.testing.assert_allclose(pol.sum(axis=-1), 1.0, rtol=1e-4)
    assert np.all(pol[msk == 0] == 0)
    # every valid action carries at least eps/|valid| mass
    nvalid = msk.sum(axis=-1, keepdims=True)
    floor = 0.5 / nvalid - 1e-6
    assert np.all(pol[msk > 0] >= np.broadcast_to(floor, pol.shape)[msk > 0])

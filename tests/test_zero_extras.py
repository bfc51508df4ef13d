"""Arena gating, replay augmentation, tensorboard logging, temperature
field — the remaining subsystem corners."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipp_rl_tpu.config.schema import MCTSZeroHyperParams, MissionConfig
from ipp_rl_tpu.env.world import IPPWorld


HP = MCTSZeroHyperParams(
    num_mcts_simulations=4,
    max_episode_steps=4,
    num_channels=16,
    num_encoder_res_blocks=2,
    num_global_pooling_channels=4,
    batch_size=8,
    num_epochs=1,
    num_arena_games=3,
    continuous_network_update=False,  # force the arena path
    num_augmented_samples=1,
)


@pytest.fixture(scope="module")
def world(small_cfg):
    return IPPWorld(small_cfg, dtype=jnp.float32)


@pytest.mark.slow
def test_arena_play_games(world):
    from ipp_rl_tpu.planners.zero.arena import Arena
    from ipp_rl_tpu.planners.zero.train import init_train_state, predict_fn

    net, s1 = init_train_state(small_cfg := world.cfg, HP, jax.random.key(0))
    _, s2 = init_train_state(world.cfg, HP, jax.random.key(1))
    arena = Arena(world, HP, episode_horizon=2, max_game_steps=4)
    pred = predict_fn(net)
    r_prev, r_curr = arena.play_games(
        pred, s1.variables(), s2.variables(), num_games=3,
        key=jax.random.key(2), num_simulations=4,
    )
    assert np.isfinite(float(r_prev)) and np.isfinite(float(r_curr))
    # cov-only dynamics always gain information → positive rewards
    assert float(r_prev) > 0 and float(r_curr) > 0


@pytest.mark.slow
def test_learner_arena_gating(world, tmp_path):
    """continuous_network_update=False exercises accept/rollback."""
    from ipp_rl_tpu.planners.zero.learn import ZeroLearner

    mc = MissionConfig(type="mcts_zero", episode_horizon=2, hyper_params=HP)
    learner = ZeroLearner(
        world, mc,
        checkpoints_dir=str(tmp_path / "c"),
        log_dir=str(tmp_path / "l"),
        num_envs=2,
    )
    learner.arena.max_game_steps = 3
    learner.learn(num_iterations=1, num_train_batches=1, arena_games=2)
    # either accepted (deployment ckpt) or rolled back (temp ckpt restored)
    assert os.path.exists(str(tmp_path / "c" / "shared_net.temp"))


def test_replay_augmentation(world):
    from ipp_rl_tpu.planners.zero.replay import ReplayBuffer
    from ipp_rl_tpu.planners.zero.selfplay import SelfPlay, Trajectory
    from ipp_rl_tpu.planners.zero.mcts import ZeroMCTS
    from ipp_rl_tpu.planners.zero.train import init_train_state, predict_fn

    net, state = init_train_state(world.cfg, HP, jax.random.key(0))
    mcts = ZeroMCTS(world, HP, 2, predict_fn(net))
    sp = SelfPlay(world, HP, 2, mcts)
    traj, _ = sp.run(jax.random.key(1), num_envs=2, net_variables=state.variables())

    buf = ReplayBuffer(world, HP, window_size=1)
    buf.add_iteration(0, traj)
    batch, idx = buf.sample(8, np.random.default_rng(0), jax.random.key(2))
    # num_augmented_samples=1 → draw 4, tile ×2
    assert batch.planes.shape[0] == 8
    n = world.cfg.environment.num_cells
    assert batch.planes.shape[1:] == (n, n, HP.input_channels)
    # targets tiled: second half equals first half
    np.testing.assert_allclose(np.asarray(batch.policy[:4]), np.asarray(batch.policy[4:]))
    np.testing.assert_allclose(np.asarray(batch.value[:4]), np.asarray(batch.value[4:]))
    # augmented planes are shifted copies — not identical, same stats scale
    p0, p1 = np.asarray(batch.planes[:4]), np.asarray(batch.planes[4:])
    assert not np.allclose(p0, p1)


def test_tensorboard_writer(world, tmp_path):
    torch_tb = pytest.importorskip("torch.utils.tensorboard")
    from ipp_rl_tpu.planners.zero.learn import ZeroLearner

    hp = MCTSZeroHyperParams(**{**HP.__dict__, "continuous_network_update": True})
    mc = MissionConfig(type="mcts_zero", episode_horizon=2, hyper_params=hp)
    learner = ZeroLearner(
        world, mc,
        checkpoints_dir=str(tmp_path / "c"),
        log_dir=str(tmp_path / "l"),
        num_envs=2,
        use_tensorboard=True,
    )
    learner.learn(num_iterations=1, num_train_batches=1)
    tb_dir = str(tmp_path / "l" / "tensorboard")
    assert os.path.isdir(tb_dir) and len(os.listdir(tb_dir)) > 0


def test_temperature_field(tmp_path):
    from PIL import Image

    from ipp_rl_tpu.config.schema import config_from_dict
    from ipp_rl_tpu.env.fields import temperature_data_field

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 4), dtype=np.uint8)
    Image.fromarray(img, "RGBA").save(tmp_path / "temp.png")

    cfg = config_from_dict(
        {
            "environment": {"x_dim": 8, "y_dim": 8, "resolution": 4},
            "sensor": {
                "simulation": {
                    "type": "temperature_data_field",
                    "dataset_filename": "temp.png",
                }
            },
        }
    )
    field = temperature_data_field(cfg, datasets_dir=str(tmp_path))
    assert field.shape == (8, 8)
    assert field.min() >= 0.0 and field.max() <= 1.0
    assert field.max() == 1.0  # min-max normalized


def test_bf16_inference_search_agreement(world):
    """bf16 network inference (the bench's default search path) agrees
    with f32: same probabilities to bf16 tolerance, and a full search
    driven by the bf16 predict returns a valid root policy."""
    from ipp_rl_tpu.planners.zero.features import init_history
    from ipp_rl_tpu.planners.zero.mcts import ZeroMCTS
    from ipp_rl_tpu.planners.zero.train import init_train_state, predict_fn

    cfg = world.cfg
    net, st = init_train_state(cfg, HP, jax.random.key(0))
    B = 4
    state = world.init_state(jax.random.key(1), B)
    hist = jax.vmap(lambda c, p, b: init_history(cfg, HP, jnp.float32))(
        state.cov, state.pos, state.budget
    )

    # direct predict agreement on real feature planes
    from ipp_rl_tpu.planners.zero.features import feature_planes, push_history

    frac = state.budget / jnp.asarray(cfg.constraints.budget, jnp.float32)
    hist1 = jax.vmap(push_history)(hist, state.cov, state.pos, frac)
    planes = jax.vmap(lambda h, m: feature_planes(world, HP, h, mean=m))(
        hist1, state.mean
    )
    mask = jnp.ones((B, world.num_actions), jnp.float32)
    p32, v32 = predict_fn(net)(st.variables(), planes, mask)
    p16, v16 = predict_fn(net, dtype=jnp.bfloat16)(st.variables(), planes, mask)
    assert p16.dtype == p32.dtype  # outputs come back f32
    np.testing.assert_allclose(np.asarray(p16), np.asarray(p32), atol=0.03)
    np.testing.assert_allclose(np.asarray(v16), np.asarray(v32), rtol=0.08, atol=0.05)

    # end-to-end search through the bf16 predict
    mcts = ZeroMCTS(world, HP, 2, predict_fn(net, dtype=jnp.bfloat16))
    tree, root_mask = mcts.search(
        state.cov, state.mean, state.pos, state.budget, hist,
        jax.random.key(2), net_variables=st.variables(),
    )
    pol = mcts.root_policy(tree, jax.random.key(3), jnp.float32(1.0))
    pol = np.asarray(pol)
    assert np.all(np.isfinite(pol)) and np.all(pol >= 0)
    np.testing.assert_allclose(pol.sum(axis=-1), 1.0, atol=1e-5)
    assert np.all(pol[~np.asarray(root_mask)] < 1e-6)


def test_eval_chunk_padding_matches_unchunked(world):
    """A mission batch that is NOT a multiple of eval_chunk must still be
    chunk-evaluated (padded to whole chunks) and return the same search
    result as the unchunked path — the former silent full-batch fallback
    reintroduced the O(B) activation peak the chunking exists to bound."""
    from ipp_rl_tpu.planners.zero.features import init_history
    from ipp_rl_tpu.planners.zero.mcts import ZeroMCTS
    from ipp_rl_tpu.planners.zero.train import init_train_state, predict_fn

    cfg = world.cfg
    net, st = init_train_state(cfg, HP, jax.random.key(0))
    B = 6  # 6 % 4 != 0 → pad to 8
    state = world.init_state(jax.random.key(1), B)
    hist = jax.vmap(lambda c, p, b: init_history(cfg, HP, jnp.float32))(
        state.cov, state.pos, state.budget
    )

    def visits(chunk):
        mcts = ZeroMCTS(world, HP, 2, predict_fn(net), eval_chunk=chunk)
        tree, _ = mcts.search(
            state.cov, state.mean, state.pos, state.budget, hist,
            jax.random.key(2), net_variables=st.variables(),
        )
        return np.asarray(tree.Nsa[:, 0])

    np.testing.assert_array_equal(visits(0), visits(4))


def test_clean_deploy_search_modes(world):
    """forced_playouts/root_noise off (ZeroPlanner deploy_mode="clean")
    must still produce a valid, visit-conserving search; the reference
    mode (both on) is the default and unchanged."""
    from ipp_rl_tpu.planners.zero.features import init_history
    from ipp_rl_tpu.planners.zero.mcts import ZeroMCTS
    from ipp_rl_tpu.planners.zero.train import init_train_state, predict_fn

    cfg = world.cfg
    net, st = init_train_state(cfg, HP, jax.random.key(0))
    B = 3
    state = world.init_state(jax.random.key(1), B)
    hist = jax.vmap(lambda c, p, b: init_history(cfg, HP, jnp.float32))(
        state.cov, state.pos, state.budget
    )
    mcts = ZeroMCTS(world, HP, 2, predict_fn(net))

    def run(**kw):
        tree, mask = mcts.search(
            state.cov, state.mean, state.pos, state.budget, hist,
            jax.random.key(2), net_variables=st.variables(), **kw,
        )
        return np.asarray(tree.Nsa[:, 0]), np.asarray(mask)

    v_ref, mask = run()
    v_default, _ = run(forced_playouts=True, root_noise=True)
    np.testing.assert_array_equal(v_ref, v_default)  # defaults == reference
    v_clean, _ = run(forced_playouts=False, root_noise=False)
    # visit conservation: every simulation that reached the root's
    # expansion contributes one root visit in both modes
    assert v_clean.sum() > 0
    np.testing.assert_array_equal(v_clean.sum(axis=-1), v_ref.sum(axis=-1))
    assert np.all(v_clean[~mask.astype(bool)] == 0)


def test_value_head_floor_and_unfloored_fix():
    """The reference head (Linear -> SiLU -> Softplus) cannot output
    below softplus(min SiLU) = 0.5636 no matter how negative the Dense
    pre-activation is; unfloored=True (Linear -> Softplus) reaches
    arbitrarily small positive values.  55% of canonical self-play value
    targets sit below the floor (see schema.unfloored_value_head)."""
    import flax
    from ipp_rl_tpu.models.layers import ValueHead

    x = jnp.ones((2, 4, 4, 8))

    for unfloored in (False, True):
        head = ValueHead(
            features=8, num_blocks=1, use_global_context=False,
            num_global_pooling_channels=4, unfloored=unfloored,
        )
        variables = head.init(jax.random.key(0), x, train=False)
        # force a hugely negative Dense pre-activation
        params = flax.core.unfreeze(variables["params"])
        params["head"]["kernel"] = jnp.zeros_like(params["head"]["kernel"])
        params["head"]["bias"] = jnp.full_like(params["head"]["bias"], -30.0)
        variables = {**variables, "params": params}
        value, _ = head.apply(variables, x, train=False)
        v = float(np.asarray(value)[0])
        if unfloored:
            assert v < 1e-6, f"unfloored head should reach ~0, got {v}"
        else:
            # z -> -inf: silu(z) -> 0, softplus(0) = ln 2
            assert abs(v - np.log(2.0)) < 1e-4, v

    # and the floor itself: min over z of softplus(silu(z)) = 0.5636
    z = jnp.linspace(-10, 0, 2001)
    floored = jnp.logaddexp(z * jax.nn.sigmoid(z), 0.0)
    assert abs(float(jnp.min(floored)) - 0.5636) < 1e-3

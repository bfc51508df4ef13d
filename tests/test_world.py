"""World-model tests: lattice vs continuous paths must agree, budget and
masking semantics, measurement synthesis statistics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipp_rl_tpu.env.world import IPPWorld


@pytest.fixture(scope="module")
def world(small_cfg):
    return IPPWorld(small_cfg, dtype=jnp.float64)


def test_init_state(world):
    s = world.init_state(jax.random.key(0), 4)
    n = world.cfg.environment.num_cells
    assert s.mean.shape == (4, n)
    assert s.cov.shape == (4, n, n)
    np.testing.assert_allclose(np.asarray(s.mean), 0.5)
    np.testing.assert_allclose(np.asarray(s.budget), world.cfg.constraints.budget)
    np.testing.assert_allclose(np.asarray(s.pos[0]), [2.0, 2.0, 14.0])
    # worlds differ per mission
    assert not np.allclose(np.asarray(s.ground_truth[0]), np.asarray(s.ground_truth[1]))


def test_continuous_model_matches_table_on_lattice(world):
    """measurement_model_at(lattice point) must reproduce the precomputed
    table exactly — two independent implementations of the same semantics."""
    t = world.table
    for a in [0, 7, 17, t.num_actions - 1, t.num_actions // 2]:
        pos = jnp.asarray(t.lattice.xyz[a], world.dtype)
        H, R, Z, valid = world.measurement_model_at(pos)
        m = int(t.num_meas[a])
        M = world.m_max_cont
        np.testing.assert_allclose(np.asarray(H)[:m], t.H[a, :m], atol=1e-12)
        np.testing.assert_allclose(np.asarray(Z)[:m], t.Z[a, :m], atol=1e-12)
        np.testing.assert_allclose(np.asarray(R)[:m], t.R_diag[a, :m], atol=1e-12)
        assert np.all(np.asarray(valid)[:m])
        np.testing.assert_allclose(np.asarray(H)[m:], 0.0)
        np.testing.assert_allclose(np.asarray(R)[m:], 1.0)


def test_step_index_vs_step_position(world):
    """Committing via lattice index == committing via continuous waypoint
    at the same position (same key → same synthesized measurement)."""
    s = world.init_state(jax.random.key(1), 2)
    a = jnp.asarray([5, 20], jnp.int32)
    key = jax.random.key(7)
    s_idx = world.step_index(s, a, key)
    wp = world.actions_xyz[a]
    s_pos = world.step_position(s, wp, key)
    np.testing.assert_allclose(
        np.asarray(s_idx.mean), np.asarray(s_pos.mean), atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(s_idx.cov), np.asarray(s_pos.cov), atol=1e-9)
    np.testing.assert_allclose(np.asarray(s_idx.budget), np.asarray(s_pos.budget))


def test_step_reduces_uncertainty_and_budget(world):
    s = world.init_state(jax.random.key(2), 3)
    tr0 = np.trace(np.asarray(s.cov), axis1=1, axis2=2)
    s2 = world.step_index(s, jnp.asarray([3, 9, 30], jnp.int32), jax.random.key(3))
    tr1 = np.trace(np.asarray(s2.cov), axis1=1, axis2=2)
    assert np.all(tr1 < tr0)
    assert np.all(np.asarray(s2.budget) < np.asarray(s.budget))
    assert np.all(np.asarray(s2.step) == 1)


def test_inactive_missions_frozen(world):
    s = world.init_state(jax.random.key(4), 2)
    s = s.replace(active=jnp.asarray([True, False]))
    s2 = world.step_index(s, jnp.asarray([3, 9], jnp.int32), jax.random.key(5))
    # mission 1 untouched
    np.testing.assert_allclose(np.asarray(s2.cov[1]), np.asarray(s.cov[1]))
    np.testing.assert_allclose(np.asarray(s2.budget[1]), np.asarray(s.budget[1]))
    assert int(s2.step[1]) == 0
    assert not np.allclose(np.asarray(s2.cov[0]), np.asarray(s.cov[0]))


def test_measurement_noise_statistics(world):
    """Measurement = block-mean of ground truth + altitude noise, clipped."""
    s = world.init_state(jax.random.key(6), 1)
    a = 7  # low-altitude action, rf=1
    Z = world.Z[a]
    clean = np.asarray(Z @ s.ground_truth[0])
    m = int(world.table.num_meas[a])
    zs = []
    for i in range(200):
        z = world.synthesize_measurement(
            s.ground_truth[0], Z, world.noise_std[a], jax.random.key(100 + i)
        )
        zs.append(np.asarray(z)[:m])
    zs = np.stack(zs)
    assert np.all(zs >= 0) and np.all(zs <= 1)
    # unclipped interior values should centre on the block mean
    interior = (clean[:m] > 0.2) & (clean[:m] < 0.8)
    if interior.any():
        np.testing.assert_allclose(
            zs.mean(axis=0)[interior], clean[:m][interior], atol=0.05
        )


def test_evaluate_shapes(world):
    s = world.init_state(jax.random.key(8), 5)
    out = world.evaluate(s)
    for k in ["rmse", "wrmse", "mll", "wmll", "uncertainty"]:
        assert out[k].shape == (5,), k
    assert "uncertainty_difference" in out

"""Multi-device sharding tests on the virtual 8-device CPU mesh:
covariance-row-sharded KF, action-sharded sweeps, dp-sharded training
step (the dryrun_multichip path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipp_rl_tpu.parallel.mesh import make_mesh
from ipp_rl_tpu.parallel.sharded_kalman import (
    sharded_kf_update,
    sharded_sweep_gains,
)
from ipp_rl_tpu.ops.kalman import kf_sweep_gains, kf_update


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_devices=8, dp=1, mp=8)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    n, m = 64, 8  # n divisible by 8 devices
    A_mat = rng.normal(size=(n, n))
    P = A_mat @ A_mat.T / n + 0.5 * np.eye(n)
    H = np.zeros((m, n))
    for i in range(m):
        H[i, rng.choice(n, 4, replace=False)] = 0.25
    R = rng.uniform(0.01, 0.1, m)
    mean = rng.uniform(0, 1, n)
    z = rng.uniform(0, 1, m)
    return P, H, R, mean, z


def test_sharded_kf_matches_dense(mesh, problem):
    P, H, R, mean, z = problem
    mean_ref, P_ref = kf_update(
        jnp.asarray(P), jnp.asarray(mean), jnp.asarray(H), jnp.asarray(R), jnp.asarray(z)
    )
    mean_out, P_out = sharded_kf_update(
        mesh, jnp.asarray(P), jnp.asarray(mean), jnp.asarray(H), jnp.asarray(R), jnp.asarray(z)
    )
    np.testing.assert_allclose(np.asarray(P_out), np.asarray(P_ref), atol=1e-10)
    np.testing.assert_allclose(np.asarray(mean_out), np.asarray(mean_ref), atol=1e-10)


def test_sharded_kf_cov_only(mesh, problem):
    P, H, R, mean, z = problem
    _, P_ref = kf_update(
        jnp.asarray(P), jnp.asarray(mean), jnp.asarray(H), jnp.asarray(R), z=None
    )
    mean_out, P_out = sharded_kf_update(
        mesh, jnp.asarray(P), jnp.asarray(mean), jnp.asarray(H), jnp.asarray(R), z=None
    )
    np.testing.assert_allclose(np.asarray(P_out), np.asarray(P_ref), atol=1e-10)
    np.testing.assert_allclose(np.asarray(mean_out), mean)


def test_sharded_sweep_matches_dense(mesh, problem):
    P, H, R, mean, z = problem
    rng = np.random.default_rng(1)
    n, m = H.shape[1], H.shape[0]
    A = 16  # divisible by 8
    H_all = np.zeros((A, m, n))
    R_all = rng.uniform(0.01, 0.2, (A, m))
    for a in range(A):
        for i in range(m):
            H_all[a, i, rng.choice(n, 3, replace=False)] = 1 / 3
    ref = kf_sweep_gains(jnp.asarray(P), jnp.asarray(H_all), jnp.asarray(R_all))
    got = sharded_sweep_gains(mesh, jnp.asarray(P), jnp.asarray(H_all), jnp.asarray(R_all))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-10)


def test_dryrun_multichip_entry():
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)

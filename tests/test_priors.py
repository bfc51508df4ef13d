"""Prior covariance parity: closed-form Matérn vs sklearn's GP prior
(the reference initializes the belief from an unfitted
GaussianProcessRegressor, reference mapping/mappings.py:236-261)."""

import numpy as np
import jax
import jax.numpy as jnp

from ipp_rl_tpu.ops.priors import (
    cell_center_distances,
    gp_prior_cov,
    init_belief,
    matern_kernel,
    random_spd_prior_cov,
)


def test_matern_matches_sklearn(canonical_cfg):
    from sklearn.gaussian_process import GaussianProcessRegressor
    from sklearn.gaussian_process.kernels import ConstantKernel, Matern

    m = canonical_cfg.mapping
    env = canonical_cfg.environment
    kern = ConstantKernel(m.signal_variance, "fixed") * Matern(
        length_scale=m.length_scale, nu=m.nu, length_scale_bounds="fixed"
    )
    gpr = GaussianProcessRegressor(kernel=kern, alpha=m.noise_variance)
    import itertools

    pts = (
        np.array(
            list(itertools.product(range(env.y_dim), range(env.x_dim))),
            dtype=np.float64,
        )
        * env.resolution
        + 0.5 * env.resolution
    )
    _, ref_cov = gpr.predict(pts, return_cov=True)
    ours = np.asarray(gp_prior_cov(canonical_cfg))
    np.testing.assert_allclose(ours, ref_cov, atol=1e-10)


def test_init_belief_gp(canonical_cfg):
    mean, cov = init_belief(canonical_cfg)
    n = canonical_cfg.environment.num_cells
    assert mean.shape == (n,)
    assert cov.shape == (n, n)
    np.testing.assert_allclose(np.asarray(mean), 0.5)
    eigs = np.linalg.eigvalsh(np.asarray(cov))
    assert eigs.min() > -1e-8


def test_random_spd_prior(canonical_cfg):
    cov = np.asarray(random_spd_prior_cov(canonical_cfg, jax.random.key(0)))
    n = canonical_cfg.environment.num_cells
    assert cov.shape == (n, n)
    np.testing.assert_allclose(cov, cov.T, atol=1e-12)
    assert np.linalg.eigvalsh(cov).min() > -1e-10
    # Frobenius normalization: ‖A·Aᵀ/‖A‖‖ has unit-ish scale
    assert 0.1 < np.linalg.norm(cov) < 10 * n


def test_shuffled_priors_differ(canonical_cfg):
    from ipp_rl_tpu.ops.priors import shuffled_gp_prior_cov

    c1 = shuffled_gp_prior_cov(canonical_cfg, jax.random.key(1))
    c2 = shuffled_gp_prior_cov(canonical_cfg, jax.random.key(2))
    assert not np.allclose(np.asarray(c1), np.asarray(c2))
    # vmappable for per-episode shuffling in self-play
    keys = jax.random.split(jax.random.key(0), 4)
    covs = jax.vmap(lambda k: shuffled_gp_prior_cov(canonical_cfg, k))(keys)
    assert covs.shape == (4, 100, 100)

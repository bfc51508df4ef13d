"""Belief priors: Matérn GP covariance (closed form) and random SPD.

The reference calls sklearn's GaussianProcessRegressor on an unfitted
model, whose prior covariance over the cell centres is just the Matérn
kernel matrix (reference mapping/mappings.py:236-261).  We evaluate the
ν = 3/2 (and ν = 1/2, 5/2) closed forms directly in jnp so priors can be
generated on device, per mission, inside jitted self-play loops — the
reference's per-episode "shuffle_prior_cov" becomes a vmapped sample of
kernel hyper-parameters (reference mapping/mappings.py:238-240).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ipp_rl_tpu.config.schema import Config


def cell_center_distances(cfg: Config) -> np.ndarray:
    """(N, N) pairwise distances between grid cell centres, row-major
    ordering (reference mapping/mappings.py:248-256)."""
    env = cfg.environment
    rows, cols = np.meshgrid(
        np.arange(env.y_dim), np.arange(env.x_dim), indexing="ij"
    )
    pts = (
        np.stack([rows.ravel(), cols.ravel()], axis=1).astype(np.float64)
        * env.resolution
        + 0.5 * env.resolution
    )
    diff = pts[:, None, :] - pts[None, :, :]
    return np.sqrt(np.sum(diff * diff, axis=-1))


def matern_kernel(
    dists: jnp.ndarray, signal_variance: jnp.ndarray, length_scale: jnp.ndarray, nu: float
) -> jnp.ndarray:
    """Matérn covariance, closed forms for ν ∈ {0.5, 1.5, 2.5}.

    ν = 1.5: σ²(1 + √3 d/ℓ)·exp(−√3 d/ℓ) — the canonical config
    (reference config/example.yaml:27).
    """
    if nu == 0.5:
        k = jnp.exp(-dists / length_scale)
    elif nu == 1.5:
        s = math.sqrt(3.0) * dists / length_scale
        k = (1.0 + s) * jnp.exp(-s)
    elif nu == 2.5:
        s = math.sqrt(5.0) * dists / length_scale
        k = (1.0 + s + s * s / 3.0) * jnp.exp(-s)
    else:
        raise NotImplementedError(f"Matérn ν={nu} has no closed form here")
    return signal_variance * k


def gp_prior_cov(
    cfg: Config,
    signal_variance: jnp.ndarray | float | None = None,
    length_scale: jnp.ndarray | float | None = None,
) -> jnp.ndarray:
    """(N, N) GP prior covariance over cell centres."""
    m = cfg.mapping
    sv = m.signal_variance if signal_variance is None else signal_variance
    ls = m.length_scale if length_scale is None else length_scale
    dists = jnp.asarray(cell_center_distances(cfg))
    return matern_kernel(dists, sv, ls, m.nu)


def shuffled_gp_prior_cov(cfg: Config, key: jax.Array) -> jnp.ndarray:
    """Per-episode randomized prior: hyper-params drawn U[0.8, 1.2]×nominal
    (reference mapping/mappings.py:238-240)."""
    m = cfg.mapping
    k1, k2 = jax.random.split(key)
    sv = jax.random.uniform(
        k1, (), minval=0.8 * m.signal_variance, maxval=1.2 * m.signal_variance
    )
    ls = jax.random.uniform(
        k2, (), minval=0.8 * m.length_scale, maxval=1.2 * m.length_scale
    )
    return gp_prior_cov(cfg, sv, ls)


def random_spd_prior_cov(cfg: Config, key: jax.Array, shuffle: bool = False) -> jnp.ndarray:
    """Random SPD prior A·Aᵀ/‖A‖_F with A ~ N(prior_cov_mean, prior_cov_std)
    (reference mapping/mappings.py:219-234)."""
    m = cfg.mapping
    n = cfg.environment.num_cells
    if shuffle:
        key, sub = jax.random.split(key)
        mean = jax.random.uniform(sub, (), minval=0.1, maxval=m.prior_cov_mean)
        std = mean
    else:
        mean, std = m.prior_cov_mean, m.prior_cov_std
    A = mean + std * jax.random.normal(key, (n, n))
    return (A @ A.T) / jnp.linalg.norm(A, ord="fro")


def init_belief(
    cfg: Config, key: jax.Array | None = None, shuffle: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Prior (mean (N,), cov (N, N)): mean ≡ 0.5; covariance from the GP
    kernel or a random SPD matrix per config
    (reference mapping/mappings.py:217-261)."""
    n = cfg.environment.num_cells
    mean = 0.5 * jnp.ones((n,))
    if cfg.mapping.fit_gaussian_process:
        if shuffle:
            assert key is not None, "shuffled GP prior needs a PRNG key"
            cov = shuffled_gp_prior_cov(cfg, key)
        else:
            cov = gp_prior_cov(cfg)
    else:
        assert key is not None, "random SPD prior needs a PRNG key"
        cov = random_spd_prior_cov(cfg, key, shuffle=shuffle)
    return mean, cov

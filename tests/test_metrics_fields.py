"""Metrics vs numpy oracles of the reference formulas
(reference planning/evaluation_metrics.py:4-58) and ground-truth field
generator properties (reference simulations/)."""

import numpy as np
import jax
import jax.numpy as jnp

from ipp_rl_tpu.env.fields import (
    gaussian_random_field,
    hotspot_random_field,
    split_random_field,
)
from ipp_rl_tpu.ops import metrics as M


def _data(seed=0, n=100):
    rng = np.random.default_rng(seed)
    gt = rng.uniform(0, 1, n)
    est = np.clip(gt + rng.normal(0, 0.1, n), 0, 1)
    diag = rng.uniform(0.05, 0.5, n)
    mask = rng.uniform(size=n) > 0.4
    return gt, est, diag, mask


def test_rmse():
    gt, est, diag, mask = _data()
    np.testing.assert_allclose(
        float(M.rmse(jnp.asarray(gt), jnp.asarray(est))),
        np.sqrt(np.mean((gt - est) ** 2)),
    )
    np.testing.assert_allclose(
        float(M.rmse(jnp.asarray(gt), jnp.asarray(est), jnp.asarray(mask))),
        np.sqrt(np.mean((gt[mask] - est[mask]) ** 2)),
    )


def test_wrmse():
    gt, est, diag, mask = _data()
    w = (gt - est.min()) / (gt.max() - gt.min())
    w = w / w.sum()
    np.testing.assert_allclose(
        float(M.weighted_rmse(jnp.asarray(gt), jnp.asarray(est))),
        np.sqrt(np.mean(w * (gt - est) ** 2)),
    )


def test_mll_wmll():
    gt, est, diag, mask = _data()
    ll = 0.5 * np.log(2 * np.pi * diag) + (gt - est) ** 2 / 2 * diag
    np.testing.assert_allclose(
        float(M.mean_log_loss(jnp.asarray(gt), jnp.asarray(est), jnp.asarray(diag))),
        np.mean(ll),
    )
    w = (gt - est.min()) / (gt.max() - gt.min())
    w = w / w.sum()
    np.testing.assert_allclose(
        float(
            M.weighted_mean_log_loss(
                jnp.asarray(gt), jnp.asarray(est), jnp.asarray(diag)
            )
        ),
        np.mean(w * ll),
    )


def test_uncertainty():
    gt, est, diag, mask = _data()
    np.testing.assert_allclose(float(M.map_uncertainty(jnp.asarray(diag))), diag.sum())
    np.testing.assert_allclose(
        float(M.map_uncertainty(jnp.asarray(diag), jnp.asarray(mask))),
        diag[mask].sum(),
    )
    expected = (np.mean(diag[~mask]) - np.mean(diag[mask])) / np.mean(diag[~mask])
    np.testing.assert_allclose(
        float(M.map_uncertainty_difference(jnp.asarray(diag), jnp.asarray(mask))),
        expected,
        rtol=1e-12,
    )


def test_metrics_batched():
    gt, est, diag, mask = _data()
    out = M.rmse(jnp.stack([jnp.asarray(gt)] * 3), jnp.stack([jnp.asarray(est)] * 3))
    assert out.shape == (3,)


# ------------------------------------------------------------------ fields


def test_grf(canonical_cfg):
    f = gaussian_random_field(canonical_cfg, jax.random.key(0))
    assert f.shape == (10, 10)
    assert float(f.min()) == 0.0 and float(f.max()) == 1.0
    f2 = gaussian_random_field(canonical_cfg, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(f), np.asarray(f2))  # deterministic
    f3 = gaussian_random_field(canonical_cfg, jax.random.key(1))
    assert not np.allclose(np.asarray(f), np.asarray(f3))
    # vmappable — thousands of worlds in one call
    fb = jax.vmap(lambda k: gaussian_random_field(canonical_cfg, k))(
        jax.random.split(jax.random.key(2), 8)
    )
    assert fb.shape == (8, 10, 10)


def test_hotspot(canonical_cfg):
    f = np.asarray(hotspot_random_field(canonical_cfg, jax.random.key(3)))
    vals = np.unique(f.round(6))
    assert len(vals) == 2  # exactly low/high values
    assert vals[0] <= 0.3 and vals[1] >= 0.7
    assert (f.round(6) == vals[1]).sum() > 0


def test_split(canonical_cfg):
    f = np.asarray(split_random_field(canonical_cfg, jax.random.key(4)))
    vals = np.unique(f.round(6))
    assert len(vals) == 2
    assert vals[0] <= 0.35 and vals[1] >= 0.65

"""Map-quality evaluation metrics (reference planning/evaluation_metrics.py:4-58).

All metrics are pure jnp reductions over (ground truth, belief mean,
belief covariance diagonal) and broadcast over leading mission-batch
axes, so evaluating thousands of missions is one fused kernel.

Masked variants use a weight trick instead of boolean gathers (dynamic
shapes don't jit): mean over masked entries = Σ m·x / Σ m.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x, axis=-1)
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1.0)


def rmse(
    ground_truth: jnp.ndarray,
    estimate: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Root-mean-squared error, optionally over the region of interest
    (reference planning/evaluation_metrics.py:4-13).  Inputs flattened (…, N)."""
    sq = jnp.square(ground_truth - estimate)
    return jnp.sqrt(_masked_mean(sq, mask))


def weighted_rmse(ground_truth: jnp.ndarray, estimate: jnp.ndarray) -> jnp.ndarray:
    """Ground-truth-weighted RMSE (reference planning/evaluation_metrics.py:31-36)."""
    gt_range = jnp.max(ground_truth, axis=-1, keepdims=True) - jnp.min(
        ground_truth, axis=-1, keepdims=True
    )
    w = (ground_truth - jnp.min(estimate, axis=-1, keepdims=True)) / gt_range
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return jnp.sqrt(jnp.mean(w * jnp.square(ground_truth - estimate), axis=-1))


def mean_log_loss(
    ground_truth: jnp.ndarray, estimate: jnp.ndarray, cov_diag: jnp.ndarray
) -> jnp.ndarray:
    """Mean Gaussian log-loss scaled by per-cell variances
    (reference planning/evaluation_metrics.py:39-45; reproduces its exact
    expression, including the ``(err²/2)·σ²`` scaling)."""
    ll = 0.5 * jnp.log(2.0 * jnp.pi * cov_diag) + jnp.square(
        ground_truth - estimate
    ) / 2.0 * cov_diag
    return jnp.mean(ll, axis=-1)


def weighted_mean_log_loss(
    ground_truth: jnp.ndarray, estimate: jnp.ndarray, cov_diag: jnp.ndarray
) -> jnp.ndarray:
    """Ground-truth-weighted mean log-loss
    (reference planning/evaluation_metrics.py:48-58)."""
    gt_range = jnp.max(ground_truth, axis=-1, keepdims=True) - jnp.min(
        ground_truth, axis=-1, keepdims=True
    )
    w = (ground_truth - jnp.min(estimate, axis=-1, keepdims=True)) / gt_range
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    ll = 0.5 * jnp.log(2.0 * jnp.pi * cov_diag) + jnp.square(
        ground_truth - estimate
    ) / 2.0 * cov_diag
    return jnp.mean(w * ll, axis=-1)


def map_uncertainty(
    cov_diag: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """tr(P), optionally restricted to the region of interest
    (reference planning/evaluation_metrics.py:16-21)."""
    if mask is None:
        return jnp.sum(cov_diag, axis=-1)
    return jnp.sum(cov_diag * mask.astype(cov_diag.dtype), axis=-1)


def map_uncertainty_difference(
    cov_diag: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Relative mean-variance gap: uninteresting vs interesting regions
    (reference planning/evaluation_metrics.py:24-28)."""
    m = mask.astype(cov_diag.dtype)
    var_in = _masked_mean(cov_diag, m)
    var_out = _masked_mean(cov_diag, 1.0 - m)
    return (var_out - var_in) / var_out

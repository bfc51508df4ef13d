"""Reward and adaptive-mask ops (reference planning/common/rewards.py:8-39).

Reward = information gain per unit cost: (tr(P) − tr(P')) / (cost + 1),
optionally restricted to the adaptive region-of-interest.  The trace
difference is supplied directly by the Kalman sweep kernels
(ops/kalman.py), so these are pure elementwise helpers.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def adaptive_mask(
    mean_flat: jnp.ndarray,
    cov_diag: jnp.ndarray,
    value_threshold: float,
    interval_factor: float,
) -> jnp.ndarray:
    """Cells whose upper CI bound clears the interest threshold
    (reference planning/common/rewards.py:8-12).  Broadcasts leading axes.

    Returns a float mask (1.0 interesting / 0.0 not) so it can multiply
    straight into the trace-reduction kernels.
    """
    return (mean_flat + interval_factor * cov_diag >= value_threshold).astype(
        cov_diag.dtype
    )


def reward_from_gain(gain: jnp.ndarray, cost: jnp.ndarray) -> jnp.ndarray:
    """(tr(P) − tr(P')) / (cost + 1) (reference planning/common/rewards.py:15-31)."""
    return gain / (cost + 1.0)


def scale_value_target(value: jnp.ndarray) -> jnp.ndarray:
    """√(v + 1) − 1 compression of value targets
    (reference planning/common/rewards.py:34-35)."""
    return jnp.sqrt(value + 1.0) - 1.0


def invert_scaled_value_target(value: jnp.ndarray) -> jnp.ndarray:
    """Inverse of scale_value_target: v² + 2v
    (reference planning/common/rewards.py:38-39)."""
    return jnp.square(value) + 2.0 * value

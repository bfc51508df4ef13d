"""Pallas kernel correctness (interpret mode on CPU; the TPU-compiled
path is exercised by benchmarks on hardware)."""

import numpy as np
import jax.numpy as jnp

from ipp_rl_tpu.ops.pallas_kernels import spd_inverse_pallas


def test_spd_inverse_pallas_interpret():
    rng = np.random.default_rng(0)
    B, M = 70, 9  # deliberately not a tile multiple (tests padding)
    S = np.zeros((B, M, M))
    for i in range(B):
        A = rng.normal(size=(M, M))
        S[i] = A @ A.T + 0.5 * np.eye(M)
    got = np.asarray(
        spd_inverse_pallas(jnp.asarray(S, jnp.float32), tile=32, interpret=True)
    )
    want = np.linalg.inv(S)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-4)


def test_spd_inverse_pallas_batch_dims():
    rng = np.random.default_rng(1)
    S = np.zeros((3, 5, 4, 4))
    for idx in np.ndindex(3, 5):
        A = rng.normal(size=(4, 4))
        S[idx] = A @ A.T + np.eye(4)
    got = np.asarray(
        spd_inverse_pallas(jnp.asarray(S, jnp.float64), tile=8, interpret=True)
    )
    np.testing.assert_allclose(got, np.linalg.inv(S), rtol=1e-9)

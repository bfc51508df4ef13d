"""Numerical unit tests for the Kalman kernels against an independent
numpy float64 oracle implementing the reference update semantics
(reference mapping/mappings.py:155-215: symmetrized innovation, Cholesky
gain, P ← P − Wc·Wcᵀ)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipp_rl_tpu.ops.kalman import (
    kf_gain_factor,
    kf_sweep_gains,
    kf_trace_reduction,
    kf_update,
)


def oracle_kf(P, H, R, x=None, z=None):
    """Textbook Joseph-free KF with Cholesky gain, float64."""
    S = H @ P @ H.T + R
    S = 0.5 * (S + S.T)
    L = np.linalg.cholesky(S)
    Linv = np.linalg.inv(L)
    Wc = P @ H.T @ Linv.T
    P_next = P - Wc @ Wc.T
    if z is None:
        return None, P_next
    W = Wc @ Linv
    x_next = x + W @ (z - H @ x)
    return x_next, P_next


def random_spd(rng, n):
    A = rng.normal(size=(n, n))
    return A @ A.T / n + 0.5 * np.eye(n)


@pytest.fixture
def problem():
    rng = np.random.default_rng(0)
    n, m = 25, 6
    P = random_spd(rng, n)
    H = np.zeros((m, n))
    for i in range(m):
        cells = rng.choice(n, size=4, replace=False)
        H[i, cells] = 0.25
    R = np.diag(rng.uniform(0.01, 0.1, m))
    x = rng.uniform(0, 1, n)
    z = rng.uniform(0, 1, m)
    return P, H, R, x, z


def test_kf_update_matches_oracle(problem):
    P, H, R, x, z = problem
    x_ref, P_ref = oracle_kf(P, H, R, x, z)
    x_out, P_out = kf_update(jnp.asarray(P), jnp.asarray(x), jnp.asarray(H), jnp.asarray(np.diag(R)), jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(P_out), P_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(x_out), x_ref, atol=1e-10)


def test_cov_only_update(problem):
    P, H, R, x, z = problem
    _, P_ref = oracle_kf(P, H, R)
    mean_out, P_out = kf_update(jnp.asarray(P), jnp.asarray(x), jnp.asarray(H), jnp.asarray(np.diag(R)), z=None)
    np.testing.assert_allclose(np.asarray(P_out), P_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(mean_out), x)  # mean untouched


def test_padded_rows_are_noop(problem):
    """Zero H rows with unit R must not change the update — the static-shape
    padding contract (ops/sensor_model.py docstring)."""
    P, H, R, x, z = problem
    m_pad = 4
    H_pad = np.vstack([H, np.zeros((m_pad, H.shape[1]))])
    R_pad = np.concatenate([np.diag(R), np.ones(m_pad)])
    z_pad = np.concatenate([z, 0.37 * np.ones(m_pad)])  # pad obs arbitrary
    x_ref, P_ref = oracle_kf(P, H, R, x, z)
    x_out, P_out = kf_update(
        jnp.asarray(P), jnp.asarray(x), jnp.asarray(H_pad), jnp.asarray(R_pad), jnp.asarray(z_pad)
    )
    np.testing.assert_allclose(np.asarray(P_out), P_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(x_out), x_ref, atol=1e-10)


def test_posterior_psd_and_trace_monotone(problem):
    P, H, R, x, z = problem
    _, P_out = kf_update(jnp.asarray(P), jnp.asarray(x), jnp.asarray(H), jnp.asarray(np.diag(R)), z=None)
    P_out = np.asarray(P_out)
    np.testing.assert_allclose(P_out, P_out.T, atol=1e-12)
    eigs = np.linalg.eigvalsh(P_out)
    assert eigs.min() > -1e-10
    assert np.trace(P_out) < np.trace(P)


def test_gain_factor_trace_identity(problem):
    """tr(P) − tr(P') == ‖Wc‖²_F — the planner fast-path identity."""
    P, H, R, x, z = problem
    Wc, _ = kf_gain_factor(jnp.asarray(P), jnp.asarray(H), jnp.asarray(np.diag(R)))
    _, P_out = oracle_kf(P, H, R)
    gain = float(jnp.sum(Wc * Wc))
    np.testing.assert_allclose(gain, np.trace(P) - np.trace(P_out), rtol=1e-10)


def test_trace_reduction_masked(problem):
    P, H, R, x, z = problem
    n = P.shape[0]
    rng = np.random.default_rng(1)
    mask = (rng.uniform(size=n) > 0.5).astype(np.float64)
    _, P_out = oracle_kf(P, H, R)
    expected = np.sum((np.diag(P) - np.diag(P_out)) * mask)
    got = float(
        kf_trace_reduction(
            jnp.asarray(P), jnp.asarray(H), jnp.asarray(np.diag(R)), jnp.asarray(mask)
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_sweep_matches_individual_updates(problem):
    """kf_sweep_gains over a stack of measurement models == per-action
    trace reductions (replaces reference optimization.py:82-90 pool)."""
    P, H, R, x, z = problem
    rng = np.random.default_rng(2)
    n, m = P.shape[0], H.shape[0]
    A = 7
    H_all = np.zeros((A, m, n))
    R_all = np.zeros((A, m))
    for a in range(A):
        for i in range(m):
            cells = rng.choice(n, size=3, replace=False)
            H_all[a, i, cells] = 1 / 3
        R_all[a] = rng.uniform(0.01, 0.2, m)
    # make one action partially padded
    H_all[3, -2:] = 0.0
    R_all[3, -2:] = 1.0

    gains = np.asarray(
        kf_sweep_gains(jnp.asarray(P), jnp.asarray(H_all), jnp.asarray(R_all))
    )
    for a in range(A):
        _, P_out = oracle_kf(P, H_all[a], np.diag(R_all[a]))
        np.testing.assert_allclose(gains[a], np.trace(P) - np.trace(P_out), rtol=1e-8)


def test_sweep_vmaps_over_batch(problem):
    P, H, R, x, z = problem
    rng = np.random.default_rng(3)
    P2 = random_spd(rng, P.shape[0])
    H_all = np.stack([H, H * 0.5])
    R_all = np.stack([np.diag(R), np.diag(R) * 2])
    batched = jax.vmap(lambda p: kf_sweep_gains(p, jnp.asarray(H_all), jnp.asarray(R_all)))(
        jnp.stack([jnp.asarray(P), jnp.asarray(P2)])
    )
    assert batched.shape == (2, 2)
    single = kf_sweep_gains(jnp.asarray(P2), jnp.asarray(H_all), jnp.asarray(R_all))
    np.testing.assert_allclose(np.asarray(batched[1]), np.asarray(single), rtol=1e-12)


def test_spd_inverse_matches_numpy(problem):
    from ipp_rl_tpu.ops.smallchol import spd_inverse, spd_cholesky_dense

    rng = np.random.default_rng(7)
    S = np.zeros((5, 9, 9))
    for i in range(5):
        Ai = rng.normal(size=(9, 9))
        S[i] = Ai @ Ai.T + 0.5 * np.eye(9)
    got = np.asarray(spd_inverse(jnp.asarray(S)))
    want = np.linalg.inv(S)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
    L = np.asarray(spd_cholesky_dense(jnp.asarray(S)))
    np.testing.assert_allclose(L, np.linalg.cholesky(S), rtol=1e-8, atol=1e-10)


def test_fast_math_decision_agreement():
    """bf16-streamed sweeps must (a) approximate f32 gains closely and
    (b) agree on the greedy argmax for realistic belief states."""
    from ipp_rl_tpu.config.schema import config_from_dict
    from ipp_rl_tpu.env.world import IPPWorld
    from ipp_rl_tpu.ops.priors import gp_prior_cov

    cfg = config_from_dict(
        {"environment": {"x_dim": 10, "y_dim": 10, "resolution": 4}}
    )
    world = IPPWorld(cfg, dtype=jnp.float32)
    H = jnp.asarray(world.table.H, jnp.float32)
    R = jnp.asarray(world.table.R_diag, jnp.float32)
    P0 = jnp.asarray(np.asarray(gp_prior_cov(cfg)), jnp.float32)
    rng = np.random.default_rng(0)
    agree = 0
    trials = 20
    P = P0
    for t in range(trials):
        g32 = np.asarray(kf_sweep_gains(P, H, R))
        g16 = np.asarray(kf_sweep_gains(P, H, R, fast_math=True))
        rel = np.abs(g16 - g32) / np.maximum(np.abs(g32), 1e-6)
        assert rel.max() < 0.05, f"trial {t}: rel err {rel.max():.4f}"
        agree += int(np.argmax(g32) == np.argmax(g16))
        # evolve the belief with a random commit to vary the state
        a = int(rng.integers(0, world.num_actions))
        _, P = kf_update(
            P, jnp.zeros(100, jnp.float32), H[a], R[a], z=None
        )
    assert agree >= trials - 1, f"argmax agreement {agree}/{trials}"


def test_structured_sweep_matches_dense():
    """kf_sweep_gains_structured (gather rf==1 blocks from P/Q +
    group-locally padded dense rf>1 path) must match the dense sweep,
    with and without an adaptive mask, and agree on the argmax under
    fast_math."""
    from ipp_rl_tpu.config.schema import config_from_dict
    from ipp_rl_tpu.env.world import IPPWorld
    from ipp_rl_tpu.ops.kalman import kf_sweep_gains_structured
    from ipp_rl_tpu.ops.priors import gp_prior_cov

    cfg = config_from_dict(
        {"environment": {"x_dim": 10, "y_dim": 10, "resolution": 4}}
    )
    world = IPPWorld(cfg, dtype=jnp.float32)
    # the canonical lattice must actually exercise both paths
    assert any(g["cells"] is not None for g in world.sweep_groups)
    assert any(g["H"] is not None for g in world.sweep_groups)
    H = jnp.asarray(world.table.H, jnp.float32)
    R = jnp.asarray(world.table.R_diag, jnp.float32)
    P = jnp.asarray(np.asarray(gp_prior_cov(cfg)), jnp.float32)
    rng = np.random.default_rng(1)
    mask = jnp.asarray((rng.random(100) > 0.4).astype(np.float32))
    for t in range(8):
        for m in (None, mask):
            dense = np.asarray(kf_sweep_gains(P, H, R, m))
            struct = np.asarray(
                kf_sweep_gains_structured(
                    P, world.sweep_groups, world.sweep_perm, m
                )
            )
            np.testing.assert_allclose(struct, dense, rtol=2e-4, atol=1e-6)
        fast = np.asarray(
            kf_sweep_gains_structured(
                P, world.sweep_groups, world.sweep_perm, fast_math=True
            )
        )
        dense = np.asarray(kf_sweep_gains(P, H, R))
        assert np.argmax(fast) == np.argmax(dense)
        a = int(rng.integers(0, world.num_actions))
        _, P = kf_update(P, jnp.zeros(100, jnp.float32), H[a], R[a], z=None)


def test_structured_sweep_vmaps_over_batch():
    from ipp_rl_tpu.config.schema import config_from_dict
    from ipp_rl_tpu.env.world import IPPWorld
    from ipp_rl_tpu.ops.kalman import kf_sweep_gains_structured
    from ipp_rl_tpu.ops.priors import gp_prior_cov

    cfg = config_from_dict(
        {"environment": {"x_dim": 10, "y_dim": 10, "resolution": 4}}
    )
    world = IPPWorld(cfg, dtype=jnp.float32)
    P0 = jnp.asarray(np.asarray(gp_prior_cov(cfg)), jnp.float32)
    Ps = jnp.stack([P0, P0 * 0.5, P0 * 2.0])
    batched = jax.vmap(
        lambda p: kf_sweep_gains_structured(
            p, world.sweep_groups, world.sweep_perm
        )
    )(Ps)
    for b in range(3):
        single = kf_sweep_gains_structured(
            Ps[b], world.sweep_groups, world.sweep_perm
        )
        np.testing.assert_allclose(
            np.asarray(batched[b]), np.asarray(single), rtol=1e-5
        )


def test_batched_sweep_matches_dense():
    """kf_sweep_gains_batched (r5: window groups from offset-diagonal
    planes + static slices, dense groups as large batched GEMMs with the
    mission axis as the big dimension) must match the dense sweep for a
    batch of evolving beliefs, with and without the adaptive mask, and
    agree on the per-mission argmax under fast_math."""
    from ipp_rl_tpu.config.schema import config_from_dict
    from ipp_rl_tpu.env.world import IPPWorld
    from ipp_rl_tpu.ops.kalman import kf_sweep_gains_batched
    from ipp_rl_tpu.ops.priors import gp_prior_cov

    cfg = config_from_dict(
        {"environment": {"x_dim": 10, "y_dim": 10, "resolution": 4}}
    )
    world = IPPWorld(cfg, dtype=jnp.float32)
    prep = world.sweep_batched
    assert prep is not None
    # the canonical lattice must exercise the window AND dense paths
    kinds = {g["kind"] for g in prep["groups"]}
    assert "win" in kinds and "dense" in kinds
    H = jnp.asarray(world.table.H, jnp.float32)
    R = jnp.asarray(world.table.R_diag, jnp.float32)
    P0 = jnp.asarray(np.asarray(gp_prior_cov(cfg)), jnp.float32)
    rng = np.random.default_rng(7)
    B = 5
    # evolve each mission's belief differently
    Ps = []
    P = P0
    for b in range(B):
        Ps.append(P)
        for _ in range(3):
            a = int(rng.integers(0, world.num_actions))
            _, P = kf_update(P, jnp.zeros(100, jnp.float32), H[a], R[a], z=None)
    Pb = jnp.stack(Ps)
    mask = jnp.asarray((rng.random((B, 100)) > 0.4).astype(np.float32))
    for m in (None, mask):
        dense = np.stack(
            [
                np.asarray(kf_sweep_gains(Pb[b], H, R, None if m is None else m[b]))
                for b in range(B)
            ]
        )
        batched = np.asarray(kf_sweep_gains_batched(Pb, prep, m))
        np.testing.assert_allclose(batched, dense, rtol=2e-4, atol=1e-6)
    fast = np.asarray(kf_sweep_gains_batched(Pb, prep, None, fast_math=True))
    dense = np.stack([np.asarray(kf_sweep_gains(Pb[b], H, R)) for b in range(B)])
    assert np.all(np.argmax(fast, axis=1) == np.argmax(dense, axis=1))


def test_batched_sweep_with_jitter_and_single_level():
    """Window detection on a single-altitude (window-only) lattice and
    jitter pass-through."""
    from ipp_rl_tpu.config.schema import config_from_dict
    from ipp_rl_tpu.env.world import IPPWorld
    from ipp_rl_tpu.ops.kalman import kf_sweep_gains_batched
    from ipp_rl_tpu.ops.priors import gp_prior_cov

    cfg = config_from_dict(
        {
            "environment": {"x_dim": 8, "y_dim": 8, "resolution": 4},
            "constraints": {
                "min_altitude": 8.0, "max_altitude": 8.0, "altitude_levels": 1,
            },
        }
    )
    world = IPPWorld(cfg, dtype=jnp.float32)
    prep = world.sweep_batched
    assert prep is not None
    assert any(g["kind"] == "win" for g in prep["groups"])
    H = jnp.asarray(world.table.H, jnp.float32)
    R = jnp.asarray(world.table.R_diag, jnp.float32)
    P0 = jnp.asarray(np.asarray(gp_prior_cov(cfg)), jnp.float32)
    Pb = jnp.stack([P0, 0.7 * P0])
    for jit_ in (0.0, 1e-4):
        dense = np.stack(
            [np.asarray(kf_sweep_gains(Pb[b], H, R, jitter=jit_)) for b in range(2)]
        )
        batched = np.asarray(kf_sweep_gains_batched(Pb, prep, None, jitter=jit_))
        np.testing.assert_allclose(batched, dense, rtol=2e-4, atol=1e-6)

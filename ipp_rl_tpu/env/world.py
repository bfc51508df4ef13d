"""Batched IPP world: belief state pytree + measurement/commit dynamics.

The unit of work is a mission batch.  State is one pytree of arrays with
a leading batch axis; every transition is a pure jittable function.  The
reference's object graph (GridMap / Mapping / Sensor / Simulation,
reference mapping/mappings.py, sensors/cameras.py, simulations/) becomes:

  * ``BeliefState``  — {mean, cov, pos, budget, ground truth, flags},
  * ``IPPWorld``     — static config + precomputed ActionTable constants,
    with ``step_index`` (lattice actions, table gathers) and
    ``step_position`` (continuous waypoints, measurement model built
    in-jit with static padded shapes) transition kernels.

Both paths run the identical Cholesky KF commit (ops/kalman.py).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ipp_rl_tpu.config.schema import Config
from ipp_rl_tpu.ops import metrics as metrics_ops
from ipp_rl_tpu.ops.geometry import travel_costs
from ipp_rl_tpu.ops.kalman import kf_update
from ipp_rl_tpu.ops.priors import init_belief
from ipp_rl_tpu.ops.sensor_model import (
    ActionTable,
    build_action_table,
    build_sweep_plan,
)
from ipp_rl_tpu.env.fields import generate_ground_truth


@struct.dataclass
class BeliefState:
    """Per-mission belief + bookkeeping; all fields have leading batch axis B."""

    mean: jnp.ndarray  # (B, N) flattened belief mean
    cov: jnp.ndarray  # (B, N, N) belief covariance
    pos: jnp.ndarray  # (B, 3) current UAV position (world metres)
    budget: jnp.ndarray  # (B,) remaining travel budget
    ground_truth: jnp.ndarray  # (B, N) flattened true field
    active: jnp.ndarray  # (B,) bool — mission still running
    step: jnp.ndarray  # (B,) int32 — measurements taken

    @property
    def batch_size(self) -> int:
        return self.mean.shape[0]


def _continuous_mmax(cfg: Config) -> int:
    """Static upper bound on measurement rows for any in-band position.

    FoV grows with altitude; the resolution factor jumps 1→2 above 10 m
    (reference sensors/cameras.py:122-125), so the extremes are the
    largest rf=1 FoV (z = min(10, max_alt)) and the max-altitude FoV."""
    from ipp_rl_tpu.ops.geometry import project_field_of_view, resolution_factor

    env, con = cfg.environment, cfg.constraints
    centre = np.array([env.extent_x / 2, env.extent_y / 2, 0.0])
    m_max = 1
    for z in (min(10.0, con.max_altitude), con.max_altitude, con.min_altitude):
        pos = centre.copy()
        pos[2] = z
        xl, xr, yu, yd = project_field_of_view(pos, cfg)
        rf = resolution_factor(z)
        m = math.ceil((xr - xl + 1) / rf) * math.ceil((yd - yu + 1) / rf)
        m_max = max(m_max, m)
    return m_max


class IPPWorld:
    """Static world/sensor model shared by all planners.

    Holds the config and the device-resident ActionTable constants.
    All methods are pure and jit/vmap-safe unless noted.
    """

    def __init__(self, cfg: Config, dtype=jnp.float32, fast_sweeps: bool = False):
        self.cfg = cfg
        self.dtype = dtype
        # bf16-streamed planner sweeps (see ops/kalman.kf_sweep_gains);
        # belief commits remain full precision either way
        self.fast_sweeps = fast_sweeps
        self.table: ActionTable = build_action_table(cfg)
        t = self.table
        self.H = jnp.asarray(t.H, dtype)  # (A, M, N)
        self.R_diag = jnp.asarray(t.R_diag, dtype)  # (A, M)
        self.Z = jnp.asarray(t.Z, dtype)  # (A, M, N)
        self.noise_std = jnp.asarray(t.noise_std, dtype)  # (A,)
        self.meas_valid = jnp.asarray(t.meas_valid)  # (A, M) bool
        self.fov_mask = jnp.asarray(t.fov_mask)  # (A, N) bool
        self.actions_xyz = jnp.asarray(t.lattice.xyz, dtype)  # (A, 3)
        self.pair_dist = jnp.asarray(t.pair_dist, dtype)  # (A, A)
        self.pair_cost = jnp.asarray(t.pair_cost, dtype)  # (A, A)
        self.num_actions = t.num_actions
        self.m_max_cont = _continuous_mmax(cfg)
        # structured sweep plan (ops/kalman.kf_sweep_gains_structured):
        # rf==1 groups gather innovation/gain blocks straight from P/Q,
        # rf>1 groups stream a group-locally padded P·Hᵀ
        plan = build_sweep_plan(
            t, x_dim=cfg.environment.x_dim, y_dim=cfg.environment.y_dim
        )
        self.sweep_groups = tuple(
            {
                "cells": None if g.cells is None else jnp.asarray(g.cells),
                "H": None if g.H is None else jnp.asarray(g.H, dtype),
                "R": jnp.asarray(g.R, dtype),
                "vv": jnp.asarray(
                    g.valid[:, :, None] & g.valid[:, None, :], dtype
                ),
            }
            for g in plan.groups
        )
        self.sweep_perm = jnp.asarray(plan.perm)
        # whole-batch sweep constants (ops/kalman.kf_sweep_gains_batched,
        # the r5 redesign: window groups assemble innovation blocks from
        # offset-diagonal planes with static slices; dense groups run as
        # large batched GEMMs with the mission axis as the big dimension)
        from ipp_rl_tpu.ops.kalman import prepare_batched_sweep

        self.sweep_batched = prepare_batched_sweep(plan, dtype)
        # initial UAV position: corner cell centre at max altitude
        # (reference planning/missions.py:69 init_action = [2, 2, 14])
        res = cfg.environment.resolution
        self.init_pos = jnp.asarray(
            [0.5 * res, 0.5 * res, cfg.constraints.max_altitude], dtype
        )

    # ------------------------------------------------------------------ init

    def init_state(
        self,
        key: jax.Array,
        batch_size: int,
        shuffle_prior: bool = False,
        ground_truth: Optional[jnp.ndarray] = None,
        budget: Optional[jnp.ndarray] = None,
    ) -> BeliefState:
        """Fresh mission batch: new worlds, GP priors, full budget."""
        cfg = self.cfg
        n = cfg.environment.num_cells
        k_gt, k_prior = jax.random.split(key)

        if ground_truth is None:
            gt_keys = jax.random.split(k_gt, batch_size)
            gt = jax.vmap(lambda k: generate_ground_truth(cfg, k))(gt_keys)
            gt = gt.reshape(batch_size, n).astype(self.dtype)
        else:
            gt = jnp.broadcast_to(ground_truth, (batch_size, n)).astype(self.dtype)

        if shuffle_prior:
            pk = jax.random.split(k_prior, batch_size)
            mean, cov = jax.vmap(
                lambda k: init_belief(cfg, k, shuffle=True)
            )(pk)
        else:
            mean1, cov1 = init_belief(cfg)
            mean = jnp.broadcast_to(mean1, (batch_size, n))
            cov = jnp.broadcast_to(cov1, (batch_size, n, n))

        if budget is None:
            budget = jnp.full((batch_size,), cfg.constraints.budget, self.dtype)
        return BeliefState(
            mean=mean.astype(self.dtype),
            cov=cov.astype(self.dtype),
            pos=jnp.broadcast_to(self.init_pos, (batch_size, 3)),
            budget=budget,
            ground_truth=gt,
            active=jnp.ones((batch_size,), bool),
            step=jnp.zeros((batch_size,), jnp.int32),
        )

    # ------------------------------------------------- continuous-pos models

    def measurement_model_at(
        self, pos: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Jittable measurement model for an arbitrary position (3,).

        Returns (H (M, N), R_diag (M,), Zmat (M, N), valid (M,)) with the
        static padded row count M = m_max_cont.  Reproduces the reference
        FoV projection, clipping and block-weight rules exactly
        (reference sensors/cameras.py:49-75, sensors/models/sensor_models.py:54-81).
        """
        cfg = self.cfg
        env, sensor = cfg.environment, cfg.sensor
        n = env.num_cells
        M = self.m_max_cont
        dt = self.dtype

        z = pos[2]
        range_x = jnp.floor(
            2.0 * z * math.tan(0.5 * math.radians(sensor.angle_x)) / env.resolution
        )
        range_y = jnp.floor(
            2.0 * z * math.tan(0.5 * math.radians(sensor.angle_y)) / env.resolution
        )
        col = jnp.floor(pos[0] / env.resolution)
        row = jnp.floor(pos[1] / env.resolution)
        rad_x = jnp.floor(0.5 * range_x)
        rad_y = jnp.floor(0.5 * range_y)
        xl = jnp.clip(col - rad_x, 0, env.x_dim - 1).astype(jnp.int32)
        xr = jnp.clip(col + rad_x, 0, env.x_dim - 1).astype(jnp.int32)
        yu = jnp.clip(row - rad_y, 0, env.y_dim - 1).astype(jnp.int32)
        yd = jnp.clip(row + rad_y, 0, env.y_dim - 1).astype(jnp.int32)
        rf = jnp.where(z > 10.0, 2, 1).astype(jnp.int32)

        w = xr - xl + 1
        h = yd - yu + 1
        nx = (w + rf - 1) // rf  # ceil(w / rf)
        ny = (h + rf - 1) // rf
        m = nx * ny

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (M, 4), 0)  # measurement idx
        slot = jax.lax.broadcasted_iota(jnp.int32, (M, 4), 1)  # block slot 0..3
        by = rows_i // nx
        bx = rows_i - nx * by
        dy = slot // 2
        dx = slot - 2 * dy
        cy = yu + by * rf + dy
        cx = xl + bx * rf + dx
        slot_ok = (dy < rf) & (dx < rf)
        in_fov = (cx <= xr) & (cy <= yd)
        row_ok = rows_i < m
        cell_ok = slot_ok & in_fov & row_ok
        k_cells = jnp.sum(cell_ok, axis=1)  # cells per block

        full = k_cells == rf * rf
        h_weight = jnp.where(full, 1.0 / (rf * rf), 1.0 / rf).astype(dt)
        z_weight = jnp.where(k_cells > 0, 1.0 / jnp.maximum(k_cells, 1), 0.0).astype(dt)

        cell = cy * env.x_dim + cx  # (M, 4) flattened cell indices
        cell = jnp.where(cell_ok, cell, n)  # park invalid in a dump slot
        onehot = jax.nn.one_hot(cell, n + 1, dtype=dt)[..., :n]  # (M, 4, N)
        block = jnp.sum(onehot, axis=1)  # (M, N) indicator of block cells
        H = h_weight[:, None] * block
        Zmat = z_weight[:, None] * block

        valid = row_ok[:, 0]
        var = sensor.coeff_a * (1.0 - jnp.exp(-sensor.coeff_b * z))
        R = jnp.where(valid, (rf.astype(dt) ** 3) * var, 1.0)
        return H, R, Zmat, valid

    # ------------------------------------------------------------ transitions

    def synthesize_measurement(
        self,
        ground_truth: jnp.ndarray,
        Zmat: jnp.ndarray,
        noise_std: jnp.ndarray,
        key: jax.Array,
    ) -> jnp.ndarray:
        """z = clip(Z·gt + σ(h)·ε, 0, 1) — the simulated camera
        (reference simulations/simulations.py:26-34)."""
        clean = Zmat @ ground_truth
        noisy = clean + noise_std * jax.random.normal(key, clean.shape, clean.dtype)
        return jnp.clip(noisy, 0.0, 1.0)

    def _commit(
        self,
        state_mean,
        state_cov,
        gt,
        H,
        R,
        Zmat,
        noise_std,
        key,
        jitter: float,
    ):
        z = self.synthesize_measurement(gt, Zmat, noise_std, key)
        return kf_update(state_cov, state_mean, H, R, z, jitter=jitter)

    @partial(jax.jit, static_argnums=(0,), static_argnames=("jitter",))
    def step_index(
        self,
        state: BeliefState,
        action_idx: jnp.ndarray,
        key: jax.Array,
        jitter: float = 0.0,
    ) -> BeliefState:
        """Take a measurement at lattice action ``action_idx`` (B,) and
        commit the belief update; masked no-op for inactive missions."""
        B = state.batch_size
        act = state.active
        # Inactive missions: zero the measurement rows instead of
        # where-selecting the full (N, N) covariance afterwards — H = 0
        # makes K = P·Hᵀ·S⁻¹ = 0, so the Joseph commit returns P and the
        # mean update returns mean EXACTLY (P is kept symmetric every
        # commit, so the final re-symmetrization is bit-neutral).  The
        # dropped selects were ~0.5 GB of pure HBM traffic per B=4096
        # replan step.
        H = self.H[action_idx] * act[:, None, None].astype(self.dtype)  # (B, M, N)
        R = self.R_diag[action_idx]
        Zmat = self.Z[action_idx]
        std = self.noise_std[action_idx]
        keys = jax.random.split(key, B)

        mean_next, cov_next = jax.vmap(
            lambda m, P, g, h, r, zm, s, k: self._commit(m, P, g, h, r, zm, s, k, jitter)
        )(state.mean, state.cov, state.ground_truth, H, R, Zmat, std, keys)

        new_pos = self.actions_xyz[action_idx]
        cost = travel_costs(
            new_pos, state.pos, self.cfg.uav.max_v, self.cfg.uav.max_a
        )
        return state.replace(
            mean=mean_next,
            cov=cov_next,
            pos=jnp.where(act[:, None], new_pos, state.pos),
            budget=jnp.where(act, state.budget - cost, state.budget),
            step=jnp.where(act, state.step + 1, state.step),
        )

    @partial(jax.jit, static_argnums=(0,), static_argnames=("jitter",))
    def step_position(
        self,
        state: BeliefState,
        waypoint: jnp.ndarray,
        key: jax.Array,
        jitter: float = 0.0,
    ) -> BeliefState:
        """Continuous-waypoint variant: measurement model built in-jit."""
        B = state.batch_size
        keys = jax.random.split(key, B)
        sensor = self.cfg.sensor
        var = sensor.coeff_a * (1.0 - jnp.exp(-sensor.coeff_b * waypoint[:, 2]))
        # injected std = get_noise_variance, the reference's quirk
        # (PARITY.md §14, ops/sensor_model.py)
        std = var.astype(self.dtype)

        def one(m, P, g, wp, s, k):
            H, R, Zmat, _ = self.measurement_model_at(wp)
            return self._commit(m, P, g, H, R, Zmat, s, k, jitter)

        mean_next, cov_next = jax.vmap(one)(
            state.mean, state.cov, state.ground_truth, waypoint, std, keys
        )
        cost = travel_costs(
            waypoint, state.pos, self.cfg.uav.max_v, self.cfg.uav.max_a
        )
        act = state.active
        keep = lambda new, old: jnp.where(
            act.reshape((B,) + (1,) * (new.ndim - 1)), new, old
        )
        return state.replace(
            mean=keep(mean_next, state.mean),
            cov=keep(cov_next, state.cov),
            pos=keep(waypoint, state.pos),
            budget=jnp.where(act, state.budget - cost, state.budget),
            step=jnp.where(act, state.step + 1, state.step),
        )

    # ------------------------------------------------------------------ eval

    @partial(jax.jit, static_argnums=(0,))
    def evaluate(self, state: BeliefState) -> Dict[str, jnp.ndarray]:
        """All quality metrics for the batch (reference planning/missions.py:176-203)."""
        cfg = self.cfg
        gt = state.ground_truth
        est = state.mean
        diag = jax.vmap(jnp.diag)(state.cov)
        mask = (
            (gt >= cfg.scenario.value_threshold) if cfg.scenario.adaptive else None
        )
        out = {
            "rmse": metrics_ops.rmse(gt, est, mask),
            "wrmse": metrics_ops.weighted_rmse(gt, est),
            "mll": metrics_ops.mean_log_loss(gt, est, diag),
            "wmll": metrics_ops.weighted_mean_log_loss(gt, est, diag),
            "uncertainty": metrics_ops.map_uncertainty(diag, mask),
        }
        if cfg.scenario.adaptive:
            out["uncertainty_difference"] = metrics_ops.map_uncertainty_difference(
                diag, mask
            )
        return out

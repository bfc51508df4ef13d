"""Network input feature planes (reference planning/common/features.py).

The CNN consumes covariance-matrix-sized planes: each channel is
(N, N) where N = num_grid_cells (reference features.py:36, 54-56).
Default layout (input_history_length L = 3, use_action_costs_input):

  per history step (most recent first):
    [min-max-normalized covariance state (adaptive rows/cols zeroed),
     x/extent plane, y/extent plane, (z−zmin)/(zmax−zmin) plane,
     budget-fraction plane]                       (reference :123-144)
  zero padding for missing history               (reference :142-144)
  + one action-costs plane: row i = normalized cost from the current
    position (at min altitude) to cell i         (reference :61-70)

Total channels = 5·L + 1 = 16 for the canonical config.

History is a fixed-shape ring: (L, N, N) covariance states plus (L, 3)
positions, (L,) budgets, and a scalar length — a pure pytree, so the
whole history push + feature build lives inside jitted search/self-play
loops (the reference rebuilds these planes in Python per MCTS leaf,
reference mcts.py:185-197).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ipp_rl_tpu.config.schema import Config, MCTSZeroHyperParams
from ipp_rl_tpu.env.world import IPPWorld
from ipp_rl_tpu.ops.rewards import adaptive_mask


class EpisodeHistory(NamedTuple):
    """Most-recent-first ring of belief snapshots (one mission)."""

    covs: jnp.ndarray  # (L, N, N)
    positions: jnp.ndarray  # (L, 3)
    budgets: jnp.ndarray  # (L,) — budget fraction of initial
    length: jnp.ndarray  # () int32 — number of valid entries


def init_history(cfg: Config, hp: MCTSZeroHyperParams, dtype=jnp.float32) -> EpisodeHistory:
    L = hp.input_history_length
    n = cfg.environment.num_cells
    return EpisodeHistory(
        covs=jnp.zeros((L, n, n), dtype),
        positions=jnp.zeros((L, 3), dtype),
        budgets=jnp.zeros((L,), dtype),
        length=jnp.int32(0),
    )


def push_history(
    h: EpisodeHistory, cov: jnp.ndarray, pos: jnp.ndarray, budget_frac: jnp.ndarray
) -> EpisodeHistory:
    """Insert at the front, evicting the oldest (reference features.py:18-26)."""
    return EpisodeHistory(
        covs=jnp.concatenate([cov[None], h.covs[:-1]], axis=0),
        positions=jnp.concatenate([pos[None], h.positions[:-1]], axis=0),
        budgets=jnp.concatenate([budget_frac[None], h.budgets[:-1]], axis=0),
        length=jnp.minimum(h.length + 1, h.covs.shape[0]),
    )


def fov_cell_mask(cfg: Config, pos: jnp.ndarray) -> jnp.ndarray:
    """Exact in-jit FoV footprint (N,) at an ARBITRARY position.

    Reproduces the reference's project_field_of_view clipping rules
    (reference sensors/cameras.py:49-75) — the same math the
    continuous-position measurement model uses
    (env/world.py measurement_model_at) — so `use_fov_input` planes are
    exact even off-lattice (e.g. the arena's [0, 0, 10] start), where
    the former nearest-lattice-action approximation deviated."""
    import math

    env, sensor = cfg.environment, cfg.sensor
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
    xl = jnp.clip(col - rad_x, 0, env.x_dim - 1)
    xr = jnp.clip(col + rad_x, 0, env.x_dim - 1)
    yu = jnp.clip(row - rad_y, 0, env.y_dim - 1)
    yd = jnp.clip(row + rad_y, 0, env.y_dim - 1)
    cols = jnp.arange(env.x_dim)
    rows = jnp.arange(env.y_dim)
    # two preserved reference quirks (features.py:154-166): the
    # footprint drops the LAST row and column of the projected FoV
    # (linspace(xl, xr, xr−xl+1)[:-1]), and the plane's flat index is
    # x·x_dim + y — TRANSPOSED relative to the reference's own H-matrix
    # convention (y·x_dim + x, actions.py:69-70)
    mx = (cols >= xl) & (cols <= xr - 1)
    my = (rows >= yu) & (rows <= yd - 1)
    return (mx[:, None] & my[None, :]).reshape(-1)


def _min_max_normalize(x: jnp.ndarray) -> jnp.ndarray:
    lo, hi = jnp.min(x), jnp.max(x)
    same = hi == lo
    safe_hi = jnp.where(same & (hi == 0), 1.0, hi)
    return jnp.where(same, x / safe_hi, (x - lo) / (hi - lo))


def feature_planes(
    world: IPPWorld,
    hp: MCTSZeroHyperParams,
    history: EpisodeHistory,
    mean: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Build (N, N, C) NHWC feature planes for one mission.

    ``mean``: current belief mean (N,), needed for the adaptive mask
    (reference features.py:94-99 zeroes uninteresting rows+cols of each
    state plane).  vmap over missions for the batched search.
    """
    cfg = world.cfg
    L, n = history.covs.shape[0], history.covs.shape[1]
    dt = history.covs.dtype
    scen = cfg.scenario

    valid = (jnp.arange(L) < history.length).astype(dt)  # (L,)

    def state_plane(cov):
        s = cov
        if scen.adaptive and mean is not None:
            m = adaptive_mask(
                mean, jnp.diag(cov), scen.value_threshold, scen.interval_factor
            )
            s = s * m[:, None] * m[None, :]
        return _min_max_normalize(s)

    states = jax.vmap(state_plane)(history.covs)  # (L, N, N)

    ones = jnp.ones((L, n, n), dt)
    env, con = cfg.environment, cfg.constraints
    if hp.use_fov_input:
        # FoV indicator planes: outer product of the EXACT footprint at
        # the stored position (reference features.py:35-44 +
        # cameras.py:49-75), valid on and off the lattice
        fov = jax.vmap(lambda p: fov_cell_mask(cfg, p))(
            history.positions
        ).astype(dt)  # (L, N)
        fov_planes = fov[:, :, None] * fov[:, None, :]
        budget_planes = history.budgets[:, None, None] * ones
        planes = jnp.stack([states, fov_planes, budget_planes], axis=1)  # (L, 3, N, N)
    else:
        x_rel = history.positions[:, 0] / env.extent_x
        y_rel = history.positions[:, 1] / env.extent_y
        z_rel = (history.positions[:, 2] - con.min_altitude) / (
            con.max_altitude - con.min_altitude
        )
        planes = jnp.stack(
            [
                states,
                x_rel[:, None, None] * ones,
                y_rel[:, None, None] * ones,
                z_rel[:, None, None] * ones,
                history.budgets[:, None, None] * ones,
            ],
            axis=1,
        )  # (L, 5, N, N)

    planes = planes * valid[:, None, None, None]  # zero-pad short history
    planes = planes.reshape(-1, n, n)  # (L*5, N, N)

    if hp.use_action_costs_input:
        # row i = travel cost from current position (altitude pinned to
        # min_altitude) to cell centre i at min_altitude, min-max
        # normalized (reference features.py:61-70)
        from ipp_rl_tpu.ops.geometry import travel_costs

        cur = history.positions[0].at[2].set(con.min_altitude)
        cells = world.actions_xyz[: env.num_cells].at[:, 2].set(con.min_altitude)
        costs = travel_costs(cells, cur[None, :], cfg.uav.max_v, cfg.uav.max_a)
        # cast: actions_xyz is f32, so costs may be wider than the plane
        # dtype (e.g. bf16 inference planes) — don't let the concat below
        # promote every channel back to f32
        plane = _min_max_normalize(costs).astype(dt)[:, None] * jnp.ones((n, n), dt)
        planes = jnp.concatenate([planes, plane[None]], axis=0)

    return jnp.moveaxis(planes, 0, -1)  # NHWC (N, N, C)

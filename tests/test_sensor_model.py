"""ActionTable precompute vs an independent oracle of the reference
measurement-model semantics (reference sensors/models/sensor_models.py:38-81,
sensors/cameras.py:44-75, mapping/mappings.py:126)."""

import math

import numpy as np
import pytest

from ipp_rl_tpu.ops.geometry import project_field_of_view, resolution_factor
from ipp_rl_tpu.ops.sensor_model import (
    ActionTable,
    altitude_noise_variance,
    build_action_table,
)


@pytest.fixture(scope="module")
def table(canonical_cfg) -> ActionTable:
    return build_action_table(canonical_cfg)


def oracle_fov(pos, cfg):
    """Independent FoV oracle: footprint 2h·tan(θ/2) metres → cells →
    radius → clip."""
    env, s = cfg.environment, cfg.sensor
    fx = 2 * pos[2] * math.tan(math.radians(s.angle_x) / 2)
    fy = 2 * pos[2] * math.tan(math.radians(s.angle_y) / 2)
    rx = math.floor(math.floor(fx / env.resolution) / 2)
    ry = math.floor(math.floor(fy / env.resolution) / 2)
    cx = math.floor(pos[0] / env.resolution)
    cy = math.floor(pos[1] / env.resolution)
    clip = lambda v, hi: max(0, min(v, hi))
    return (
        clip(cx - rx, env.x_dim - 1),
        clip(cx + rx, env.x_dim - 1),
        clip(cy - ry, env.y_dim - 1),
        clip(cy + ry, env.y_dim - 1),
    )


def test_fov_projection_matches_oracle(canonical_cfg):
    for pos in [
        (2.0, 2.0, 14.0),
        (18.0, 22.0, 8.0),
        (38.0, 38.0, 14.0),
        (20.0, 2.0, 8.0),
        (0.5, 39.5, 14.0),
    ]:
        assert project_field_of_view(np.array(pos), canonical_cfg) == oracle_fov(
            pos, canonical_cfg
        )


def test_canonical_fov_sizes(canonical_cfg):
    # altitude 8: footprint 9.24 m -> 2 cells range -> radius 1 -> 3x3, rf 1
    xl, xr, yu, yd = project_field_of_view(np.array([18.0, 18.0, 8.0]), canonical_cfg)
    assert (xr - xl + 1, yd - yu + 1) == (3, 3)
    assert resolution_factor(8.0) == 1
    # altitude 14: footprint 16.17 m -> 4 cells range -> radius 2 -> 5x5, rf 2
    xl, xr, yu, yd = project_field_of_view(np.array([18.0, 18.0, 14.0]), canonical_cfg)
    assert (xr - xl + 1, yd - yu + 1) == (5, 5)
    assert resolution_factor(14.0) == 2


def test_table_shapes(table, canonical_cfg):
    assert table.num_actions == canonical_cfg.num_actions == 200
    assert table.max_meas == 9  # both altitudes give 9 measurement pixels
    assert table.H.shape == (200, 9, 100)
    assert table.Z.shape == (200, 9, 100)


def test_h_rows_oracle_low_altitude(table, canonical_cfg):
    """rf=1: each measurement row selects exactly one FoV cell, weight 1."""
    # action: level 0 (alt 8), interior cell (4, 4) -> idx 44
    a = 44
    xl, xr, yu, yd = table.fov_rect[a]
    assert table.res_factor[a] == 1
    m = table.num_meas[a]
    assert m == (xr - xl + 1) * (yd - yu + 1)
    for i in range(m):
        row = table.H[a, i]
        (cells,) = np.nonzero(row)
        assert len(cells) == 1
        yy = yu + i // (xr - xl + 1)
        xx = xl + i % (xr - xl + 1)
        assert cells[0] == yy * canonical_cfg.environment.x_dim + xx
        assert row[cells[0]] == 1.0
        np.testing.assert_allclose(table.Z[a, i], row)


def test_h_rows_oracle_high_altitude(table, canonical_cfg):
    """rf=2 interior: full 2x2 blocks weight 1/4; 5-wide FoV leaves partial
    edge blocks with weight 1/2 (reference sensor_models.py:76-78)."""
    n_cells = canonical_cfg.environment.num_cells
    a = n_cells + 44  # level 1 (alt 14), cell (4, 4)
    xl, xr, yu, yd = table.fov_rect[a]
    assert table.res_factor[a] == 2
    w, h = xr - xl + 1, yd - yu + 1
    assert (w, h) == (5, 5)
    nx = math.ceil(w / 2)
    assert table.num_meas[a] == nx * math.ceil(h / 2) == 9
    x_dim = canonical_cfg.environment.x_dim
    for i in range(9):
        by, bx = i // nx, i % nx
        xs = range(xl + bx * 2, min(xl + bx * 2 + 2, xl + w))
        ys = range(yu + by * 2, min(yu + by * 2 + 2, yu + h))
        cells = sorted(y * x_dim + x for y in ys for x in xs)
        row = table.H[a, i]
        (nz,) = np.nonzero(row)
        assert list(nz) == cells
        expected_w = 0.25 if len(cells) == 4 else 0.5
        np.testing.assert_allclose(row[nz], expected_w)
        # Z uses the exact block mean
        np.testing.assert_allclose(table.Z[a, i][nz], 1.0 / len(cells))


def test_r_diag(table, canonical_cfg):
    s = canonical_cfg.sensor
    a_low, a_high = 44, 144
    var8 = altitude_noise_variance(8.0, s.coeff_a, s.coeff_b)
    var14 = altitude_noise_variance(14.0, s.coeff_a, s.coeff_b)
    np.testing.assert_allclose(table.R_diag[a_low, : table.num_meas[a_low]], var8)
    np.testing.assert_allclose(
        table.R_diag[a_high, : table.num_meas[a_high]], 8.0 * var14
    )
    # pad entries are exactly 1 (SPD-preserving no-op)
    assert np.all(table.R_diag[a_low, table.num_meas[a_low] :] == 1.0)
    assert np.all(table.H[a_low, table.num_meas[a_low] :] == 0.0)


def test_corner_clipping(table, canonical_cfg):
    """Corner action at high altitude: FoV clipped to 3x3, fewer rows."""
    a = canonical_cfg.environment.num_cells  # level 1, cell (0, 0)
    xl, xr, yu, yd = table.fov_rect[a]
    assert (xl, yu) == (0, 0)
    assert (xr - xl + 1, yd - yu + 1) == (3, 3)
    assert table.num_meas[a] == 4  # ceil(3/2)^2
    # rows beyond num_meas are padded
    assert np.all(table.meas_valid[a, 4:] == False)  # noqa: E712


def test_z_rows_partition_fov(table):
    """Every FoV cell belongs to exactly one Z block (area partition)."""
    for a in [0, 44, 100, 144, 199]:
        col_sums = table.Z[a].sum(axis=0)
        fov = table.fov_mask[a]
        np.testing.assert_allclose(col_sums[fov] > 0, True)
        np.testing.assert_allclose(col_sums[~fov], 0.0)
        # each row of Z is an average: weights sum to 1
        m = table.num_meas[a]
        np.testing.assert_allclose(table.Z[a, :m].sum(axis=1), 1.0)


def test_pair_cost_trapezoid(table, canonical_cfg):
    uav = canonical_cfg.uav
    d = table.pair_dist[0, 5]
    d_acc = min(0.5 * d, uav.max_v**2 / (2 * uav.max_a))
    expected = (d - 2 * d_acc) / uav.max_v + 2 * math.sqrt(2 * d_acc / uav.max_a)
    np.testing.assert_allclose(table.pair_cost[0, 5], expected)
    assert table.pair_cost[7, 7] == 0.0

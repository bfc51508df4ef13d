"""On-device ground-truth field generators (reference simulations/).

Each generator is a pure function ``(cfg, key) -> (y_dim, x_dim)`` field
in [0, 1], jittable and vmappable — thousands of fresh worlds per
self-play iteration are one fused kernel, no host round-trips.

  * Gaussian random field: spectral synthesis, amplitude k^(−r/2)
    (reference simulations/ground_truths.py:14-33 — literally an FFT,
    a perfect TPU fit).
  * Hotspot field: two non-overlapping rectangular high-value clusters
    (reference simulations/simulations.py:50-90), with the reference's
    rejection loop replaced by masked categorical sampling (static shapes).
  * Split field: high/low split along a random axis line in the middle
    third (reference simulations/simulations.py:93-123).
  * Temperature field: real RGBA image → temperature → area-downsampled
    grid (reference simulations/simulations.py:126-168), host-side load +
    exact fractional-area resize in numpy.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ipp_rl_tpu.config.schema import Config


def _min_max_normalize(x: jnp.ndarray) -> jnp.ndarray:
    lo, hi = jnp.min(x), jnp.max(x)
    return (x - lo) / (hi - lo)


def gaussian_random_field(cfg: Config, key: jax.Array) -> jnp.ndarray:
    """Spectral-synthesis GRF with power spectrum k^(−cluster_radius)."""
    ny, nx = cfg.environment.y_dim, cfg.environment.x_dim
    r = cfg.sensor.cluster_radius
    ky = jnp.fft.fftfreq(ny) * ny  # integer frequency indices, fft order
    kx = jnp.fft.fftfreq(nx) * nx
    kk = jnp.sqrt(ky[:, None] ** 2 + kx[None, :] ** 2)
    amplitude = jnp.where(kk == 0.0, 0.0, kk ** (-r / 2.0))
    # pin to complex64: TPU has no C128, and world-gen precision is irrelevant
    noise = jnp.fft.fft2(
        jax.random.normal(key, (ny, nx), jnp.float32).astype(jnp.complex64)
    )
    field = jnp.real(jnp.fft.ifft2(noise * amplitude.astype(jnp.complex64)))
    return _min_max_normalize(field)


def _masked_randint(key: jax.Array, valid: jnp.ndarray) -> jnp.ndarray:
    """Uniform sample over indices where ``valid`` is True (static shape)."""
    logits = jnp.where(valid, 0.0, -jnp.inf)
    return jax.random.categorical(key, logits)


def hotspot_random_field(cfg: Config, key: jax.Array) -> jnp.ndarray:
    """Two random rectangular high-value clusters on a low-value background."""
    ny, nx = cfg.environment.y_dim, cfg.environment.x_dim
    r = int(cfg.sensor.cluster_radius)
    k_hi, k_lo, k_y1, k_x1, k_y2, k_x2 = jax.random.split(key, 6)
    hi = jax.random.uniform(k_hi, (), minval=0.7, maxval=1.0)
    lo = jax.random.uniform(k_lo, (), minval=0.0, maxval=0.3)

    y1 = jax.random.randint(k_y1, (), r, ny)
    x1 = jax.random.randint(k_x1, (), r, nx)
    # second centre must differ by > r in BOTH coordinates
    # (reference simulations/simulations.py:72-88 rejection loop)
    ys = jnp.arange(ny)
    xs = jnp.arange(nx)
    y2 = _masked_randint(k_y2, (ys >= r) & (jnp.abs(ys - y1) > r))
    x2 = _masked_randint(k_x2, (xs >= r) & (jnp.abs(xs - x1) > r))

    rows = jnp.arange(ny)[:, None]
    cols = jnp.arange(nx)[None, :]

    def cluster(cy, cx):
        return (
            (rows >= cy - r) & (rows < cy + r) & (cols >= cx - r) & (cols < cx + r)
        )

    field = jnp.full((ny, nx), lo)
    in_cluster = cluster(y1, x1) | cluster(y2, x2)
    return jnp.where(in_cluster, hi, field)


def split_random_field(cfg: Config, key: jax.Array) -> jnp.ndarray:
    """Field split high/low along a random x or y line in the middle third."""
    ny, nx = cfg.environment.y_dim, cfg.environment.x_dim
    k_hi, k_lo, k_swap, k_axis, k_split = jax.random.split(key, 5)
    hi = jax.random.uniform(k_hi, (), minval=0.65, maxval=1.0)
    lo = jax.random.uniform(k_lo, (), minval=0.0, maxval=0.35)
    swap = jax.random.uniform(k_swap) > 0.5
    first = jnp.where(swap, lo, hi)
    second = jnp.where(swap, hi, lo)

    split_y = jax.random.randint(
        k_split, (), int(np.ceil(ny * 0.33)), int(np.ceil(ny * 0.66)) + 1
    )
    split_x = jax.random.randint(
        k_split, (), int(np.floor(nx * 0.33)), int(np.ceil(nx * 0.66)) + 1
    )
    rows = jnp.arange(ny)[:, None]
    cols = jnp.arange(nx)[None, :]
    by_y = jnp.where(rows < split_y, first, second) * jnp.ones((ny, nx))
    by_x = jnp.where(cols < split_x, first, second) * jnp.ones((ny, nx))
    return jnp.where(jax.random.uniform(k_axis) > 0.5, by_y, by_x)


def _area_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Exact fractional-area average resize (INTER_AREA semantics)."""
    in_h, in_w = img.shape

    def weights(n_in, n_out):
        w = np.zeros((n_out, n_in))
        scale = n_in / n_out
        for o in range(n_out):
            lo, hi = o * scale, (o + 1) * scale
            for i in range(int(np.floor(lo)), int(np.ceil(hi))):
                w[o, i] = min(hi, i + 1) - max(lo, i)
        return w / w.sum(axis=1, keepdims=True)

    return weights(in_h, out_h) @ img @ weights(in_w, out_w).T


def temperature_data_field(cfg: Config, datasets_dir: Optional[str] = None) -> np.ndarray:
    """Load an RGBA temperature image and map it to the grid (host-side)."""
    assert cfg.sensor.dataset_filename, "temperature_data_field needs dataset_filename"
    datasets_dir = datasets_dir or os.environ.get("DATASETS_DIR", ".")
    path = os.path.join(datasets_dir, cfg.sensor.dataset_filename)
    if not os.path.exists(path):
        raise FileNotFoundError(f"temperature dataset not found: {path}")
    try:
        from PIL import Image

        raw = np.asarray(Image.open(path)).astype(np.float64)
    except ImportError:  # pragma: no cover
        import imageio

        raw = np.asarray(imageio.imread(path)).astype(np.float64)
    temp = -1.0 * (raw[:, :, 0] - raw[:, :, 2])  # −(R − B) → temperature

    def norm(x):
        lo, hi = x.min(), x.max()
        return x / hi if lo == hi else (x - lo) / (hi - lo)

    resized = _area_resize(norm(temp), cfg.environment.y_dim, cfg.environment.x_dim)
    return norm(resized)


def generate_ground_truth(cfg: Config, key: jax.Array) -> jnp.ndarray:
    """Dispatch on the configured simulation type.  jit/vmap-safe for the
    three synthetic generators; the temperature field is a host constant."""
    sim = cfg.sensor.simulation_type
    if sim == "gaussian_random_field":
        return gaussian_random_field(cfg, key)
    if sim == "hotspot_random_field":
        return hotspot_random_field(cfg, key)
    if sim == "split_random_field":
        return split_random_field(cfg, key)
    if sim == "temperature_data_field":
        return jnp.asarray(temperature_data_field(cfg))
    raise ValueError(f"Unknown simulation type '{sim}'")

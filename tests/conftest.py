"""Test harness setup: CPU backend with 8 virtual devices.

Multi-device sharding tests run against a fake mesh (SURVEY.md §4d);
numerical parity tests use float64 (the reference is numpy float64).
Must run before jax initializes, hence env vars at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset a TPU backend
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin registers itself in sitecustomize and overrides
# JAX_PLATFORMS, so select the CPU backend explicitly post-registration.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

from ipp_rl_tpu.config.schema import Config, config_from_dict  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Reset jit/compilation caches between test modules.

    A single-process full-suite run accumulates ~150 XLA CPU
    compilations and then segfaults inside backend_compile_and_load
    (reproducible at the same test twice on this box with 120 GB free —
    compiler state, not memory; every test passes in isolation).
    Clearing the caches at module boundaries bounds the accumulated
    state; if the crash still appears, run the suite as two pytest
    invocations (see CLAUDE.md)."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def canonical_cfg() -> Config:
    """The reference canonical workload (10x10 grid, 2 altitude levels)."""
    import pathlib

    path = pathlib.Path(__file__).resolve().parents[1] / "ipp_rl_tpu/config/example.yaml"
    from ipp_rl_tpu.config.schema import load_config

    return load_config(str(path))


@pytest.fixture(scope="session")
def small_cfg() -> Config:
    """A 6x6 grid config for fast end-to-end tests."""
    return config_from_dict(
        {
            "environment": {"x_dim": 6, "y_dim": 6, "resolution": 4},
            "sensor": {
                "type": "rgb_camera",
                "field_of_view": {"angle_x": 60, "angle_y": 60},
                "model": {"type": "altitude_dependent", "coeff_a": 0.05, "coeff_b": 0.2},
                "simulation": {"type": "gaussian_random_field", "cluster_radius": 5},
            },
            "mapping": {
                "fit_gaussian_process": True,
                "signal_variance": 1.82,
                "length_scale": 3.67,
                "noise_variance": 1.42,
                "nu": 1.5,
            },
            "experiment": {
                "title": "small",
                "constraints": {
                    "dist_to_boundaries": 3,
                    "min_altitude": 8,
                    "max_altitude": 14,
                    "altitude_spacing": 6,
                    "budget": 60,
                },
                "scenario": {"adaptive": True, "value_threshold": 0.4, "interval_factor": 0},
                "uav": {"max_v": 2, "max_a": 2, "sampling_time": 2},
                "missions": [{"type": "greedy"}],
                "evaluation": {"repetitions": 2},
            },
        }
    )

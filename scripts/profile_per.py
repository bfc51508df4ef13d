"""Fused-PER vs fused-uniform training-path timing.

The reference's PER (reference planning/mcts_zero/replay_buffers.py:
104-141) must be trainable at speed: the round-2 host-loop PER paid
~0.5 s/batch of host↔device round trips (46× the fused uniform path).
This script times the two fused epoch runners on identical synthetic
replay windows — same network, same batch rows per step — and prints
one JSON line with the ratio (acceptance: PER within ~2× of uniform).

Usage: python scripts/profile_per.py [--channels 64] [--steps 32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--steps", type=int, default=32, help="scan steps per call")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--episode-steps", type=int, default=24)
    ap.add_argument("--slots", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument(
        "--canonical", action="store_true",
        help="canonical shape: 128 channels, 10 blocks, batch 96 "
        "(reference config/example.yaml:82,95-96) — the shape the "
        "PER<=2x-of-uniform acceptance bound was set for",
    )
    args = ap.parse_args()
    if args.canonical:
        args.channels, args.blocks, args.batch_size = 128, 10, 96

    import dataclasses

    from ipp_rl_tpu import load_config
    from ipp_rl_tpu.env.world import IPPWorld
    from ipp_rl_tpu.planners.zero.replay import (
        DeviceWindow,
        PrioritizedReplayBuffer,
        ReplayBuffer,
    )
    from ipp_rl_tpu.planners.zero.train import init_train_state, make_train_step

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "../ipp_rl_tpu/config/example.yaml")
    )
    hp = dataclasses.replace(
        cfg.missions[0].hyper_params,
        num_channels=args.channels,
        num_encoder_res_blocks=args.blocks,
        num_global_pooling_channels=min(32, args.channels // 2),
        batch_size=args.batch_size,
        num_augmented_samples=1,
        use_per=True,
    )
    world = IPPWorld(cfg)
    net, state0 = init_train_state(cfg, hp, jax.random.key(0))
    train_step = make_train_step(net, hp)

    K, E, T = args.slots, args.envs, args.episode_steps
    n = cfg.environment.num_cells
    A = cfg.num_actions
    rng = np.random.default_rng(0)
    win = DeviceWindow(
        cov=jnp.asarray(rng.uniform(0.1, 1.0, (K, E, T, n, n)), jnp.float32),
        mean=jnp.asarray(rng.uniform(0, 1, (K, E, T, n)), jnp.float32),
        prev_pos=jnp.asarray(rng.uniform(0, 40, (K, E, T, 3)), jnp.float32),
        budget=jnp.asarray(rng.uniform(10, 200, (K, E, T)), jnp.float32),
        policy=jnp.full((K, E, T, A), 1.0 / A, jnp.float32),
        valid_mask=jnp.ones((K, E, T, A), jnp.float32),
        reward=jnp.asarray(rng.uniform(0, 1, (K, E, T)), jnp.float32),
        value=jnp.asarray(rng.uniform(0, 1, (K, E, T)), jnp.float32),
    )
    valid = jnp.ones((K, E, T), bool)
    S = args.steps
    draw = max(1, hp.batch_size // (hp.num_augmented_samples + 1))

    uni = ReplayBuffer(world, hp, window_size=K)
    per = PrioritizedReplayBuffer(world, hp, window_size=K)
    uni_run = uni.make_epoch_runner(train_step)
    per_run = per.make_per_epoch_runner(train_step, draw)

    lrs = jnp.full((S,), 1e-3, jnp.float32)
    betas = jnp.full((S,), 0.5, jnp.float32)
    rows = jnp.asarray(
        rng.integers(0, [K, E, T], size=(S, draw, 3)), jnp.int32
    )

    def time_call(fn, *a, second_donated=False):
        # both runners donate arg 0 (state); PER also donates arg 1
        # (priorities) — fresh copies per call keep the donees alive
        def call():
            st = jax.tree_util.tree_map(jnp.copy, state0)
            if second_donated:
                return fn(st, jnp.copy(a[0]), *a[1:])
            return fn(st, *a)

        out = call()
        jax.block_until_ready(out[0])
        times = []
        for r in range(args.repeats):
            t0 = time.perf_counter()
            out = call()
            jax.block_until_ready(out[0])
            times.append(time.perf_counter() - t0)
        return min(times)

    t_uni = time_call(uni_run, win, rows, lrs, jax.random.key(1))
    t_per = time_call(
        per_run,
        per.init_device_priorities(valid),
        win,
        valid,
        lrs,
        betas,
        jax.random.key(2),
        second_donated=True,
    )
    print(
        json.dumps(
            {
                "metric": "fused_per_vs_uniform",
                "value": round(t_per / t_uni, 3),
                "unit": "x (per/uniform, lower is better)",
                "detail": {
                    "uniform_s_per_step": round(t_uni / S, 5),
                    "per_s_per_step": round(t_per / S, 5),
                    "steps": S,
                    "batch": hp.batch_size,
                    "channels": args.channels,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

"""Component-level timing of the greedy replan step (TPU).

Times, each as a jitted K-step scan at batch B (mirroring bench.py):
  sweep   — sweep_rewards only (all-action pricing)
  plan    — full planner.plan (sweep + feasibility + argmax)
  commit  — world.step_index only (measure + KF commit + metrics)
  full    — plan + commit (the bench step)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_step.py [--batch 4096]
"""

import argparse
import time

import jax
import jax.numpy as jnp


def timeit(fn, state, key, repeats=3):
    out = jax.block_until_ready(fn(state, key))
    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(state, key))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import os

    from ipp_rl_tpu import load_config
    from ipp_rl_tpu.config.schema import MissionConfig
    from ipp_rl_tpu.env.world import IPPWorld
    from ipp_rl_tpu.planners import GreedyPlanner
    from ipp_rl_tpu.planners.base import sweep_rewards

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "../ipp_rl_tpu/config/example.yaml")
    )
    world = IPPWorld(cfg, fast_sweeps=True)
    planner = GreedyPlanner(world, MissionConfig(type="greedy"))
    B, K = args.batch, args.steps

    def scan_of(body):
        def block(state, key):
            def step(st, k):
                return body(st, k), None

            state, _ = jax.lax.scan(step, state, jax.random.split(key, K))
            return state

        return jax.jit(block)

    def sweep_body(st, k):
        r, c = sweep_rewards(world, st)
        # feed the result back into cov (which sweep_rewards READS) so
        # the sweep is genuinely loop-carried — a budget-only carry lets
        # XLA hoist the whole cov-dependent sweep out of the scan and
        # report up-to-K-times-too-fast step times (profile_sweep.py's
        # bench() mutates P for the same reason)
        eps = jnp.asarray(1e-20, st.cov.dtype)
        bump = (r.sum(-1) + c.sum(-1)).astype(st.cov.dtype)
        return st.replace(cov=st.cov + eps * bump[:, None, None])

    def plan_body(st, k):
        a = planner.plan(st, k, jnp.int32(0))
        eps = jnp.asarray(1e-20, st.cov.dtype)
        return st.replace(cov=st.cov + eps * a.astype(st.cov.dtype)[:, None, None])

    def commit_body(st, k):
        a = jax.random.randint(k, (B,), 0, world.num_actions)
        return world.step_index(st, a, k)

    def full_body(st, k):
        k1, k2 = jax.random.split(k)
        a = planner.plan(st, k1, jnp.int32(0))
        return world.step_index(st, a, k2)

    state0 = world.init_state(jax.random.key(0), B)
    key = jax.random.key(1)
    for name, body in [
        ("sweep", sweep_body),
        ("plan", plan_body),
        ("commit", commit_body),
        ("full", full_body),
    ]:
        t = timeit(scan_of(body), state0, key)
        print(f"{name:8s} {t / K * 1e3:8.2f} ms/step  ({B} missions)")


if __name__ == "__main__":
    main()

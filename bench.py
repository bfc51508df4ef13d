"""Headline benchmark: batched greedy replan throughput on one chip.

Each replan step = full all-action Kalman sweep (200 candidate
covariance updates per mission) + argmax + measurement synthesis +
mean/cov commit + metric eval — the reference's per-step work
(reference planning/greedy_mission.py:73-110 with Pool(4) over the
action set), here for thousands of missions in one fused program.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star target of
4096 missions replanned in <=10 ms on a v4-16 (8 chips) == 51200
replans/s/chip; >1.0 beats the target.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument(
        "--mode",
        choices=("greedy", "rollouts", "zero"),
        default="greedy",
        help="greedy: full replan steps (headline); rollouts: all-action "
        "KF rollout pricing throughput; zero: neural PUCT search replans",
    )
    args = ap.parse_args()
    if args.mode == "zero":
        return bench_zero(args)

    from ipp_rl_tpu import load_config
    from ipp_rl_tpu.config.schema import MissionConfig
    from ipp_rl_tpu.env.world import IPPWorld
    from ipp_rl_tpu.planners import GreedyPlanner
    import os

    cfg_path = os.path.join(os.path.dirname(__file__), "ipp_rl_tpu/config/example.yaml")
    cfg = load_config(cfg_path)
    # bf16-streamed sweeps: argmax decisions agree with f32 (tested in
    # tests/test_kalman.py::test_fast_math_decision_agreement); commits f32
    world = IPPWorld(cfg, fast_sweeps=True)
    planner = GreedyPlanner(world, MissionConfig(type="greedy"))

    B, K = args.batch, args.steps

    def replan_block(state, key):
        """K replan steps (plan + measure + commit), fully on device."""

        def step(carry, k):
            st = carry
            k_plan, k_meas = jax.random.split(k)
            action = planner.plan(st, k_plan, jnp.int32(0))
            st = world.step_index(st, action, k_meas)
            return st, None

        keys = jax.random.split(key, K)
        state, _ = jax.lax.scan(step, state, keys)
        return state

    block = jax.jit(replan_block, donate_argnums=(0,))

    state = world.init_state(jax.random.key(0), B)
    state = block(state, jax.random.key(1))  # compile + warmup
    jax.block_until_ready(state)

    times = []
    for r in range(args.repeats):
        t0 = time.perf_counter()
        state = block(state, jax.random.key(2 + r))
        jax.block_until_ready(state)
        times.append(time.perf_counter() - t0)

    best = min(times)
    replans_per_s = B * K / best
    ms_per_step = best / K * 1e3

    # north star: 4096 missions / 10 ms on 8 chips -> 51200 replans/s/chip
    target = 4096 / 0.010 / 8.0
    if args.mode == "rollouts":
        # every replan prices all A candidate actions = A KF rollouts
        A = world.num_actions
        print(
            json.dumps(
                {
                    "metric": "batched_kf_rollouts_per_s",
                    "value": round(replans_per_s * A, 1),
                    "unit": "rollouts/s",
                    "vs_baseline": round(replans_per_s / target, 3),
                    "detail": {
                        "batch": B,
                        "actions": A,
                        "ms_per_replan_step": round(ms_per_step, 3),
                        "device": str(jax.devices()[0]),
                    },
                }
            )
        )
        return
    print(
        json.dumps(
            {
                "metric": "greedy_replans_per_s_per_chip",
                "value": round(replans_per_s, 1),
                "unit": "replans/s",
                "vs_baseline": round(replans_per_s / target, 3),
                "detail": {
                    "batch": B,
                    "steps_per_block": K,
                    "ms_per_replan_step": round(ms_per_step, 3),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


def bench_zero(args):
    """Neural PUCT search throughput: one replan = num_mcts_simulations
    batched simulations with inlined network inference."""
    import os

    import jax
    import jax.numpy as jnp

    from ipp_rl_tpu import load_config
    from ipp_rl_tpu.config.schema import MCTSZeroHyperParams
    from ipp_rl_tpu.env.world import IPPWorld
    from ipp_rl_tpu.planners.zero.features import init_history
    from ipp_rl_tpu.planners.zero.mcts import ZeroMCTS
    from ipp_rl_tpu.planners.zero.train import init_train_state, predict_fn

    cfg_path = os.path.join(os.path.dirname(__file__), "ipp_rl_tpu/config/example.yaml")
    cfg = load_config(cfg_path)
    world = IPPWorld(cfg, fast_sweeps=True)
    hp = cfg.missions[0].hyper_params
    B = min(args.batch, 256)  # search trees are memory-heavy
    net, state = init_train_state(cfg, hp, jax.random.key(0))
    mcts = ZeroMCTS(world, hp, cfg.missions[0].episode_horizon, predict_fn(net))

    st = world.init_state(jax.random.key(1), B)
    hist = jax.vmap(lambda _: init_history(cfg, hp, world.dtype))(jnp.arange(B))

    @jax.jit
    def replan(variables, key):
        tree, _ = mcts.search(
            st.cov, st.mean, st.pos, st.budget, hist, key, net_variables=variables
        )
        return tree.Nsa[:, 0]

    variables = state.variables()
    out = jax.block_until_ready(replan(variables, jax.random.key(2)))
    times = []
    for r in range(args.repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(replan(variables, jax.random.key(3 + r)))
        times.append(time.perf_counter() - t0)
    best = min(times)
    target = 4096 / 0.010 / 8.0
    print(
        json.dumps(
            {
                "metric": "zero_search_replans_per_s_per_chip",
                "value": round(B / best, 1),
                "unit": "replans/s",
                "vs_baseline": round(B / best / target, 4),
                "detail": {
                    "batch": B,
                    "num_simulations": hp.num_mcts_simulations,
                    "ms_per_replan": round(best * 1e3, 1),
                    "network_channels": hp.num_channels,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())

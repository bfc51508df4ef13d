"""Round-4 flagship probes (TPU).

A) Deploy floor: does an UNTRAINED 100-sim search beat random at deploy?
   (At 32 sims the untrained search measured ~44 vs random's 40.2 —
   worse than random; runs/zero_canon_r3_diag/eval.json.)
B) Timing: one canonical-recipe self-play iteration (100 sims, 40-step
   episodes) to size the round-4 training run.

Usage: python scripts/probe_r4.py [--skip-a] [--skip-b] [--envs E]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from ipp_rl_tpu import load_config
from ipp_rl_tpu.config.schema import MCTSZeroHyperParams, MissionConfig
from ipp_rl_tpu.env.world import IPPWorld
from ipp_rl_tpu.planners import RandomDiscretePlanner
from ipp_rl_tpu.planners.zero.mission import ZeroPlanner
from ipp_rl_tpu.planners.zero.train import init_train_state, predict_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-a", action="store_true")
    ap.add_argument("--skip-b", action="store_true")
    ap.add_argument("--envs", type=int, default=192)
    ap.add_argument("--sims", type=int, default=100)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--eval-batch", type=int, default=32)
    ap.add_argument("--eval-steps", type=int, default=25)
    args = ap.parse_args()

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "../ipp_rl_tpu/config/example.yaml")
    )
    hp = MCTSZeroHyperParams(
        num_mcts_simulations=args.sims,
        max_episode_steps=args.steps,
        num_channels=args.channels,
        num_encoder_res_blocks=args.blocks,
        num_global_pooling_channels=min(32, args.channels // 2),
        batch_size=96,
        num_epochs=3,
        temperature_threshold=args.steps,
        shuffle_prior_cov=True,
    )
    world = IPPWorld(cfg, fast_sweeps=True)
    out = {}

    if not args.skip_a:
        B = args.eval_batch
        key = jax.random.key(12345)
        init_state = world.init_state(key, B)
        _, state0 = init_train_state(cfg, hp, jax.random.key(999))

        # end-of-training exploration constants, as deploy would see them
        deploy_hp = dataclasses.replace(
            hp, puct_init=4.0, dirichlet_alpha=0.3
        )
        deploy_mc = MissionConfig(
            type="mcts_zero", episode_horizon=5, hyper_params=deploy_hp
        )
        for name, planner in [
            (
                f"untrained_{args.sims}sims",
                ZeroPlanner(world, deploy_mc, predict_fn(None), None),
            ),
            ("random", RandomDiscretePlanner(world, MissionConfig(type="random_discrete"))),
        ]:
            if name.startswith("untrained"):
                net, _ = init_train_state(cfg, hp, jax.random.key(999))
                planner = ZeroPlanner(
                    world, deploy_mc, predict_fn(net), state0.variables()
                )
            t0 = time.time()
            res = planner.run(
                jax.random.key(7), B, max_steps=args.eval_steps,
                init_state=init_state,
            )
            out[name] = {
                "final_uncertainty": float(res.metrics["uncertainty"][:, -1].mean()),
                "final_rmse": float(res.metrics["rmse"][:, -1].mean()),
                "wall_s": round(time.time() - t0, 1),
            }
            print(name, out[name], flush=True)

    if not args.skip_b:
        from ipp_rl_tpu.planners.zero.mcts import ZeroMCTS
        from ipp_rl_tpu.planners.zero.selfplay import SelfPlay

        net, st = init_train_state(cfg, hp, jax.random.key(0))
        pred = predict_fn(net)
        mcts = ZeroMCTS(world, hp, 5, pred)
        sp = SelfPlay(world, hp, 5, mcts)
        run = jax.jit(sp.run, static_argnames=("num_envs", "num_simulations"))
        t0 = time.time()
        traj, ev = run(
            jax.random.key(1), args.envs, net_variables=st.variables(),
            puct_init=15.0, dirichlet_alpha=1.0,
        )
        jax.block_until_ready(ev)
        compile_and_run = time.time() - t0
        t0 = time.time()
        traj, ev = run(
            jax.random.key(2), args.envs, net_variables=st.variables(),
            puct_init=15.0, dirichlet_alpha=1.0,
        )
        jax.block_until_ready(ev)
        steady = time.time() - t0
        out["selfplay_iter"] = {
            "compile_plus_first_s": round(compile_and_run, 1),
            "steady_s": round(steady, 1),
            "envs": args.envs,
            "sims": args.sims,
            "steps": args.steps,
            "num_samples": int(np.asarray(traj.sample_ok).sum()),
            "mean_episode_value": float(np.asarray(ev).mean()),
        }
        print("selfplay:", out["selfplay_iter"], flush=True)

    os.makedirs("runs/probe_r4", exist_ok=True)
    with open("runs/probe_r4/probe.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()

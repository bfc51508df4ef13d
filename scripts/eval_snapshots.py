"""Deploy-eval a set of training snapshots to pick the best checkpoint.

Self-play learning is not monotonic; the deployment checkpoint should be
the best snapshot by held-out deploy quality, not the last one.  Runs
the same held-out eval as scripts/train_zero.py (B missions, fixed seed)
for each requested snapshot plus greedy/random anchors.

Usage:
  python scripts/eval_snapshots.py --run runs/zero_canon_r4 \
      --snapshots 9,19,29,39 --channels 128 --blocks 10 [--unfloored-value-head]
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
from ipp_rl_tpu.planners import GreedyPlanner, RandomDiscretePlanner
from ipp_rl_tpu.planners.zero.learn import load_checkpoint
from ipp_rl_tpu.planners.zero.mission import ZeroPlanner
from ipp_rl_tpu.planners.zero.train import init_train_state, predict_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--snapshots", default="9,19,29,39")
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--blocks", type=int, default=10)
    ap.add_argument("--sims", type=int, default=100)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--eval-steps", type=int, default=25)
    ap.add_argument("--puct-init", type=float, default=4.0)
    ap.add_argument("--deploy-mode", default="reference")
    ap.add_argument(
        "--world-seed", type=int, default=12345,
        help="held-out world batch seed; use a DIFFERENT seed for the "
        "final report than for snapshot selection (validation/test split)",
    )
    ap.add_argument("--unfloored-value-head", action="store_true")
    args = ap.parse_args()

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "../ipp_rl_tpu/config/example.yaml")
    )
    world = IPPWorld(cfg, fast_sweeps=True)
    B = args.batch
    init_state = world.init_state(jax.random.key(args.world_seed), B)

    hp = MCTSZeroHyperParams(
        num_mcts_simulations=args.sims,
        num_channels=args.channels,
        num_encoder_res_blocks=args.blocks,
        num_global_pooling_channels=min(32, args.channels // 2),
        max_valid_action_distance=11.5,
        puct_init=args.puct_init,
        dirichlet_alpha=0.3,
        unfloored_value_head=args.unfloored_value_head,
    )
    net, state0 = init_train_state(cfg, hp, jax.random.key(0))
    pred = predict_fn(net)
    mc = MissionConfig(type="mcts_zero", episode_horizon=5, hyper_params=hp)

    out = {}

    def evaluate(name, planner):
        t0 = time.time()
        res = planner.run(
            jax.random.key(7), B, max_steps=args.eval_steps, init_state=init_state
        )
        out[name] = {
            "final_uncertainty": round(float(res.metrics["uncertainty"][:, -1].mean()), 3),
            "final_rmse": round(float(res.metrics["rmse"][:, -1].mean()), 4),
            "wall_s": round(time.time() - t0, 1),
        }
        print(name, out[name], flush=True)

    for snap in args.snapshots.split(","):
        name = (
            "shared_net.trained_model.ckpt"
            if snap == "deploy"
            else f"shared_net.snapshot_{snap}"
        )
        path = os.path.join(args.run, "checkpoints", name)
        if not os.path.exists(path):
            print("missing", path)
            continue
        st = load_checkpoint(path, state0)
        evaluate(
            f"snapshot_{snap}",
            ZeroPlanner(world, mc, pred, st.variables(), deploy_mode=args.deploy_mode),
        )

    evaluate("greedy", GreedyPlanner(world, MissionConfig(type="greedy")))
    evaluate("random", RandomDiscretePlanner(world, MissionConfig(type="random_discrete")))

    suffix = "" if args.world_seed == 12345 else f"_s{args.world_seed}"
    with open(os.path.join(args.run, f"snapshot_eval_{args.deploy_mode}{suffix}.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()

"""Quality-vs-runtime deployment curve (the reference paper's pitch:
on-par solution quality at a fraction of the runtime — reference
README.md:15-16, arXiv 2109.13570 Fig. 4/5).

Runs OUR deployment planners on matched held-out worlds at the
canonical budget-200 adaptive workload and records, per planner:
final masked tr(P), final RMSE, and ms per replan decision (wall time /
steps, per mission at the given batch).  The zero planner sweeps
simulation counts {0 (raw policy), 16, 32, 100}.

Usage:
  python scripts/quality_vs_runtime.py --ckpt runs/zero_canon_r4/checkpoints/shared_net.trained_model.ckpt \
      --channels 64 --blocks 6 --batch 32 --out runs/quality_vs_runtime
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
from ipp_rl_tpu.planners import (
    ClassicMCTSPlanner,
    CMAESPlanner,
    GreedyPlanner,
    RandomDiscretePlanner,
)
from ipp_rl_tpu.planners.zero.learn import load_checkpoint
from ipp_rl_tpu.planners.zero.mission import ZeroPlanner
from ipp_rl_tpu.planners.zero.train import init_train_state, predict_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--max-steps", type=int, default=45)
    ap.add_argument("--zero-sims", default="0,16,32,100,32c,100c",
        help="comma list; trailing 'c' = clean deploy mode (no forced playouts / root noise)")
    ap.add_argument("--puct-init", type=float, default=4.0)
    ap.add_argument("--unfloored-value-head", action="store_true")
    ap.add_argument("--dirichlet-alpha", type=float, default=0.3)
    ap.add_argument("--out", default="runs/quality_vs_runtime")
    args = ap.parse_args()

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "../ipp_rl_tpu/config/example.yaml")
    )
    world = IPPWorld(cfg, fast_sweeps=True)
    B = args.batch
    init_state = world.init_state(jax.random.key(12345), B)

    hp = MCTSZeroHyperParams(
        num_channels=args.channels,
        num_encoder_res_blocks=args.blocks,
        num_global_pooling_channels=min(32, args.channels // 2),
        max_valid_action_distance=11.5,
        puct_init=args.puct_init,
        dirichlet_alpha=args.dirichlet_alpha,
        unfloored_value_head=args.unfloored_value_head,
    )
    net, state = init_train_state(cfg, hp, jax.random.key(0))
    state = load_checkpoint(args.ckpt, state)
    pred = predict_fn(net)

    rows = []

    def run(name, planner):
        # Warm-up run first: the canonical mission scan compiles in
        # 10-20 min on the remote compiler, so a single timed run would
        # report compile time as replan cost (ADVICE r4).  Quality and
        # timing both come from the second (warm) run.
        planner.run(
            jax.random.key(6), B, max_steps=args.max_steps, init_state=init_state
        )
        t0 = time.time()
        res = planner.run(
            jax.random.key(7), B, max_steps=args.max_steps, init_state=init_state
        )
        wall = time.time() - t0
        steps = float(np.maximum(res.num_steps.mean(), 1.0))
        row = {
            "planner": name,
            "final_uncertainty": round(float(res.metrics["uncertainty"][:, -1].mean()), 3),
            "final_rmse": round(float(res.metrics["rmse"][:, -1].mean()), 4),
            "mean_steps": round(steps, 1),
            "ms_per_replan": round(wall / steps / B * 1e3, 3),
            "wall_s": round(wall, 1),
            "batch": B,
        }
        rows.append(row)
        print(row, flush=True)

    for spec in args.zero_sims.split(","):
        clean = spec.endswith("c")
        sims = int(spec[:-1] if clean else spec)
        zhp = dataclasses.replace(hp, num_mcts_simulations=sims)
        mc = MissionConfig(type="mcts_zero", episode_horizon=5, hyper_params=zhp)
        run(
            f"zero_{sims}sims" + ("_clean" if clean else ""),
            ZeroPlanner(
                world, mc, pred, state.variables(),
                deploy_mode="clean" if clean else "reference",
            ),
        )

    run("greedy", GreedyPlanner(world, MissionConfig(type="greedy")))
    run(
        "mcts_classic",
        ClassicMCTSPlanner(
            world,
            MissionConfig(
                type="mcts", num_simulations=32, episode_horizon=5,
                horizontal_spacing=14.0,
            ),
        ),
    )
    run(
        "cmaes",
        CMAESPlanner(
            world,
            MissionConfig(
                type="cmaes", episode_horizon=5, cma_popsize=12, cma_maxiter=20,
                cma_sigma=2.0,
            ),
        ),
    )
    run("random", RandomDiscretePlanner(world, MissionConfig(type="random_discrete")))

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "curve.json"), "w") as f:
        json.dump({"config": vars(args), "rows": rows}, f, indent=2)
    with open(os.path.join(args.out, "curve.md"), "w") as f:
        f.write(
            "# Quality vs runtime — deployment planners, budget 200 adaptive\n\n"
            f"Matched held-out worlds, B={B} missions, canonical 10x10 workload. "
            "ms/replan is per mission at this batch (batched deployment).\n\n"
            "| planner | final masked tr(P) | final RMSE | ms/replan |\n"
            "|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| {r['planner']} | {r['final_uncertainty']} | "
                f"{r['final_rmse']} | {r['ms_per_replan']} |\n"
            )
    print("wrote", args.out)


if __name__ == "__main__":
    main()

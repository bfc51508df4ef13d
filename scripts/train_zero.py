"""Train a (reduced-scale) MCTS-zero agent on the canonical 10x10 world
and evaluate it against greedy / random baselines on held-out worlds.

Usage: python scripts/train_zero.py [--iterations N] [--envs E] [--sims S]

Produces checkpoints/ + logs/train_metrics.jsonl + a final comparison
table (deploy-time search vs baselines at matched budget).
"""

import argparse
import json
import logging
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
from ipp_rl_tpu.planners.zero.learn import ZeroLearner
from ipp_rl_tpu.planners.zero.mission import ZeroPlanner
from ipp_rl_tpu.utils import setup_logger

logger = logging.getLogger("train_zero")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=30)
    ap.add_argument("--envs", type=int, default=192)
    # canonical self-play scale (reference config/example.yaml:60-64):
    # 100 simulations, 40-step episodes.  The r3 failure analysis
    # (runs/zero_canon_r3_diag) traced the near-random retrain to the
    # REDUCED recipe (32 sims / 24 steps / 48-batch training cap), so
    # the defaults now follow the reference recipe.
    ap.add_argument("--sims", type=int, default=100)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--max-episode-steps", type=int, default=40)
    ap.add_argument(
        "--train-batches", type=int, default=0,
        help="cap on minibatches per epoch (0 = full window sweep, the "
        "reference semantics — wrappers :121-171)",
    )
    ap.add_argument("--batch-size", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--eval-batch", type=int, default=32)
    ap.add_argument("--out", default="runs/zero_small")
    ap.add_argument(
        "--puct-init", type=float, default=15.0,
        help="lower (e.g. 4) concentrates search targets at low sim counts",
    )
    ap.add_argument("--eval-steps", type=int, default=25)
    ap.add_argument(
        "--temperature-threshold", type=int, default=0,
        help="steps before the visit-policy temperature drops to 0 "
        "(0 = max-episode-steps, the reference semantics: its canonical "
        "threshold 40 >= its 40-step episodes, so self-play NEVER trains "
        "on one-hot targets — reference config/example.yaml:63-64)",
    )
    ap.add_argument(
        "--deploy-eval-every", type=int, default=0,
        help="run a held-out deploy eval every k iterations and keep "
        "the best snapshot at shared_net.best (deploy quality peaks "
        "mid-training; 0 = off)",
    )
    ap.add_argument(
        "--deploy-gate", type=float, default=0.0,
        help="with --deploy-eval-every: roll the network back to the "
        "best snapshot whenever the current deploy eval exceeds this "
        "factor times the best (e.g. 1.1). Fixes the late-training "
        "collapse at the source instead of only selecting around it.",
    )
    ap.add_argument(
        "--train-noise-scale", type=float, default=1.0,
        help="multiply the SELF-PLAY world's injected measurement-noise "
        "std by this factor (domain randomization; the filter's assumed "
        "R and the eval/deploy world stay exact). Motivation: the r2 "
        "checkpoint accidentally trained with ~4.6x the reference "
        "injection (pre-PARITY-14 bug) and deploys at 13.2/6.81 masked "
        "tr(P) in the corrected world, while every corrected-world "
        "retrain stalls near-random — inflated masks during self-play "
        "densify the late-episode reward signal.",
    )
    ap.add_argument(
        "--unfloored-value-head", action="store_true",
        help="drop the SiLU between the value head's Dense and Softplus: "
        "the reference composition floors the output at 0.5636, above "
        "55%% of canonical self-play value targets (every late-episode "
        "state) — see schema.unfloored_value_head",
    )
    ap.add_argument(
        "--policy-smoothing", type=float, default=0.0,
        help="blend the stored policy TARGET with uniform-over-valid "
        "(pi <- (1-eps) pi + eps u); sampling unchanged. Counteracts "
        "pi-target entropy collapse (schema.policy_target_smoothing)",
    )
    ap.add_argument(
        "--eval-untrained", action="store_true",
        help="also evaluate the search with freshly initialized weights "
        "(control: separates what search contributes from what training adds)",
    )
    args = ap.parse_args()

    setup_logger(os.path.join(args.out, "logs"))
    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "../ipp_rl_tpu/config/example.yaml")
    )
    hp = MCTSZeroHyperParams(
        num_mcts_simulations=args.sims,
        max_episode_steps=args.max_episode_steps,
        num_self_play_iterations=args.iterations,
        num_channels=args.channels,
        num_encoder_res_blocks=args.blocks,
        num_global_pooling_channels=min(32, args.channels // 2),
        batch_size=args.batch_size,
        num_epochs=args.epochs,
        temperature_threshold=args.temperature_threshold or args.max_episode_steps,
        shuffle_prior_cov=True,
        continuous_network_update=True,
        puct_init=args.puct_init,
        puct_init_min=min(4.0, args.puct_init),
        max_valid_action_distance=11.5,
        unfloored_value_head=args.unfloored_value_head,
        policy_target_smoothing=args.policy_smoothing,
    )
    mc = MissionConfig(type="mcts_zero", episode_horizon=5, hyper_params=hp)
    world = IPPWorld(cfg, fast_sweeps=True)
    # self-play world with inflated injected noise (the filter's assumed
    # R is untouched); evaluation below always uses the exact world
    world_train = world
    if args.train_noise_scale != 1.0:
        world_train = IPPWorld(cfg, fast_sweeps=True)
        world_train.noise_std = world_train.noise_std * args.train_noise_scale

    learner = ZeroLearner(
        world_train,
        mc,
        checkpoints_dir=os.path.join(args.out, "checkpoints"),
        log_dir=os.path.join(args.out, "logs"),
        num_envs=args.envs,
        deploy_eval_every=args.deploy_eval_every,
        deploy_eval_world=world,
        deploy_gate=args.deploy_gate,
    )
    t0 = time.time()
    learner.learn(
        num_iterations=args.iterations,
        num_train_batches=args.train_batches or None,
    )
    logger.info("training done in %.1f min", (time.time() - t0) / 60)

    if args.deploy_eval_every and os.path.exists(learner.best_path()):
        # evaluate (and deploy) the BEST snapshot by held-out deploy
        # eval, not the last iteration (deploy quality peaks mid-run)
        from ipp_rl_tpu.planners.zero.learn import load_checkpoint

        learner.state = load_checkpoint(learner.best_path(), learner.state)
        logger.info(
            "evaluating best snapshot (iter %d, deploy eval %.2f)",
            learner.best_iteration, learner.best_deploy_eval,
        )

    # -------- evaluation on held-out worlds at matched budget ----------
    # deploy with the trained weights AND the end-of-training exploration
    # constants (the reference's execute() after learn() sees the decayed
    # hyper_params dict, reference mcts_zero_mission.py:231-243,533)
    B = args.eval_batch
    key = jax.random.key(12345)
    init_state = world.init_state(key, B)

    import dataclasses

    deploy_hp = dataclasses.replace(hp, puct_init=learner.puct_init)
    deploy_mc = MissionConfig(
        type="mcts_zero", episode_horizon=5, hyper_params=deploy_hp
    )
    results = {}
    planners = [
        (
            "mcts_zero",
            ZeroPlanner(world, deploy_mc, learner.predict, learner.state.variables()),
        ),
        ("greedy", GreedyPlanner(world, MissionConfig(type="greedy"))),
        ("random", RandomDiscretePlanner(world, MissionConfig(type="random_discrete"))),
    ]
    if args.eval_untrained:
        from ipp_rl_tpu.planners.zero.train import init_train_state

        _, state0 = init_train_state(cfg, hp, jax.random.key(999))
        planners.append(
            (
                "mcts_zero_untrained",
                ZeroPlanner(world, deploy_mc, learner.predict, state0.variables()),
            )
        )
    for name, planner in planners:
        t0 = time.time()
        res = planner.run(
            jax.random.key(7), B, max_steps=args.eval_steps, init_state=init_state
        )
        results[name] = {
            "final_uncertainty": float(res.metrics["uncertainty"][:, -1].mean()),
            "final_rmse": float(res.metrics["rmse"][:, -1].mean()),
            "mean_steps": float(res.num_steps.mean()),
            "wall_s": round(time.time() - t0, 1),
            "uncertainty_curve": [
                round(float(u), 3) for u in res.metrics["uncertainty"].mean(axis=0)
            ],
            "rmse_curve": [
                round(float(u), 4) for u in res.metrics["rmse"].mean(axis=0)
            ],
        }
        logger.info("%s: %s", name, {k: v for k, v in results[name].items()
                                     if not k.endswith("_curve")})

    with open(os.path.join(args.out, "eval.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v["final_uncertainty"] for k, v in results.items()}))


if __name__ == "__main__":
    main()

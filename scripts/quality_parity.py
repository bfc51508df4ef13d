"""Solution-quality parity harness: REFERENCE planners vs ipp_rl_tpu.

Drives the ACTUAL reference mission classes (CPU numpy/torch-free paths:
planning/mcts_mission.py MCTSMission, planning/ipp_masha.py
IPPMashaMission, plus a greedy sanity anchor) and this repo's planners
on MATCHED worlds — identical ground-truth maps (generated with the
reference's own simulations/ground_truths.py generator), identical
Matérn GP priors, identical 10x10/200-action lattice and budget — and
records per-step (remaining budget, tr(P), RMSE) curves.

The ``cma`` PyPI package is absent here, so the reference CMA-ES core
is substituted by scripts/_cma_stub.py (standard Hansen CMA-ES, see its
docstring for the one bounds-handling deviation); the reference's
objective, greedy warm start and greedy-keep logic run unmodified.

Planners are stochastic, so parity is statistical: N repetitions per
planner, metrics interpolated onto a common spent-budget grid, and the
committed artifact (runs/parity/parity.json) records mean±std at 50%
and 100% budget.  tests/test_quality_parity.py asserts the documented
tolerances against this artifact.

Usage:
  python scripts/quality_parity.py --reps 3 --budget 100 --sims 32 \
      --planners greedy,mcts,cmaes,zero --out runs/parity
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# ---- reference import shims (zero-egress environment) ----------------
import types

import _cma_stub

sys.modules["cma"] = _cma_stub
_tg = types.ModuleType("telegram")
_tg.Bot = object
sys.modules.setdefault("telegram", _tg)
_tv = types.ModuleType("torchvision")
_tv.transforms = types.SimpleNamespace()
sys.modules.setdefault("torchvision", _tv)

sys.path.insert(0, "/root/reference")

from mapping.grid_maps import GridMap as RefGridMap  # noqa: E402
from mapping.mappings import Mapping as RefMapping  # noqa: E402
from planning.common.actions import action_costs as ref_action_costs  # noqa: E402
from planning.ipp_masha import IPPMashaMission  # noqa: E402
from planning.mcts_mission import MCTSMission  # noqa: E402
from simulations import ground_truths as ref_ground_truths  # noqa: E402
from simulations.simulations import GaussianRandomField as RefGRF  # noqa: E402
from sensors.cameras import RGBCamera as RefCamera  # noqa: E402
from sensors.models.sensor_models import AltitudeSensorModel as RefModel  # noqa: E402

UAV = {"max_v": 2.0, "max_a": 2.0, "sampling_time": 2.0}
GRID = {"x_dim": 10, "y_dim": 10, "resolution": 4}
MAPPING = {
    "fit_gaussian_process": True,
    "prior_cov_mean": 0.5,
    "prior_cov_std": 0.25,
    "signal_variance": 1.82,
    "length_scale": 3.67,
    "noise_variance": 1.42,
    "nu": 1.5,
}
MCTS_KNOBS = dict(
    gamma=0.95, c=2.0, episode_horizon=5, k=4.0, alpha=0.75,
    epsilon_expand=0.2, epsilon_rollout=0.5, max_greedy_radius=10.0,
    use_gcb_rollout=False,
)
CMAES_KNOBS = dict(
    episode_horizon=5, cmaes_sigma0=[2.0, 2.0, 0.5], cmaes_max_iter=20,
    cmaes_population_size=12,
)


def make_gts(reps: int, seed: int = 1234) -> np.ndarray:
    """Matched ground truths from the reference's own GRF generator."""
    np.random.seed(seed)
    return np.stack(
        [
            ref_ground_truths.gaussian_random_field(
                lambda k: k ** (-5.0), GRID["y_dim"], GRID["x_dim"]
            )
            for _ in range(reps)
        ]
    )


def build_ref_mapping(gt2d: np.ndarray) -> RefMapping:
    grid = RefGridMap({"environment": dict(GRID), "mapping": dict(MAPPING)})
    model = RefModel(coeff_a=0.05, coeff_b=0.2)
    camera = RefCamera({"angle_x": 60, "angle_y": 60}, model, grid, encoding="rgb8")
    sim = RefGRF(camera, cluster_radius=5.0)
    sim.ground_truth_map = np.asarray(gt2d, float)
    camera.set_sensor_simulation(sim)
    return RefMapping(grid, camera, shuffle_prior_cov=False)


def run_reference(planner: str, gt2d: np.ndarray, budget: float, sims: int, seed: int,
                  adaptive: bool = False):
    """One reference mission; returns (spent_budget[], trP[], rmse[])."""
    np.random.seed(seed)
    import random as _random

    _random.seed(seed)
    mapping = build_ref_mapping(gt2d)
    common = dict(
        mapping=mapping,
        uav_specifications=dict(UAV),
        dist_to_boundaries=3.0,
        min_altitude=8.0,
        max_altitude=14.0,
        budget=budget,
        adaptive=adaptive,
        value_threshold=0.4,
        interval_factor=0.0,
        use_effective_mission_time=False,
    )
    if planner == "mcts":
        mission = MCTSMission(
            altitude_spacing=6.0, num_simulations=sims, **MCTS_KNOBS, **common
        )
    elif planner == "cmaes":
        mission = IPPMashaMission(altitude_spacing=6.0, **CMAES_KNOBS, **common)
    elif planner == "greedy":
        from planning.greedy_mission import GreedyMission

        mission = GreedyMission(altitude_spacing=6.0, **common)
    else:
        raise ValueError(planner)

    mission.execute()

    # reconstruct remaining budget per eval point from waypoint costs
    prev = mission.init_action if planner != "cmaes" else mission.previous_replan_action
    spent = [0.0]
    acc = 0.0
    for wp in mission.waypoints:
        acc += float(ref_action_costs(np.asarray(wp, float), np.asarray(prev, float), UAV))
        spent.append(acc)
        prev = wp
    k = min(len(spent), len(mission.map_uncertainties))
    return (
        np.asarray(spent[:k]),
        np.asarray(mission.map_uncertainties[:k]),
        np.asarray(mission.root_mean_squared_errors[:k]),
    )


# ---------------------------------------------------------------- ours


def build_our_cfg(budget: float, sims: int, planner: str, adaptive: bool = False):
    from ipp_rl_tpu.config.schema import config_from_dict

    mission_entry = {"type": {"greedy": "greedy", "mcts": "mcts",
                              "cmaes": "cmaes", "zero": "mcts_zero"}[planner]}
    if planner == "mcts":
        mission_entry.update(
            episode_horizon=MCTS_KNOBS["episode_horizon"],
            num_simulations=sims,
            gamma=MCTS_KNOBS["gamma"],
            alpha=MCTS_KNOBS["alpha"],
            k=MCTS_KNOBS["k"],
            epsilon_expand=MCTS_KNOBS["epsilon_expand"],
            epsilon_rollout=MCTS_KNOBS["epsilon_rollout"],
            horizontal_spacing=MCTS_KNOBS["max_greedy_radius"],
            uct_c=MCTS_KNOBS["c"],
        )
    if planner == "cmaes":
        mission_entry.update(
            episode_horizon=CMAES_KNOBS["episode_horizon"],
            cma_popsize=CMAES_KNOBS["cmaes_population_size"],
            cma_maxiter=CMAES_KNOBS["cmaes_max_iter"],
        )
    if planner == "zero":
        mission_entry.update(episode_horizon=5)
    return config_from_dict(
        {
            "environment": dict(GRID),
            "sensor": {
                "type": "rgb_camera",
                "field_of_view": {"angle_x": 60, "angle_y": 60},
                "model": {"type": "altitude_dependent", "coeff_a": 0.05, "coeff_b": 0.2},
                "simulation": {"type": "gaussian_random_field", "cluster_radius": 5},
            },
            "mapping": dict(MAPPING),
            "experiment": {
                "title": "parity",
                "constraints": {
                    "dist_to_boundaries": 3,
                    "min_altitude": 8,
                    "max_altitude": 14,
                    "altitude_spacing": 6,
                    "budget": budget,
                },
                "scenario": {"adaptive": adaptive, "value_threshold": 0.4,
                             "interval_factor": 0},
                "uav": dict(UAV),
                "missions": [mission_entry],
                "evaluation": {"repetitions": 1, "metrics": ["uncertainty", "rmse"]},
            },
        }
    )


def run_ours(planner: str, gts: np.ndarray, budget: float, sims: int,
             zero_ckpt: str, zero_sims: int, adaptive: bool = False,
             zero_arch=(64, 6), zero_unfloored: bool = False,
             zero_deploy_mode: str = "reference"):
    """All repetitions as ONE mission batch; returns list of curves."""
    import jax

    # quality comparison, not a timing run: keep it off the (single,
    # possibly busy) TPU chip.  The axon plugin overrides JAX_PLATFORMS,
    # so force CPU post-import (CLAUDE.md).
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ipp_rl_tpu.env.world import IPPWorld
    from ipp_rl_tpu.planners import ClassicMCTSPlanner, CMAESPlanner, GreedyPlanner

    cfg = build_our_cfg(budget, sims, planner, adaptive)
    world = IPPWorld(cfg, dtype=jnp.float32)
    R = gts.shape[0]
    state = world.init_state(
        jax.random.key(11), R, ground_truth=jnp.asarray(gts.reshape(R, -1))
    )
    mc = cfg.missions[0]
    if planner == "greedy":
        p = GreedyPlanner(world, mc)
    elif planner == "mcts":
        p = ClassicMCTSPlanner(world, mc)
    elif planner == "cmaes":
        p = CMAESPlanner(world, mc)
    elif planner == "zero":
        import dataclasses

        from flax import serialization

        from ipp_rl_tpu.planners.zero.mission import ZeroPlanner
        from ipp_rl_tpu.planners.zero.train import init_train_state, predict_fn

        # the committed checkpoint's architecture + end-of-training
        # exploration constants (see --zero-channels/--zero-blocks)
        hp = dataclasses.replace(
            cfg.missions[0].hyper_params,
            num_channels=zero_arch[0],
            num_encoder_res_blocks=zero_arch[1],
            num_global_pooling_channels=min(32, zero_arch[0] // 2),
            unfloored_value_head=zero_unfloored,
            num_mcts_simulations=zero_sims,
            max_valid_action_distance=11.5,
            puct_init=4.0,
        )
        mc = dataclasses.replace(mc, hyper_params=hp)
        net, tstate = init_train_state(cfg, hp, jax.random.key(0))
        ckpt = os.path.join(
            zero_ckpt, "checkpoints", "shared_net.trained_model.ckpt"
        )
        with open(ckpt, "rb") as f:
            variables = serialization.from_bytes(tstate.variables(), f.read())
        p = ZeroPlanner(
            world, mc, predict_fn(net), variables,
            deploy_mode=zero_deploy_mode,
        )
    res = p.run(jax.random.key(21), R, init_state=state)

    out = []
    for r in range(R):
        T = int(res.num_steps[r])
        spent = budget - res.budgets[r, : T + 1]
        out.append(
            (
                np.asarray(spent),
                np.asarray(res.metrics["uncertainty"][r, : T + 1]),
                np.asarray(res.metrics["rmse"][r, : T + 1]),
            )
        )
    return out


# ------------------------------------------------------------- analysis


def interp_at(curves, budget, fracs):
    """Interpolate (spent, metric) curves at spent = frac·budget."""
    rows = []
    for spent, *metrics in curves:
        rows.append(
            [np.interp(f * budget, spent, m) for f in fracs for m in metrics]
        )
    return np.asarray(rows)  # (reps, len(fracs)*2): [unc@f, rmse@f, ...]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--budget", type=float, default=100.0)
    ap.add_argument("--sims", type=int, default=32)
    ap.add_argument("--zero-sims", type=int, default=32)
    ap.add_argument("--zero-ckpt", default="runs/zero_canon")
    ap.add_argument("--zero-channels", type=int, default=64)
    ap.add_argument("--zero-blocks", type=int, default=6)
    ap.add_argument("--zero-unfloored", action="store_true")
    ap.add_argument("--zero-deploy-mode", default="reference")
    ap.add_argument("--planners", default="greedy,mcts,cmaes")
    ap.add_argument("--skip-ours", action="store_true")
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--out", default="runs/parity")
    ap.add_argument("--adaptive", action="store_true",
                    help="canonical adaptive scenario (masked rewards/metrics); "
                    "the regime the committed zero checkpoint was trained in")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    planners = args.planners.split(",")
    gts = make_gts(args.reps)
    fracs = [0.5, 1.0]
    result = {
        "config": {
            "reps": args.reps, "budget": args.budget, "sims": args.sims,
            "zero_sims": args.zero_sims, "grid": GRID, "adaptive": args.adaptive,
            "mcts_knobs": {k: v for k, v in MCTS_KNOBS.items()},
            "cmaes_knobs": {k: str(v) for k, v in CMAES_KNOBS.items()},
            "note": "reference cma core substituted by scripts/_cma_stub.py "
            "(cma package unavailable; see its docstring)",
            "note_mcts_rewards": "the reference MCTSMission masks rollout "
            "rewards by compute_adaptive_msk(mean, 0.4, 0) even when "
            "adaptive=False (mcts_mission.py:294-299); our classic MCTS "
            "gates masking on scenario.adaptive, so non-adaptive rollout "
            "rewards differ by that reference quirk (the adaptive run is "
            "the exact-matched regime)",
        },
        "planners": {},
    }

    def summarize(curves, t0):
        stats = interp_at(curves, args.budget, fracs)
        return {
            "uncertainty_mid": [float(stats[:, 0].mean()), float(stats[:, 0].std())],
            "rmse_mid": [float(stats[:, 1].mean()), float(stats[:, 1].std())],
            "uncertainty_final": [float(stats[:, 2].mean()), float(stats[:, 2].std())],
            "rmse_final": [float(stats[:, 3].mean()), float(stats[:, 3].std())],
            "curves": [[c[0].tolist(), c[1].tolist(), c[2].tolist()] for c in curves],
            "wall_s": round(time.time() - t0, 1),
        }

    result["planners"] = {p: {} for p in planners}
    # ALL reference missions first: MCTSMission's replan forks worker
    # processes (ProcessPoolExecutor), which deadlocks once JAX's
    # threadpools exist — so nothing may touch jax before this loop ends.
    if not args.skip_ref:
        for planner in planners:
            if planner == "zero":
                continue
            t0 = time.time()
            curves = [
                run_reference(planner, gts[r], args.budget, args.sims, seed=100 + r,
                              adaptive=args.adaptive)
                for r in range(args.reps)
            ]
            e = summarize(curves, t0)
            result["planners"][planner]["reference"] = e
            print(f"[ref {planner}] unc {e['uncertainty_final']} "
                  f"rmse {e['rmse_final']} ({e['wall_s']}s)", flush=True)
    if not args.skip_ours:
        for planner in planners:
            t0 = time.time()
            curves = run_ours(planner, gts, args.budget, args.sims,
                              args.zero_ckpt, args.zero_sims, args.adaptive,
                              zero_arch=(args.zero_channels, args.zero_blocks),
                              zero_unfloored=args.zero_unfloored,
                              zero_deploy_mode=args.zero_deploy_mode)
            e = summarize(curves, t0)
            result["planners"][planner]["ours"] = e
            print(f"[ours {planner}] unc {e['uncertainty_final']} "
                  f"rmse {e['rmse_final']} ({e['wall_s']}s)", flush=True)

    path = os.path.join(args.out, "parity.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {path}")

    # markdown table
    lines = [
        "# Solution-quality parity vs the reference implementations",
        "",
        f"Matched worlds (reference GRF ground truths, seed 1234), budget "
        f"{args.budget}, {args.reps} repetitions, "
        f"{'adaptive' if args.adaptive else 'non-adaptive'}, "
        f"{args.sims} MCTS simulations. Mean ± std.",
        "",
        "| planner | impl | tr(P) @50% | tr(P) final | RMSE @50% | RMSE final |",
        "|---|---|---|---|---|---|",
    ]
    for planner, entry in result["planners"].items():
        for impl in ("reference", "ours"):
            if impl not in entry:
                continue
            e = entry[impl]
            lines.append(
                f"| {planner} | {impl} | "
                f"{e['uncertainty_mid'][0]:.2f}±{e['uncertainty_mid'][1]:.2f} | "
                f"{e['uncertainty_final'][0]:.2f}±{e['uncertainty_final'][1]:.2f} | "
                f"{e['rmse_mid'][0]:.3f}±{e['rmse_mid'][1]:.3f} | "
                f"{e['rmse_final'][0]:.3f}±{e['rmse_final'][1]:.3f} |"
            )
    with open(os.path.join(args.out, "parity.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()

"""Measure the REFERENCE flagship replan on this host (CPU torch).

Drives the actual reference MCTS-zero deploy-time replan
(/root/reference/planning/mcts_zero/mcts.py get_policy with
deploy_time=True, the body of run_deploy_time_mcts_worker,
mcts_zero_mission.py:36-55,469-523) for ONE mission, with the
inference-server round trip replaced by a SYNCHRONOUS in-process stub
that runs the torch network immediately — i.e. the measurement is
GENEROUS to the reference: no multiprocessing queue hops, no 10 ms
batching timeout (inference_workers.py:73-96), no process spawn.

Output: one JSON line with seconds per replan (100-sim get_policy) and
per-simulation cost, recorded in docs/PERFORMANCE.md as the reference
baseline for bench.py --mode zero.

CPU-only by design (the reference falls back to CPU without CUDA,
policy_value_network_wrappers.py:27); safe to run alongside TPU jobs.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402
import yaml  # noqa: E402

# the reference imports telegram at module scope (experiments/notifications.py:4);
# not installed here (zero-egress) — stub it so mcts_zero_mission imports
import types  # noqa: E402

_tg = types.ModuleType("telegram")
_tg.Bot = object
sys.modules.setdefault("telegram", _tg)
# torchvision is only used by the replay-buffer augmentation path
# (replay_buffers.py:58-75), untouched at deploy time
_tv = types.ModuleType("torchvision")
_tv.transforms = types.SimpleNamespace()
sys.modules.setdefault("torchvision", _tv)


class SyncQueue:
    """Minimal queue pair: put() computes the reply inline."""

    def __init__(self, wrapper):
        self.wrapper = wrapper
        self.reply = None
        self.inference_s = 0.0
        self.count = 0

    # request side
    def put(self, msg):
        t0 = time.perf_counter()
        policy, value = self.wrapper.predict(
            msg["input"][None, ...], msg["action_msk"][None, ...]
        )
        self.inference_s += time.perf_counter() - t0
        self.count += 1
        self.reply = {"policy": policy[0], "value": value[0]}

    # reply side
    def get(self):
        return self.reply

    def empty(self):
        return self.reply is None


def main():
    with open("/root/reference/config/example.yaml") as f:
        params = yaml.safe_load(f)

    from mapping.grid_maps import GridMap
    from mapping.mappings import Mapping
    from sensors.cameras import RGBCamera
    from sensors.models.sensor_models import AltitudeSensorModel
    from planning.mcts_zero.mcts import MCTS, Node
    from planning.mcts_zero.mcts_zero_mission import run_deploy_time_mcts_worker
    from planning.common.features import EpisodeHistory
    from planning.mcts_zero.network_wrappers.policy_value_network_wrappers import (
        PolicyValueNetworkWrapper,
    )

    hp = params["experiment"]["missions"][0]["hyper_params"]
    cons = params["experiment"]["constraints"]
    uav = params["experiment"]["uav"]
    uav = {"max_v": uav["max_v"], "max_a": uav["max_a"], "sampling_time": uav["sampling_time"]}

    grid = GridMap(params)
    model = AltitudeSensorModel(
        params["sensor"]["model"]["coeff_a"], params["sensor"]["model"]["coeff_b"]
    )
    camera = RGBCamera(params["sensor"]["field_of_view"], model, grid, encoding="rgb8")
    from simulations.simulations import GaussianRandomField

    np.random.seed(0)
    camera.set_sensor_simulation(
        GaussianRandomField(camera, params["sensor"]["simulation"]["cluster_radius"])
    )
    mapping = Mapping(grid, camera)

    budget = float(cons["budget"])
    meta = {
        "budget": budget,
        "initial_budget": budget,
        "episode_horizon": params["experiment"]["missions"][0]["episode_horizon"],
        "max_episode_steps": hp["max_episode_steps"],
        "min_altitude": cons["min_altitude"],
        "max_altitude": cons["max_altitude"],
        "altitude_spacing": cons["altitude_spacing"],
        "cov_matrix_shape": grid.cov_matrix.shape,
        "num_grid_cells": grid.num_grid_cells,
        "uav_specifications": uav,
        "scenario_info": None,  # non-adaptive deploy (matches our bench)
    }

    wrapper = PolicyValueNetworkWrapper(hp, meta)
    q = SyncQueue(wrapper)
    mcts = MCTS(mapping, hp, meta, q, q, worker_id=0)

    prev_action = np.array([2.0, 2.0, 14.0])
    hist = EpisodeHistory(hp["input_history_length"])
    hist.push(
        grid.cov_matrix / np.max(grid.cov_matrix), prev_action, 1.0
    )

    # warmup (imports, first torch forward)
    mcts.num_simulations = 5
    run_deploy_time_mcts_worker(mcts, Node(grid.cov_matrix), prev_action, budget, hist, 0)

    sims = hp["num_mcts_simulations"]
    repeats = int(os.environ.get("REPEATS", "3"))
    times = []
    for r in range(repeats):
        m = MCTS(mapping, hp, meta, q, q, worker_id=0)  # fresh tree per replan
        m.num_simulations = sims
        t0 = time.perf_counter()
        run_deploy_time_mcts_worker(
            m, Node(grid.cov_matrix), prev_action, budget, hist, r
        )
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        json.dumps(
            {
                "metric": "reference_zero_replan_s",
                "value": round(best, 3),
                "unit": "s/replan (1 mission, 1 worker)",
                "detail": {
                    "num_simulations": sims,
                    "ms_per_simulation": round(best / sims * 1e3, 2),
                    "inference_fraction": round(q.inference_s / sum(times), 3),
                    "device": str(wrapper.device),
                    "note": "synchronous inference stub — no IPC/batching "
                    "delay; real reference is slower",
                },
            }
        )
    )


if __name__ == "__main__":
    main()

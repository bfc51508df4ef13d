"""Self-play training orchestration (reference
planning/mcts_zero/mcts_zero_mission.py:254-415 ``learn``).

Per self-play iteration:
  1. decay exploration parameters with floors (puct_init ×0.8 ≥ 4,
     dirichlet_alpha ×0.8 ≥ 0.3 — reference :231-243),
  2. grow the off-policy replay window (start + iter/step, capped —
     reference :245-252),
  3. generate E episodes on device (SelfPlay.run — replaces the 22-process
     pool, reference :324-344),
  4. snapshot the current net (arena rollback), train num_epochs over the
     window (reference :370-387),
  5. continuous update (hot weights — the "LOAD" queue message is simply
     the next iteration closing over new params) or arena gating with
     rollback (reference :389-398).

Checkpoints are flax-serialized msgpack files mirroring the reference's
naming scheme (``shared_net.<name>``, per-iteration snapshots,
``*.temp`` rollback — reference wrappers :233-249, mission :370-375).
Metrics stream to a JSONL log (the reference's TensorBoard surface).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ipp_rl_tpu.config.schema import Config, MCTSZeroHyperParams, MissionConfig
from ipp_rl_tpu.env.world import IPPWorld
from ipp_rl_tpu.planners.zero.arena import Arena
from ipp_rl_tpu.planners.zero.mcts import ZeroMCTS
from ipp_rl_tpu.planners.zero.replay import PrioritizedReplayBuffer, ReplayBuffer
from ipp_rl_tpu.planners.zero.selfplay import SelfPlay, Trajectory
from ipp_rl_tpu.planners.zero.train import (
    ZeroTrainState,
    inference_dtype as _l_infer_dt,
    init_train_state,
    make_train_step,
    onecycle_lr,
    predict_fn,
    reset_optimizer,
)

logger = logging.getLogger(__name__)


def save_checkpoint(path: str, state):
    """Serialize the network variables (shared or split state)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state.variables()))


def load_checkpoint(path: str, state):
    """Restore variables into a template train state (shared or split)."""
    from ipp_rl_tpu.planners.zero.train import SplitTrainState

    with open(path, "rb") as f:
        payload = serialization.from_bytes(state.variables(), f.read())
    if isinstance(state, SplitTrainState):
        return SplitTrainState(
            policy=state.policy.replace(
                params=payload["policy"]["params"],
                batch_stats=payload["policy"]["batch_stats"],
            ),
            value=state.value.replace(
                params=payload["value"]["params"],
                batch_stats=payload["value"]["batch_stats"],
            ),
        )
    return state.replace(
        params=payload["params"], batch_stats=payload["batch_stats"]
    )


class ZeroLearner:
    """Owns the network state, self-play generator, replay, and arena."""

    def __init__(
        self,
        world: IPPWorld,
        mission_cfg: MissionConfig,
        checkpoints_dir: str = "checkpoints",
        log_dir: str = "logs",
        num_envs: Optional[int] = None,
        seed: int = 42,
        use_tensorboard: bool = False,
        train_data_dir: Optional[str] = None,
        deploy_eval_every: int = 0,
        deploy_eval_envs: int = 16,
        deploy_eval_steps: int = 16,
        deploy_eval_world: Optional[IPPWorld] = None,
        deploy_gate: float = 0.0,
    ):
        """``deploy_eval_every`` > 0 runs a small held-out deploy eval
        (fixed worlds, temperature-0 visit argmax) every k iterations
        and keeps the best snapshot at ``shared_net.best``.  Deploy
        quality peaks mid-training and then degrades while self-play
        episode value stays flat (docs/PERFORMANCE.md r4 diagnosis), so
        the LAST checkpoint is the wrong deployment artifact; this
        builds the snapshot-selection workflow (scripts/
        eval_snapshots.py) into the learner.

        ``deploy_gate`` > 0 turns the eval from *selection* into a
        *gate* (r5): when the current network's deploy eval exceeds
        ``deploy_gate × best_deploy_eval`` (lower is better), the run
        rolls the network back to the best snapshot before continuing —
        the same accept/rollback mechanism as the reference's arena
        (reference mcts_zero_mission.py:417-455) but driven by held-out
        deploy quality, which is the signal that actually degrades in
        late training (docs/PERFORMANCE.md r4 diagnosis) while self-play
        episode value stays flat.  1.1 is a reasonable tolerance."""
        self.world = world
        self.cfg: Config = world.cfg
        self.mc = mission_cfg
        self.hp: MCTSZeroHyperParams = mission_cfg.hyper_params
        self.checkpoints_dir = checkpoints_dir
        self.log_dir = log_dir
        # persisted self-play data for kill-and-resume (the reference's
        # TRAIN_DATA_DIR/iter_k directories of bz2 pickles, reference
        # mcts_zero_mission.py:309-311,364-368); one npz per iteration here
        self.train_data_dir = train_data_dir or os.environ.get(
            "TRAIN_DATA_DIR", os.path.join(checkpoints_dir, "train_data")
        )
        os.makedirs(checkpoints_dir, exist_ok=True)
        os.makedirs(log_dir, exist_ok=True)
        os.makedirs(self.train_data_dir, exist_ok=True)
        self._metrics_file = os.path.join(log_dir, "train_metrics.jsonl")
        # optional TensorBoard surface (reference wrappers :177-195);
        # JSONL remains the primary metrics stream
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(log_dir, "tensorboard"))
            except Exception as e:  # pragma: no cover
                logger.warning("tensorboard unavailable: %s", e)

        hp = self.hp
        # reference: num_workers × num_episodes sequential episodes
        # (mcts_zero_mission.py:324-344) → one batched width here
        self.num_envs = num_envs or hp.num_workers * hp.num_episodes

        self.rng = np.random.default_rng(seed)
        self.key = jax.random.key(seed)

        # legacy global-OneCycle horizon (hp.per_iteration_lr_schedule=False);
        # the reference recipe computes a fresh per-iteration horizon in
        # train_iteration instead (reference wrappers :51-69)
        self._global_step = 0
        self._global_total = hp.num_self_play_iterations * hp.num_epochs * 64
        if hp.shared_network:
            self.net, self.state = init_train_state(
                self.cfg, hp, self._next_key(), dtype=world.dtype
            )
            self.train_step = make_train_step(self.net, hp)
            self.predict = predict_fn(self.net, dtype=_l_infer_dt(hp))  # (variables, planes, mask)
        else:
            # split policy/value networks (reference network_wrappers/
            # policy_network_wrappers.py, value_network_wrappers.py)
            from ipp_rl_tpu.planners.zero.train import (
                init_split_train_state,
                make_split_train_step,
                split_predict_fn,
            )

            self.net, self.state = init_split_train_state(
                self.cfg, hp, self._next_key(), dtype=world.dtype
            )
            self.train_step = make_split_train_step(self.net, hp)
            self.predict = split_predict_fn(self.net, dtype=_l_infer_dt(hp))
        self.mcts = ZeroMCTS(
            world, hp, mission_cfg.episode_horizon, self.predict
        )
        self.selfplay = SelfPlay(world, hp, mission_cfg.episode_horizon, self.mcts)
        # one compiled self-play program; weights are a runtime argument
        self._selfplay_run = jax.jit(
            self.selfplay.run, static_argnames=("num_envs", "num_simulations")
        )
        buffer_cls = PrioritizedReplayBuffer if hp.use_per else ReplayBuffer
        self.replay = buffer_cls(world, hp, hp.start_train_examples_history)
        self._epoch_runner = None  # compiled lazily (fused uniform path)
        self._per_epoch_runner = None  # compiled lazily (fused PER path)
        self.fused_per = True  # False = host-loop PER (tests compare both)
        self._CHUNK_STEPS = 32
        self.arena = Arena(world, hp, mission_cfg.episode_horizon)

        # mutable exploration schedule state (reference :231-243)
        self.puct_init = hp.puct_init
        self.dirichlet_alpha = hp.dirichlet_alpha
        self.prev_network_wins = 0

        # best-snapshot selection by held-out deploy eval (r4)
        self.deploy_eval_every = deploy_eval_every
        self.deploy_eval_envs = deploy_eval_envs
        self.deploy_eval_steps = deploy_eval_steps
        self.best_deploy_eval = float("inf")
        self.best_iteration = -1
        self.deploy_gate = float(deploy_gate)
        self._deploy_eval_state = None  # lazily built fixed eval worlds
        self._deploy_eval_fn = None  # compiled once, weights as argument
        self._policy_eval_fn = None  # raw-policy (sims=0) rollout eval
        self.best_policy_eval = float("inf")
        self.best_policy_iteration = -1
        # selection must happen in the EXACT world even when self-play
        # runs with inflated noise (train_zero --train-noise-scale)
        self._deploy_eval_world = deploy_eval_world or world

        # per-iteration notification stream (reference mission :398-415
        # telegram_notifier.finished_iteration; JSONL sink here)
        self.notifier = None
        if mission_cfg.telegram_notifications:
            from ipp_rl_tpu.utils.notifications import Notifier

            self.notifier = Notifier("mcts_zero.learn", out_dir=log_dir)

    # ------------------------------------------------------------- helpers

    def _next_key(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    # --------------------------------------- best-snapshot deploy eval

    def _make_deploy_eval_fn(self):
        """ONE jitted deploy-eval program with the network variables as
        a runtime argument (so every iteration reuses the compile):
        fixed held-out worlds, clean deploy search (no root noise /
        forced playouts), temperature-0 visit argmax, floor exploration
        constants — the deployment configuration the quality artifacts
        use."""
        import dataclasses

        from ipp_rl_tpu.ops.geometry import travel_costs
        from ipp_rl_tpu.planners.zero.features import init_history, push_history
        from ipp_rl_tpu.planners.zero.mcts import ZeroMCTS, _rand_argmax

        hp = dataclasses.replace(
            self.hp,
            puct_init=self.hp.puct_init_min,
            dirichlet_alpha=self.hp.dirichlet_alpha_min,
        )
        world, cfg = self._deploy_eval_world, self.cfg
        mcts = ZeroMCTS(world, hp, self.mc.episode_horizon, self.predict)
        E, T = self.deploy_eval_envs, self.deploy_eval_steps
        dt = world.dtype

        def run(variables, state0, key):
            hist0 = jax.vmap(lambda _: init_history(cfg, hp, dt))(
                jnp.arange(E)
            )

            def step(carry, k):
                state, hist = carry
                k_plan, k_meas, k_tie = jax.random.split(k, 3)
                hist = jax.vmap(push_history)(
                    hist,
                    state.cov,
                    state.pos,
                    state.budget / jnp.asarray(cfg.constraints.budget, dt),
                )
                tree, _ = mcts.search(
                    state.cov, state.mean, state.pos, state.budget, hist,
                    k_plan, net_variables=variables,
                    forced_playouts=False, root_noise=False,
                )
                visits = tree.Nsa[:, 0]
                ties = jax.random.split(k_tie, E)
                action = jax.vmap(_rand_argmax)(ties, visits)
                cost = travel_costs(
                    world.actions_xyz[action], state.pos,
                    cfg.uav.max_v, cfg.uav.max_a,
                )
                can = (
                    state.active
                    & (state.budget >= cfg.environment.resolution)
                    & (cost <= state.budget)
                    & (cost > 0)
                )
                state = state.replace(active=can)
                state = world.step_index(state, action, k_meas)
                return (state, hist), None

            (state, _), _ = jax.lax.scan(
                step, (state0, hist0), jax.random.split(key, T)
            )
            return jnp.mean(world.evaluate(state)["uncertainty"])

        return jax.jit(run)

    def deploy_eval(self) -> float:
        """Held-out deploy quality (mean final masked tr(P)) of the
        CURRENT network on the fixed eval worlds."""
        if self._deploy_eval_state is None:
            self._deploy_eval_fn = self._make_deploy_eval_fn()
            self._deploy_eval_state = self._deploy_eval_world.init_state(
                jax.random.key(777), self.deploy_eval_envs
            )
        return float(
            self._deploy_eval_fn(
                self.state.variables(), self._deploy_eval_state,
                jax.random.key(778),
            )
        )

    def _make_policy_eval_fn(self):
        """Raw-policy deploy eval: the SAME fixed held-out worlds rolled
        out with the bare policy-net argmax (``num_mcts_simulations <= 0``
        deployment, reference mcts_zero_mission.py:478-502) — no search
        at all.  Near-free per iteration (T forward passes on E
        missions), it tracks whether the learned *prior* itself plans:
        r4 found the raw policy scored WORSE than the random planner
        (VERDICT weak #2), so the best-raw-policy snapshot is now
        selected explicitly (``shared_net.best_policy``)."""
        from ipp_rl_tpu.ops.geometry import travel_costs
        from ipp_rl_tpu.planners.zero.features import (
            feature_planes,
            init_history,
            push_history,
        )
        from ipp_rl_tpu.planners.zero.mcts import ZeroMCTS

        hp = self.hp
        world, cfg = self._deploy_eval_world, self.cfg
        mcts = ZeroMCTS(world, hp, self.mc.episode_horizon, self.predict)
        E, T = self.deploy_eval_envs, self.deploy_eval_steps
        dt = world.dtype

        def run(variables, state0, key):
            hist0 = jax.vmap(lambda _: init_history(cfg, hp, dt))(
                jnp.arange(E)
            )

            def step(carry, k):
                state, hist = carry
                hist = jax.vmap(push_history)(
                    hist,
                    state.cov,
                    state.pos,
                    state.budget / jnp.asarray(cfg.constraints.budget, dt),
                )
                planes = jax.vmap(
                    lambda h, m: feature_planes(world, hp, h, m)
                )(hist, state.mean)
                masks = jax.vmap(mcts.valid_actions)(state.pos, state.budget)
                policy, _ = self.predict(variables, planes, masks.astype(dt))
                action = jnp.argmax(policy * masks, axis=-1).astype(jnp.int32)
                cost = travel_costs(
                    world.actions_xyz[action], state.pos,
                    cfg.uav.max_v, cfg.uav.max_a,
                )
                can = (
                    state.active
                    & (state.budget >= cfg.environment.resolution)
                    & (cost <= state.budget)
                    & (cost > 0)
                )
                state = state.replace(active=can)
                state = world.step_index(state, action, k)
                return (state, hist), None

            (state, _), _ = jax.lax.scan(
                step, (state0, hist0), jax.random.split(key, T)
            )
            return jnp.mean(world.evaluate(state)["uncertainty"])

        return jax.jit(run)

    def policy_eval(self) -> float:
        """Held-out RAW-POLICY quality (mean final masked tr(P)) of the
        current network — the sims=0 deployment mode."""
        if self._deploy_eval_state is None:
            self._deploy_eval_fn = self._make_deploy_eval_fn()
            self._deploy_eval_state = self._deploy_eval_world.init_state(
                jax.random.key(777), self.deploy_eval_envs
            )
        if self._policy_eval_fn is None:
            self._policy_eval_fn = self._make_policy_eval_fn()
        return float(
            self._policy_eval_fn(
                self.state.variables(), self._deploy_eval_state,
                jax.random.key(779),
            )
        )

    def best_policy_path(self) -> str:
        return os.path.join(self.checkpoints_dir, "shared_net.best_policy")

    def best_path(self) -> str:
        return os.path.join(self.checkpoints_dir, "shared_net.best")

    def _best_meta_path(self) -> str:
        return self.best_path() + ".json"

    def _save_best_meta(self):
        """Persist best-snapshot tracking so a resumed run cannot
        overwrite shared_net.best with a worse snapshot (ADVICE r4:
        best_deploy_eval reset to inf on resume)."""
        tmp = self._best_meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "best_deploy_eval": self.best_deploy_eval,
                    "best_iteration": self.best_iteration,
                    "best_policy_eval": self.best_policy_eval,
                    "best_policy_iteration": self.best_policy_iteration,
                },
                f,
            )
        os.replace(tmp, self._best_meta_path())

    def _load_best_meta(self):
        """Restore best-snapshot tracking (no-op if never saved)."""
        if not os.path.exists(self._best_meta_path()):
            return
        try:
            with open(self._best_meta_path()) as f:
                meta = json.load(f)
            self.best_deploy_eval = float(meta["best_deploy_eval"])
            self.best_iteration = int(meta["best_iteration"])
            self.best_policy_eval = float(meta.get("best_policy_eval", float("inf")))
            self.best_policy_iteration = int(meta.get("best_policy_iteration", -1))
            logger.info(
                "restored best-snapshot tracking: %.3f @ iter %d",
                self.best_deploy_eval, self.best_iteration,
            )
        except (ValueError, KeyError, json.JSONDecodeError) as e:
            logger.warning("could not restore best-snapshot meta: %s", e)

    def deployment_path(self) -> str:
        return os.path.join(
            self.checkpoints_dir, f"shared_net.{self.mc.model_deployment_filename}"
        )

    def _log(self, record: Dict):
        with open(self._metrics_file, "a") as f:
            f.write(json.dumps({k: _scalar(v) for k, v in record.items()}) + "\n")
        if self._tb is not None:
            step = int(record.get("iteration", 0))
            for k, v in record.items():
                val = _scalar(v)
                if isinstance(val, (int, float)) and k != "iteration":
                    self._tb.add_scalar(f"train/{k}", val, step)
            self._tb.flush()

    def schedule_exploration(self, iteration: int):
        if iteration > 0:
            self.puct_init = max(
                self.hp.puct_init_min, self.puct_init * self.hp.puct_init_decay
            )
            self.dirichlet_alpha = max(
                self.hp.dirichlet_alpha_min,
                self.dirichlet_alpha * self.hp.dirichlet_alpha_decay,
            )

    def window_size(self, iteration: int) -> int:
        hp = self.hp
        return min(
            int(hp.start_train_examples_history + iteration / hp.train_examples_history_step),
            hp.max_train_examples_history,
        )

    # --------------------------------------------- train-data persistence

    def _iter_path(self, iteration: int) -> str:
        return os.path.join(self.train_data_dir, f"iter_{iteration}.npz")

    def save_train_examples(self, iteration: int, traj: Trajectory):
        """Persist one self-play iteration (reference writes per-sample
        bz2 pickles under TRAIN_DATA_DIR/iter_k, mission :309-311,346-352;
        one compressed npz of the whole trajectory here)."""
        arrays = {f: np.asarray(getattr(traj, f)) for f in Trajectory._fields}
        tmp = self._iter_path(iteration) + ".tmp"
        with open(tmp, "wb") as f:
            np.savez_compressed(f, **arrays)
        os.replace(tmp, self._iter_path(iteration))

    def load_train_examples(self, iteration: int) -> Optional[Trajectory]:
        path = self._iter_path(iteration)
        if not os.path.exists(path):
            return None
        with np.load(path) as z:
            return Trajectory(**{f: z[f] for f in Trajectory._fields})

    def prune_train_examples(self, window_start: int):
        """Sliding-window deletion of outdated iteration files
        (reference mission :364-368)."""
        for name in os.listdir(self.train_data_dir):
            if name.startswith("iter_") and name.endswith(".npz"):
                try:
                    it = int(name[len("iter_"):-len(".npz")])
                except ValueError:
                    continue
                if it < window_start:
                    os.remove(os.path.join(self.train_data_dir, name))

    def check_for_train_examples(self) -> bool:
        """True if persisted data exists for mc.train_examples_iter
        (reference :525-531 — sets skip_first_self_play)."""
        found = os.path.exists(self._iter_path(self.mc.train_examples_iter))
        if found:
            logger.info(
                "found train examples for iteration %d", self.mc.train_examples_iter
            )
        else:
            logger.error(
                "train examples '%s' not found!",
                self._iter_path(self.mc.train_examples_iter),
            )
        return found

    def _resume(self) -> tuple[int, bool]:
        """Resume an interrupted run (reference execute :545-562 +
        learn preamble :304): load the deployment checkpoint if present,
        and if persisted self-play data exists for train_examples_iter,
        start there with the first self-play skipped.  Returns
        (start_iteration, skip_first_self_play)."""
        dp = self.deployment_path()
        if os.path.exists(dp):
            self.state = load_checkpoint(dp, self.state)
            logger.info("restart: loaded deployment checkpoint %s", dp)
        self._load_best_meta()
        if not self.check_for_train_examples():
            return 0, False
        start = self.mc.train_examples_iter
        # fast-forward the exploration decay to where iteration `start`
        # would find it (deviation: the reference restarts the decay from
        # its initial values on resume — ref :231-243 mutate hyper_params
        # in-process only; decaying through the skipped iterations keeps
        # the schedule consistent with an uninterrupted run)
        for it in range(1, start):
            self.schedule_exploration(it)
        # reload the replay window from disk
        window = self.window_size(start)
        for it in range(max(0, start - window + 1), start + 1):
            traj = self.load_train_examples(it)
            if traj is not None:
                self.replay.add_iteration(it, traj)
        logger.info(
            "resuming at iteration %d with %d replay samples", start, len(self.replay)
        )
        return start, True

    # ---------------------------------------------------------------- learn

    def learn(
        self,
        num_iterations: Optional[int] = None,
        num_train_batches: Optional[int] = None,
        arena_games: Optional[int] = None,
    ):
        """Full training loop.  The optional caps shrink the canonical
        workload for tests/smoke runs."""
        hp = self.hp
        iters = num_iterations or hp.num_self_play_iterations
        start_iteration, skip_first_self_play = 0, False
        if self.mc.restart_training:
            start_iteration, skip_first_self_play = self._resume()
        for iteration in range(start_iteration, iters):
            t0 = time.time()
            self.schedule_exploration(iteration)
            window = self.window_size(iteration)
            self.replay.set_window(iteration, window)
            self.prune_train_examples(max(0, iteration - window + 1))

            if skip_first_self_play and iteration == start_iteration:
                # reuse the persisted examples (reference :313)
                episode_values = np.zeros((1,), np.float32)
            else:
                traj_dev, episode_values = self._selfplay_run(
                    self._next_key(),
                    self.num_envs,
                    net_variables=self.state.variables(),
                    puct_init=self.puct_init,
                    dirichlet_alpha=self.dirichlet_alpha,
                )
                traj = jax.tree_util.tree_map(np.asarray, traj_dev)
                # keep the device copy alive for the fused epoch runner
                self.replay.add_iteration(iteration, traj, device_traj=traj_dev)
                self.save_train_examples(iteration, traj)
            sp_time = time.time() - t0

            # rollback snapshot (reference :370-372)
            temp_path = os.path.join(self.checkpoints_dir, "shared_net.temp")
            save_checkpoint(temp_path, self.state)

            t1 = time.time()
            metrics = self.train_iteration(num_train_batches)
            train_time = time.time() - t1

            snap_path = os.path.join(
                self.checkpoints_dir, f"shared_net.snapshot_{iteration}"
            )
            save_checkpoint(snap_path, self.state)

            accepted = True
            if not hp.continuous_network_update:
                # The fused epoch runner donates the pre-training state's
                # buffers (replay.py make_epoch_runner, donate_argnums=(0,)),
                # so a live reference taken before training would hold
                # deleted arrays. Rehydrate the rollback state from the
                # just-written temp checkpoint instead.
                prev_state = load_checkpoint(temp_path, self.state)
                accepted = self.arena_gate(prev_state, arena_games)
            if accepted:
                save_checkpoint(self.deployment_path(), self.state)

            # Deploy eval AFTER the acceptance gate so a rejected (and
            # rolled-back) iteration can never be recorded as the best
            # deployment snapshot (ADVICE r4).
            deploy_metric = None
            policy_metric = None
            deploy_rolled_back = False
            if self.deploy_eval_every and accepted and (
                iteration % self.deploy_eval_every == 0
                or iteration == iters - 1
            ):
                # raw-policy (sims=0) eval BEFORE any gating rollback so
                # it scores this iteration's actual weights
                policy_metric = self.policy_eval()
                if policy_metric < self.best_policy_eval:
                    self.best_policy_eval = policy_metric
                    self.best_policy_iteration = iteration
                    save_checkpoint(self.best_policy_path(), self.state)
                    self._save_best_meta()
                deploy_metric = self.deploy_eval()
                if deploy_metric < self.best_deploy_eval:
                    self.best_deploy_eval = deploy_metric
                    self.best_iteration = iteration
                    save_checkpoint(self.best_path(), self.state)
                    self._save_best_meta()
                elif (
                    self.deploy_gate > 0
                    and self.best_iteration >= 0
                    and deploy_metric > self.deploy_gate * self.best_deploy_eval
                    and os.path.exists(self.best_path())
                ):
                    # deploy-quality gate (r5): the network degraded past
                    # tolerance on the held-out worlds — roll back to the
                    # best snapshot and continue training from there.
                    self.state = load_checkpoint(self.best_path(), self.state)
                    save_checkpoint(self.deployment_path(), self.state)
                    deploy_rolled_back = True
                    logger.info(
                        "iter %d: deploy eval %.2f > %.2f×best %.2f — "
                        "ROLLED BACK to best snapshot (iter %d)",
                        iteration, deploy_metric, self.deploy_gate,
                        self.best_deploy_eval, self.best_iteration,
                    )
                logger.info(
                    "iter %d: deploy eval %.2f (best %.2f @ iter %d)",
                    iteration, deploy_metric, self.best_deploy_eval,
                    self.best_iteration,
                )

            self._log(
                dict(
                    iteration=iteration,
                    num_samples=len(self.replay),
                    window=window,
                    puct_init=self.puct_init,
                    dirichlet_alpha=self.dirichlet_alpha,
                    mean_episode_value=float(np.mean(episode_values)),
                    selfplay_s=sp_time,
                    train_s=train_time,
                    accepted=accepted,
                    **(
                        {
                            "deploy_eval": deploy_metric,
                            "deploy_rolled_back": deploy_rolled_back,
                            "policy_eval": policy_metric,
                        }
                        if deploy_metric is not None
                        else {}
                    ),
                    **(metrics or {}),
                )
            )
            logger.info(
                "iter %d: %d samples, episode value %.3f, accepted=%s",
                iteration, len(self.replay), float(np.mean(episode_values)), accepted,
            )
            if self.notifier is not None:
                # reference mission :398-415 per-iteration notification
                self.notifier.finished_iteration(
                    str(iteration),
                    {
                        "num_samples": len(self.replay),
                        "accepted": accepted,
                        "mean_episode_value": float(np.mean(episode_values)),
                        "collected_new_episodes": not (
                            skip_first_self_play and iteration == start_iteration
                        ),
                    },
                )
        if self.notifier is not None:
            self.notifier.finished({"iterations": iters})

    def train_iteration(self, num_batches_cap: Optional[int] = None) -> Dict:
        """Train num_epochs over the replay window with the reference
        recipe: a FRESH SGD + three-phase OneCycle sized to this
        iteration's actual ``num_epochs × num_batches`` steps (reference
        wrappers :51-69).  hp.per_iteration_lr_schedule=False keeps the
        round-1 global schedule + persistent momentum instead.

        Uniform replay takes the fused on-device path (whole window
        resident in HBM, gather+planes+step scanned in fixed-size chunks
        — one host round trip per chunk instead of per batch); PER keeps
        the per-batch loop because priorities must update between
        samples."""
        hp = self.hp
        num_batches = self.replay.num_batches(hp.batch_size)
        if num_batches_cap is not None:
            num_batches = min(num_batches, num_batches_cap)
        if isinstance(self.replay, PrioritizedReplayBuffer):
            self.replay.begin_training(hp.batch_size, hp.num_epochs)
        total_steps = max(1, num_batches * hp.num_epochs)
        if hp.per_iteration_lr_schedule:
            self.state = reset_optimizer(hp, self.state)
        if not isinstance(self.replay, PrioritizedReplayBuffer):
            return self._train_iteration_fused(total_steps)
        if self.fused_per:
            return self._train_iteration_fused_per(total_steps)
        last = {}
        step_in_iter = 0
        for epoch in range(hp.num_epochs):
            for _ in range(num_batches):
                if hp.per_iteration_lr_schedule:
                    lr = onecycle_lr(hp, step_in_iter, total_steps)
                else:
                    lr = onecycle_lr(hp, self._global_step, self._global_total)
                batch, idx = self.replay.sample(
                    hp.batch_size, self.rng, self._next_key()
                )
                self.state, metrics, value_l = self.train_step(
                    self.state, batch, self._next_key(), lr
                )
                step_in_iter += 1
                self._global_step += 1
                self.replay.step()
                if isinstance(self.replay, PrioritizedReplayBuffer):
                    per_sample = np.asarray(value_l)[: len(idx)] + 1e-8
                    self.replay.update(idx, per_sample)
                last = {k: float(v) for k, v in metrics.items()}
                last["lr"] = lr
        return last

    def _train_iteration_fused(self, total_steps: int) -> Dict:
        """Scan-based epoch(s): ``total_steps`` minibatches rounded DOWN
        to whole chunks of ``_CHUNK_STEPS`` so one compiled program (per
        padded window shape) serves every iteration.  The OneCycle
        horizon uses the executed step count, so the schedule still
        sweeps its full three phases (reference wrappers :51-69)."""
        hp = self.hp
        if self._epoch_runner is None:
            self._epoch_runner = self.replay.make_epoch_runner(self.train_step)
        win, slot_map = self.replay.device_window(hp.max_train_examples_history)
        chunk = min(self._CHUNK_STEPS, max(1, total_steps))
        n_chunks = max(1, total_steps // chunk)
        executed = n_chunks * chunk
        last = {}
        for c in range(n_chunks):
            if hp.per_iteration_lr_schedule:
                lrs = np.asarray(
                    [
                        onecycle_lr(hp, c * chunk + s, executed)
                        for s in range(chunk)
                    ],
                    np.float32,
                )
            else:
                lrs = np.asarray(
                    [
                        onecycle_lr(hp, self._global_step + s, self._global_total)
                        for s in range(chunk)
                    ],
                    np.float32,
                )
            rows = self.replay.epoch_rows(chunk, hp.batch_size, self.rng, slot_map)
            self.state, metrics = self._epoch_runner(
                self.state, win, jnp.asarray(rows), jnp.asarray(lrs),
                self._next_key(),
            )
            self._global_step += chunk
            last = {k: float(np.asarray(v)[-1]) for k, v in metrics.items()}
            last["lr"] = float(lrs[-1])
        return last

    def _train_iteration_fused_per(self, total_steps: int) -> Dict:
        """Fused PER epochs: priorities live on device and are sampled
        from / updated inside the scan (replay.make_per_epoch_runner) —
        no per-batch host round trips.  Chunking, LR handling and the
        executed-step OneCycle horizon mirror _train_iteration_fused;
        β anneals β0 → 1 over the executed horizon exactly like the host
        loop's begin_training/step (reference replay_buffers.py:117-128)."""
        hp = self.hp
        draw = max(1, hp.batch_size // (hp.num_augmented_samples + 1))
        if self._per_epoch_runner is None:
            self._per_epoch_runner = self.replay.make_per_epoch_runner(
                self.train_step, draw
            )
        win, _ = self.replay.device_window(hp.max_train_examples_history)
        valid = self.replay.device_valid(hp.max_train_examples_history)
        pri = self.replay.init_device_priorities(valid)
        chunk = min(self._CHUNK_STEPS, max(1, total_steps))
        n_chunks = max(1, total_steps // chunk)
        executed = n_chunks * chunk
        beta0 = self.replay.beta0
        last = {}
        for c in range(n_chunks):
            if hp.per_iteration_lr_schedule:
                lrs = np.asarray(
                    [
                        onecycle_lr(hp, c * chunk + s, executed)
                        for s in range(chunk)
                    ],
                    np.float32,
                )
            else:
                lrs = np.asarray(
                    [
                        onecycle_lr(hp, self._global_step + s, self._global_total)
                        for s in range(chunk)
                    ],
                    np.float32,
                )
            betas = np.asarray(
                [
                    min(beta0 + (c * chunk + s) * (1.0 - beta0) / executed, 1.0)
                    for s in range(chunk)
                ],
                np.float32,
            )
            self.state, pri, metrics = self._per_epoch_runner(
                self.state, pri, win, valid,
                jnp.asarray(lrs), jnp.asarray(betas), self._next_key(),
            )
            self._global_step += chunk
            last = {k: float(np.asarray(v)[-1]) for k, v in metrics.items()}
            last["lr"] = float(lrs[-1])
        return last

    def arena_gate(self, prev_state: ZeroTrainState, arena_games=None) -> bool:
        """Accept/rollback via arena (reference :417-455)."""
        hp = self.hp
        r_prev, r_curr = self.arena.play_games(
            self.predict,
            prev_state.variables(),
            self.state.variables(),
            arena_games or hp.num_arena_games,
            self._next_key(),
        )
        r_prev, r_curr = float(r_prev), float(r_curr)
        rel = r_curr / max(r_prev + r_curr, 1e-12)
        if rel < hp.network_update_threshold:
            logger.info("REJECTED new network (rel=%.3f)", rel)
            self.prev_network_wins += 1
            self.state = load_checkpoint(
                os.path.join(self.checkpoints_dir, "shared_net.temp"), self.state
            )
            return False
        logger.info("ACCEPTED new network (rel=%.3f)", rel)
        return True


def _scalar(v):
    if isinstance(v, (np.generic, jnp.ndarray)):
        return float(v)
    return v

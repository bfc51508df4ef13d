"""Replay buffers over self-play trajectories.

The reference's replay is a file list over a sliding window of
iteration directories of bz2-pickled samples (reference
planning/mcts_zero/replay_buffers.py:15-141).  Here the data plane is
in-memory: each self-play iteration contributes one host-resident
``Trajectory``; the buffer keeps a sliding window of iterations and
samples (iteration, env, step) triples.  Feature planes are NOT stored —
they're rebuilt in-jit from the belief history at training time
(planes_from_sample), which is both 16× smaller and removes the disk
round-trip entirely.

Uniform and prioritized (α-exponent priorities, β-annealed importance
weights, priorities updated from per-sample value loss — reference
:104-141) variants, plus the reference's random-shift plane augmentation
(ReplicationPad(4) + RandomCrop, reference :58-75) applied on device.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ipp_rl_tpu.config.schema import MCTSZeroHyperParams
from ipp_rl_tpu.env.world import IPPWorld
from ipp_rl_tpu.planners.zero.selfplay import Trajectory, planes_from_sample
from ipp_rl_tpu.planners.zero.train import TrainBatch


class DeviceWindow(NamedTuple):
    """The replay window stacked on device: (K slots, E envs, T steps, ...).

    Slots beyond the live window are zero-filled so the runner compiles
    once for K = max_train_examples_history regardless of window growth."""

    cov: jnp.ndarray  # (K, E, T, N, N)
    mean: jnp.ndarray  # (K, E, T, N)
    prev_pos: jnp.ndarray  # (K, E, T, 3)
    budget: jnp.ndarray  # (K, E, T)
    policy: jnp.ndarray  # (K, E, T, A)
    valid_mask: jnp.ndarray  # (K, E, T, A)
    reward: jnp.ndarray  # (K, E, T)
    value: jnp.ndarray  # (K, E, T)


class ReplayBuffer:
    """Sliding-window uniform replay over trajectory iterations."""

    def __init__(
        self,
        world: IPPWorld,
        hp: MCTSZeroHyperParams,
        window_size: int,
    ):
        self.world = world
        self.hp = hp
        self.window_size = window_size
        self._iters: Dict[int, Trajectory] = {}
        self._dev_iters: Dict[int, Trajectory] = {}  # device-resident copies
        self._index: Optional[np.ndarray] = None  # (num_samples, 3) iter,e,t
        self._iter_keys: List[int] = []
        self._build_planes = jax.jit(self._make_planes_builder())

    def _make_planes_builder(self):
        world, hp = self.world, self.hp
        L = hp.input_history_length

        def build(covs, positions, budget_fracs, lens, means):
            return jax.vmap(
                lambda c, p, b, l, m: planes_from_sample(world, hp, c, p, b, l, m)
            )(covs, positions, budget_fracs, lens, means)

        return build

    def add_iteration(
        self, iteration: int, traj: Trajectory, device_traj: Optional[Trajectory] = None
    ):
        """Register a finished self-play iteration (host numpy) and drop
        iterations outside the window (reference mcts_zero_mission.py:364-368).

        ``device_traj`` keeps the just-generated on-device trajectory
        alive so the fused epoch runner never re-uploads it over the
        (slow, tunneled) host↔device link."""
        self._iters[iteration] = jax.tree_util.tree_map(np.asarray, traj)
        if device_traj is not None:
            self._dev_iters[iteration] = device_traj
        self.set_window(iteration, self.window_size)

    def set_window(self, current_iteration: int, window_size: int):
        self.window_size = window_size
        start = max(0, current_iteration - window_size + 1)
        for k in list(self._iters):
            if k < start:
                del self._iters[k]
        for k in list(self._dev_iters):
            if k < start:
                del self._dev_iters[k]
        self._rebuild_index()

    def _rebuild_index(self):
        rows = []
        for it, traj in sorted(self._iters.items()):
            e_idx, t_idx = np.nonzero(traj.sample_ok)
            rows.append(
                np.stack([np.full_like(e_idx, it), e_idx, t_idx], axis=1)
            )
        self._index = (
            np.concatenate(rows, axis=0) if rows else np.zeros((0, 3), np.int64)
        )

    def __len__(self) -> int:
        return 0 if self._index is None else len(self._index)

    def num_batches(self, batch_size: int) -> int:
        denom = max(1, batch_size // (self.hp.num_augmented_samples + 1))
        return len(self) // denom

    # ----------------------------------------------------------- sampling

    def _gather(self, rows: np.ndarray) -> TrainBatch:
        """Assemble a TrainBatch for index rows (iter, env, step).

        Vectorized history gather: the L-step belief history of sample
        (e, t) is just rows ``t, t-1, …, t-L+1`` of the trajectory
        (zeroed where t-k < 0), so one fancy-index per window iteration
        replaces the former per-row/per-step Python copy loop and the
        host-side sampling cost no longer starves the device at the
        canonical workload (equivalence vs the naive loop is tested in
        tests/test_zero_selfplay.py::test_gather_vectorization_exact)."""
        world, hp = self.world, self.hp
        L = hp.input_history_length
        n = world.cfg.environment.num_cells
        B = len(rows)
        budget0 = np.float32(world.cfg.constraints.budget)
        covs = np.zeros((B, L, n, n), np.float32)
        poss = np.zeros((B, L, 3), np.float32)
        bfrs = np.zeros((B, L), np.float32)
        lens = np.zeros((B,), np.int32)
        means = np.zeros((B, n), np.float32)
        pols = np.zeros((B, world.num_actions), np.float32)
        vals = np.zeros((B,), np.float32)
        rews = np.zeros((B,), np.float32)
        msks = np.zeros((B, world.num_actions), np.float32)
        ks = np.arange(L)
        for it in np.unique(rows[:, 0]):
            sel = np.nonzero(rows[:, 0] == it)[0]
            e, t = rows[sel, 1], rows[sel, 2]
            traj = self._iters[int(it)]
            tk = t[:, None] - ks[None, :]  # (b, L) history step indices
            valid = tk >= 0
            tkc = np.maximum(tk, 0)
            eL = e[:, None]
            covs[sel] = traj.cov[eL, tkc] * valid[:, :, None, None]
            poss[sel] = traj.prev_pos[eL, tkc] * valid[:, :, None]
            bfrs[sel] = traj.budget[eL, tkc] / budget0 * valid
            lens[sel] = np.minimum(L, t + 1)
            means[sel] = traj.mean[e, t]
            pols[sel] = traj.policy[e, t]
            vals[sel] = traj.value[e, t]
            rews[sel] = traj.reward[e, t]
            msks[sel] = traj.valid_mask[e, t]

        planes = self._build_planes(
            jnp.asarray(covs), jnp.asarray(poss), jnp.asarray(bfrs),
            jnp.asarray(lens), jnp.asarray(means),
        )
        return TrainBatch(
            planes=planes,
            policy=jnp.asarray(pols),
            value=jnp.asarray(vals),
            reward=jnp.asarray(rews),
            valid_mask=jnp.asarray(msks),
            weight=jnp.ones((B,), jnp.float32),
        )

    # --------------------------------------- fused on-device epoch path
    #
    # Per-batch host→device round trips dominate the train loop on a
    # tunneled TPU (~0.5 s/batch measured vs ~1.4 ms of device compute).
    # The fused path keeps the whole replay window resident on device
    # (DeviceWindow), ships only the sampled (slot, env, step) index
    # rows + LR schedule per chunk, and runs gather → planes → train
    # step inside one lax.scan.

    def device_window(self, max_slots: int) -> Tuple[DeviceWindow, Dict[int, int]]:
        """Stack the live window on device, zero-padded to ``max_slots``.

        Returns (window, {iteration: slot}).  Iterations whose device
        copy is gone (e.g. after resume-from-disk) are uploaded once."""
        its = sorted(self._iters)
        assert len(its) <= max_slots, f"window {len(its)} > {max_slots} slots"
        fields = {}
        devs = []
        for it in its:
            d = self._dev_iters.get(it)
            if d is None:
                d = jax.tree_util.tree_map(jnp.asarray, self._iters[it])
                self._dev_iters[it] = d
            devs.append(d)
        for name in DeviceWindow._fields:
            parts = [getattr(d, name) for d in devs]
            pad = max_slots - len(parts)
            if pad:
                parts.extend([jnp.zeros_like(parts[0])] * pad)
            fields[name] = jnp.stack(parts, axis=0)
        return DeviceWindow(**fields), {it: k for k, it in enumerate(its)}

    def epoch_rows(
        self, num_steps: int, batch_size: int, rng: np.random.Generator,
        slot_map: Dict[int, int],
    ) -> np.ndarray:
        """Uniform-with-replacement samples for ``num_steps`` minibatches
        as (num_steps, draw, 3) int32 (slot, env, step) rows."""
        assert len(self) > 0, "empty replay buffer"
        draw = max(1, batch_size // (self.hp.num_augmented_samples + 1))
        idx = rng.integers(0, len(self), size=(num_steps, draw))
        rows = self._index[idx]  # (num_steps, draw, 3) — (iter, e, t)
        slots = np.vectorize(slot_map.__getitem__)(rows[..., 0])
        return np.stack([slots, rows[..., 1], rows[..., 2]], axis=-1).astype(
            np.int32
        )

    def _gather_device(self, win: DeviceWindow, rows: jnp.ndarray) -> TrainBatch:
        """In-jit equivalent of ``_gather`` against a DeviceWindow."""
        world, hp = self.world, self.hp
        L = hp.input_history_length
        dt = win.cov.dtype
        k, e, t = rows[:, 0], rows[:, 1], rows[:, 2]
        budget0 = jnp.asarray(world.cfg.constraints.budget, dt)
        ks = jnp.arange(L)
        tk = t[:, None] - ks[None, :]  # (B, L)
        valid = (tk >= 0).astype(dt)
        tkc = jnp.maximum(tk, 0)
        kL, eL = k[:, None], e[:, None]
        covs = win.cov[kL, eL, tkc] * valid[:, :, None, None]
        poss = win.prev_pos[kL, eL, tkc] * valid[:, :, None]
        bfrs = win.budget[kL, eL, tkc] / budget0 * valid
        lens = jnp.minimum(L, t + 1).astype(jnp.int32)
        means = win.mean[k, e, t]
        planes = jax.vmap(
            lambda c, p, b, l, m: planes_from_sample(world, hp, c, p, b, l, m)
        )(covs, poss, bfrs, lens, means)
        return TrainBatch(
            planes=planes,
            policy=win.policy[k, e, t],
            value=win.value[k, e, t],
            reward=win.reward[k, e, t],
            valid_mask=win.valid_mask[k, e, t],
            weight=jnp.ones((rows.shape[0],), dt),
        )

    def make_epoch_runner(self, train_step):
        """Returns jitted (state, win, rows, lrs, key) -> (state, metrics)
        scanning ``rows.shape[0]`` minibatches fully on device;
        ``metrics`` are stacked per step (host reads the last)."""

        def run(state, win: DeviceWindow, rows, lrs, key):
            keys = jax.random.split(key, rows.shape[0])

            def body(st, inp):
                rows_b, lr, kk = inp
                k_aug, k_drop = jax.random.split(kk)
                batch = self._gather_device(win, rows_b)
                batch = self._augment(batch, k_aug)
                st, metrics, _ = train_step(st, batch, k_drop, lr)
                return st, metrics

            return jax.lax.scan(body, state, (rows, lrs, keys))

        return jax.jit(run, donate_argnums=(0,))

    def _augment(self, batch: TrainBatch, key: jax.Array) -> TrainBatch:
        """Random-shift augmentation: replication-pad 4 + random crop
        (reference replay_buffers.py:58-75); targets are tiled."""
        k = self.hp.num_augmented_samples
        if k == 0:
            return batch
        planes = batch.planes
        B, H, W, C = planes.shape
        padded = jnp.pad(planes, ((0, 0), (4, 4), (4, 4), (0, 0)), mode="edge")
        shifts = jax.random.randint(key, (k, B, 2), 0, 9)

        def crop_one(img, sh):
            return jax.lax.dynamic_slice(img, (sh[0], sh[1], 0), (H, W, C))

        aug = [planes] + [
            jax.vmap(crop_one)(padded, shifts[j]) for j in range(k)
        ]
        tile = lambda x: jnp.concatenate([x] * (k + 1), axis=0)
        return TrainBatch(
            planes=jnp.concatenate(aug, axis=0),
            policy=tile(batch.policy),
            value=tile(batch.value),
            reward=tile(batch.reward),
            valid_mask=tile(batch.valid_mask),
            weight=tile(batch.weight),
        )

    def sample(
        self, batch_size: int, rng: np.random.Generator, key: jax.Array
    ) -> Tuple[TrainBatch, np.ndarray]:
        """Uniform sample with replacement (reference :90-101)."""
        assert len(self) > 0, "empty replay buffer"
        draw = max(1, batch_size // (self.hp.num_augmented_samples + 1))
        idx = rng.integers(0, len(self), size=draw)
        batch = self._gather(self._index[idx])
        batch = self._augment(batch, key)
        return batch, idx

    def step(self):
        pass

    def update(self, indices: np.ndarray, priorities: np.ndarray):
        pass


def per_sample_rows(
    priorities: jnp.ndarray,
    flat_valid: jnp.ndarray,
    alpha: float,
    beta: jnp.ndarray,
    n_valid: jnp.ndarray,
    key: jax.Array,
    draw: int,
):
    """PER draw: with-replacement categorical over softmax(α·log p)
    restricted to valid slots — the exact distribution of the host
    ``rng.choice(n, p=p^α/Σp^α)`` — plus β-annealed max-normalized
    importance weights (prob·n)^(−β) (reference replay_buffers.py:129-137).

    Returns (flat indices (draw,), (draw, 3) int32 (slot, env, step)
    rows, weights (draw,)).  Exposed for the host-equivalence test."""
    K, E, T = priorities.shape
    logits = jnp.where(flat_valid, alpha * jnp.log(priorities.reshape(-1)), -jnp.inf)
    flat_idx = jax.random.categorical(key, logits, shape=(draw,))
    logp = jax.nn.log_softmax(logits)
    w = jnp.exp(-beta * (logp[flat_idx] + jnp.log(n_valid)))
    w = w / jnp.max(w)
    rows = jnp.stack(
        [flat_idx // (E * T), (flat_idx // T) % E, flat_idx % T], axis=-1
    ).astype(jnp.int32)
    return flat_idx, rows, w


class PrioritizedReplayBuffer(ReplayBuffer):
    """α-priority sampling with β-annealed importance weights
    (reference replay_buffers.py:104-141)."""

    def __init__(
        self,
        world: IPPWorld,
        hp: MCTSZeroHyperParams,
        window_size: int,
    ):
        super().__init__(world, hp, window_size)
        self.alpha = hp.replay_alpha
        self.beta0 = hp.replay_beta0
        self.beta = hp.replay_beta0
        self._priorities: Optional[np.ndarray] = None
        self.total_steps = 1

    def _rebuild_index(self):
        old_len = 0 if self._index is None else len(self._index)
        super()._rebuild_index()
        n = len(self)
        if n:
            self._priorities = np.ones(n) / n
        else:
            self._priorities = None

    def begin_training(self, batch_size: int, num_epochs: int):
        self.total_steps = max(1, self.num_batches(batch_size) * num_epochs)
        self.beta = self.beta0

    def step(self):
        self.beta = min(self.beta + (1.0 - self.beta0) / self.total_steps, 1.0)

    def sample(
        self, batch_size: int, rng: np.random.Generator, key: jax.Array
    ) -> Tuple[TrainBatch, np.ndarray]:
        assert len(self) > 0, "empty replay buffer"
        draw = max(1, batch_size // (self.hp.num_augmented_samples + 1))
        probs = self._priorities**self.alpha
        probs = probs / probs.sum()
        idx = rng.choice(len(self), size=draw, p=probs)
        batch = self._gather(self._index[idx])
        weights = (probs[idx] * len(self)) ** (-self.beta)
        weights = weights / weights.max()
        batch = batch._replace(weight=jnp.asarray(weights, jnp.float32))
        batch = self._augment(batch, key)
        return batch, idx

    def update(self, indices: np.ndarray, priorities: np.ndarray):
        self._priorities[indices] = np.asarray(priorities)

    # ------------------------------------------------- fused PER path
    #
    # The host-loop PER pays ~0.5 s/batch of host↔device round trips on
    # the tunneled link (46× the fused uniform path) because priorities
    # must update between samples.  Fused variant: priorities live on
    # device as a (K, E, T) array aligned with the DeviceWindow slots;
    # each scan step samples WITH replacement from softmax(α·log p) over
    # the valid slots (identical to the host ``rng.choice(p=p^α/Σp^α)``
    # distribution), computes β-annealed importance weights in-scan, and
    # scatters the per-sample value losses back into the priorities —
    # zero host round trips per batch (reference replay_buffers.py:104-141).

    def device_valid(self, max_slots: int) -> jnp.ndarray:
        """(K, E, T) bool sample-validity mask aligned with device_window."""
        its = sorted(self._iters)
        parts = [jnp.asarray(self._iters[it].sample_ok) for it in its]
        pad = max_slots - len(parts)
        if pad:
            parts.extend([jnp.zeros_like(parts[0])] * pad)
        return jnp.stack(parts, axis=0).astype(bool)

    def init_device_priorities(self, valid: jnp.ndarray) -> jnp.ndarray:
        """Uniform 1/n over valid slots (host _rebuild_index parity)."""
        n = jnp.maximum(jnp.sum(valid), 1)
        return jnp.where(valid, 1.0 / n, 0.0).astype(jnp.float32)

    def make_per_epoch_runner(self, train_step, draw: int):
        """Returns jitted (state, priorities, win, valid, lrs, betas, key)
        -> (state, priorities, metrics); ``draw`` pre-augmentation batch
        rows per step.  Scans ``lrs.shape[0]`` minibatches fully on
        device, sampling from and updating the priorities in-carry."""
        alpha = self.alpha

        def run(state, priorities, win: DeviceWindow, valid, lrs, betas, key):
            K, E, T = priorities.shape
            n_valid = jnp.sum(valid).astype(jnp.float32)
            flat_valid = valid.reshape(-1)
            keys = jax.random.split(key, lrs.shape[0])

            def body(carry, inp):
                st, pri = carry
                lr, beta, kk = inp
                k_samp, k_aug, k_drop = jax.random.split(kk, 3)
                flat_idx, rows_b, w = per_sample_rows(
                    pri, flat_valid, alpha, beta, n_valid, k_samp, draw
                )
                batch = self._gather_device(win, rows_b)
                batch = batch._replace(weight=w.astype(batch.weight.dtype))
                batch = self._augment(batch, k_aug)
                st, metrics, value_l = train_step(st, batch, k_drop, lr)
                # last-wins scatter matches numpy fancy assignment for
                # duplicate draws (host ``update``)
                pri = (
                    pri.reshape(-1)
                    .at[flat_idx]
                    .set(value_l[:draw].astype(pri.dtype) + 1e-8)
                    .reshape(K, E, T)
                )
                return (st, pri), metrics

            (state, priorities), metrics = jax.lax.scan(
                body, (state, priorities), (lrs, betas, keys)
            )
            return state, priorities, metrics

        return jax.jit(run, donate_argnums=(0, 1))

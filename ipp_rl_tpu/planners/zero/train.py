"""Training step for the policy-value network.

Reproduces the reference optimization recipe (reference
planning/mcts_zero/network_wrappers/policy_value_network_wrappers.py:34-215):

  * SGD + momentum + (coupled) weight decay,
  * three-phase linear OneCycle LR (pct_start 0.40, phase-2 end 0.80,
    div_factor = max_lr/lr, final_div_factor 100 — reference :59-69),
  * global-norm gradient clipping (reference :169-171),
  * losses: masked policy cross-entropy −Σ π·log p·mask, value MSE on
    √-scaled targets, optional reward MSE / autoencoder reconstruction,
    entropy regularization subtracted, per-sample PER importance weights
    (reference :120-154, 251-272).

TPU-native: the step is one jitted function; data parallelism comes from
sharding the batch axis over the mesh's ``dp`` axis — XLA inserts the
gradient all-reduce from the sharding annotations, replacing the
reference's single-GPU loop + filesystem replay plumbing.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ipp_rl_tpu.config.schema import Config, MCTSZeroHyperParams
from ipp_rl_tpu.models.networks import PolicyValueNetwork


class TrainBatch(NamedTuple):
    """One replay minibatch; leading axis B."""

    planes: jnp.ndarray  # (B, S, S, C)
    policy: jnp.ndarray  # (B, A) — visit-count target
    value: jnp.ndarray  # (B,) — √-scaled n-step return
    reward: jnp.ndarray  # (B,)
    valid_mask: jnp.ndarray  # (B, A)
    weight: jnp.ndarray  # (B,) — PER importance weights (1.0 if uniform)


@struct.dataclass
class ZeroTrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # () int32

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def onecycle_lr(
    hp: MCTSZeroHyperParams, step: int, total_steps: int
) -> float:
    """LR at ``step`` of a torch-exact three-phase linear OneCycle.

    Reproduces ``torch.optim.lr_scheduler.OneCycleLR(max_lr, epochs,
    steps_per_epoch, div_factor=max_lr/lr, final_div_factor=100,
    anneal_strategy="linear", three_phase=True, pct_start=0.40)`` — the
    reference builds a FRESH one of these (and a fresh SGD) every
    self-play iteration with ``total_steps = num_epochs × num_batches``
    (reference network_wrappers/policy_value_network_wrappers.py:51-69).
    Phase milestones use torch's ``pct·total−1`` / ``2·pct·total−2`` /
    ``total−1`` endpoints so the emitted LR sequence is bit-identical to
    torch's (tested against the torch oracle in tests/test_zero.py).

    Pure host-side float math: the trained step consumes the LR as a
    runtime scalar, so one compiled program serves every iteration even
    though each iteration has a different schedule length.
    """
    initial_lr = hp.learning_rate  # max_lr / div_factor
    max_lr = hp.max_learning_rate
    min_lr = initial_lr / 100.0  # final_div_factor
    pct = 0.40
    total = max(total_steps, 1)
    p1_end = pct * total - 1.0
    p2_end = 2.0 * pct * total - 2.0
    p3_end = total - 1.0
    s = float(step)

    def lerp(a, b, frac):
        return a + (b - a) * frac

    if s <= p1_end:
        return lerp(initial_lr, max_lr, s / max(p1_end, 1e-12))
    if s <= p2_end:
        return lerp(max_lr, initial_lr, (s - p1_end) / max(p2_end - p1_end, 1e-12))
    return lerp(initial_lr, min_lr, (s - p2_end) / max(p3_end - p2_end, 1e-12))


def make_optimizer(hp: MCTSZeroHyperParams):
    """SGD(momentum, coupled weight decay) + global-norm clip, with the
    LR applied OUTSIDE the chain (the train step scales by a runtime-lr
    scalar).  Matches the reference order: clip grads, then SGD adds
    wd·param, then the momentum buffer, then −lr·buf (reference
    wrappers :51-56, :169-171)."""
    return optax.chain(
        optax.clip_by_global_norm(hp.max_grad_norm),
        optax.add_decayed_weights(hp.weight_decay),
        optax.trace(decay=hp.momentum, nesterov=False),
    )


def init_train_state(
    cfg: Config,
    hp: MCTSZeroHyperParams,
    key: jax.Array,
    input_size: Optional[int] = None,
    dtype=jnp.float32,
) -> Tuple[PolicyValueNetwork, ZeroTrainState]:
    """Initialize network parameters + optimizer state."""
    net = PolicyValueNetwork(hp=hp, num_actions=cfg.num_actions)
    s = input_size or cfg.environment.num_cells
    dummy_x = jnp.zeros((1, s, s, hp.input_channels), dtype)
    dummy_mask = jnp.ones((1, cfg.num_actions), dtype)
    variables = net.init(key, dummy_x, dummy_mask, train=False)
    tx = make_optimizer(hp)
    return net, ZeroTrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=tx.init(variables["params"]),
        step=jnp.int32(0),
    )


def reset_optimizer(hp: MCTSZeroHyperParams, state):
    """Fresh SGD state (zero momentum buffers, step 0) — the reference
    constructs a brand-new ``torch.optim.SGD`` every ``train()`` call
    (reference wrappers :51-56), so momentum does NOT carry across
    self-play iterations.  Works on shared and split states."""
    tx = make_optimizer(hp)
    if isinstance(state, SplitTrainState):
        return SplitTrainState(
            policy=reset_optimizer(hp, state.policy),
            value=reset_optimizer(hp, state.value),
        )
    return state.replace(opt_state=tx.init(state.params), step=jnp.int32(0))


def loss_fn(
    net: PolicyValueNetwork,
    hp: MCTSZeroHyperParams,
    params,
    batch_stats,
    batch: TrainBatch,
    dropout_rng: jax.Array,
):
    outs, mutated = net.apply(
        {"params": params, "batch_stats": batch_stats},
        batch.planes,
        batch.valid_mask,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": dropout_rng},
    )
    log_policy, value, reward, recon = outs

    policy_l = -jnp.sum(batch.policy * log_policy * batch.valid_mask, axis=-1)
    value_l = jnp.square(value - batch.value)
    entropy = -jnp.sum(jnp.exp(log_policy) * log_policy, axis=-1)

    total = (
        hp.policy_loss_coeff * policy_l
        + hp.value_loss_coeff * value_l
        - hp.entropy_regularization_coeff * entropy
    )
    metrics = {
        "policy_loss": jnp.mean(policy_l),
        "value_loss": jnp.mean(value_l),
        "entropy": jnp.mean(entropy),
    }
    if hp.use_reward_target:
        reward_l = jnp.square(reward - batch.reward)
        total = total + hp.reward_loss_coeff * reward_l
        metrics["reward_loss"] = jnp.mean(reward_l)
    if hp.use_autoencoder:
        target = batch.planes[..., 0]  # most-recent state plane
        recon_l = jnp.mean(
            jnp.square(target - recon).reshape(target.shape[0], -1), axis=-1
        )
        total = total + hp.reconstruction_loss_coeff * recon_l
        metrics["reconstruction_loss"] = jnp.mean(recon_l)

    total = total * batch.weight  # PER importance weights (reference :149)
    loss = jnp.mean(total)
    metrics["total_loss"] = loss
    return loss, (mutated["batch_stats"], metrics, value_l)


def make_train_step(net: PolicyValueNetwork, hp: MCTSZeroHyperParams):
    """Returns jitted (state, batch, rng, lr) -> (state, metrics,
    per-sample value losses for PER priority updates).

    ``lr`` is a runtime scalar: the caller evaluates the OneCycle
    schedule on host (``onecycle_lr``) so a single compiled program
    serves every self-play iteration's fresh schedule."""
    tx = make_optimizer(hp)

    @jax.jit
    def train_step(
        state: ZeroTrainState, batch: TrainBatch, rng: jax.Array, lr: jax.Array
    ):
        grad_fn = jax.value_and_grad(
            lambda p: loss_fn(net, hp, p, state.batch_stats, batch, rng),
            has_aux=True,
        )
        (loss, (new_stats, metrics, value_l)), grads = grad_fn(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        neg_lr = -jnp.asarray(lr)
        updates = jax.tree_util.tree_map(
            lambda u: (neg_lr * u).astype(u.dtype), updates
        )
        new_params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = ZeroTrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, metrics, value_l

    return train_step


def predict_fn(net: PolicyValueNetwork, dtype=None):
    """Inference: (variables, planes, mask) → (policy probs, value).

    The value head emits √-scaled values; invert v² + 2v for the true
    scale (reference wrappers :217-231).  This function is inlined into
    the jitted search step — the reference's batched inference server
    process (reference inference_workers.py:38-127) disappears.

    ``dtype=jnp.bfloat16`` runs the forward in bf16.  The returned
    function carries ``infer_dtype`` so ``ZeroMCTS.search`` casts the
    loop-invariant weights ONCE before the simulation loop (the cast
    here is then an identity); the plane cast fuses into the plane
    builder so the materialized leaf planes are half-width.  Outputs
    are returned in f32.  Search decision quality is preserved (tested
    in tests/test_zero_extras.py::test_bf16_inference_search_agreement);
    training always stays f32.
    """
    from ipp_rl_tpu.ops.rewards import invert_scaled_value_target

    def predict(variables, planes, valid_mask):
        if dtype is not None:
            variables = jax.tree_util.tree_map(
                lambda x: x.astype(dtype)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                variables,
            )
            planes = planes.astype(dtype)
        log_policy, value, _, _ = net.apply(
            variables, planes, valid_mask, train=False
        )
        log_policy = log_policy.astype(jnp.float32)
        value = value.astype(jnp.float32)
        return jnp.exp(log_policy), invert_scaled_value_target(value)

    predict.infer_dtype = dtype
    return predict


# --------------------------------------------------------------- split nets
#
# hp.shared_network = False trains independent policy / value networks
# with the same recipe (reference network_wrappers/policy_network_wrappers.py
# :34-217 — policy CE + entropy (+AE); value_network_wrappers.py:20-232 —
# value MSE (+reward)).


class SplitTrainState(NamedTuple):
    policy: ZeroTrainState
    value: ZeroTrainState

    def variables(self):
        return {
            "policy": self.policy.variables(),
            "value": self.value.variables(),
        }


def init_split_train_state(
    cfg: Config,
    hp: MCTSZeroHyperParams,
    key: jax.Array,
    dtype=jnp.float32,
):
    """Initialize split policy/value networks + optimizers."""
    from ipp_rl_tpu.models.networks import PolicyNetwork, ValueNetwork

    kp, kv = jax.random.split(key)
    s = cfg.environment.num_cells
    dummy_x = jnp.zeros((1, s, s, hp.input_channels), dtype)
    dummy_mask = jnp.ones((1, cfg.num_actions), dtype)
    tx = make_optimizer(hp)

    p_net = PolicyNetwork(hp=hp, num_actions=cfg.num_actions)
    p_vars = p_net.init(kp, dummy_x, dummy_mask, train=False)
    v_net = ValueNetwork(hp=hp, num_actions=cfg.num_actions)
    v_vars = v_net.init(kv, dummy_x, train=False)

    def mk(variables):
        return ZeroTrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", FrozenDict()),
            opt_state=tx.init(variables["params"]),
            step=jnp.int32(0),
        )

    return (p_net, v_net), SplitTrainState(policy=mk(p_vars), value=mk(v_vars))


def make_split_train_step(nets, hp: MCTSZeroHyperParams):
    """Joint step over both split networks; returns per-sample value
    losses for PER (as the shared path does).  ``lr`` is a runtime
    scalar as in ``make_train_step``."""
    p_net, v_net = nets
    tx = make_optimizer(hp)

    def policy_loss_fn(params, batch_stats, batch: TrainBatch, rng):
        log_policy, mutated = p_net.apply(
            {"params": params, "batch_stats": batch_stats},
            batch.planes,
            batch.valid_mask,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        pl = -jnp.sum(batch.policy * log_policy * batch.valid_mask, axis=-1)
        ent = -jnp.sum(jnp.exp(log_policy) * log_policy, axis=-1)
        total = pl - hp.entropy_regularization_coeff * ent
        loss = jnp.mean(total * batch.weight)
        return loss, (mutated["batch_stats"], jnp.mean(pl), jnp.mean(ent))

    def value_loss_fn(params, batch_stats, batch: TrainBatch, rng):
        (value, reward), mutated = v_net.apply(
            {"params": params, "batch_stats": batch_stats},
            batch.planes,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        vl = jnp.square(value - batch.value)
        total = hp.value_loss_coeff * vl
        if hp.use_reward_target:
            total = total + hp.reward_loss_coeff * jnp.square(reward - batch.reward)
        loss = jnp.mean(total * batch.weight)
        return loss, (mutated["batch_stats"], vl)

    @jax.jit
    def train_step(
        state: SplitTrainState, batch: TrainBatch, rng: jax.Array, lr: jax.Array
    ):
        rp, rv = jax.random.split(rng)
        neg_lr = -jnp.asarray(lr)
        scale = lambda upd: jax.tree_util.tree_map(
            lambda u: (neg_lr * u).astype(u.dtype), upd
        )
        (pl_loss, (p_stats, pl, ent)), p_grads = jax.value_and_grad(
            lambda p: policy_loss_fn(p, state.policy.batch_stats, batch, rp),
            has_aux=True,
        )(state.policy.params)
        p_upd, p_opt = tx.update(p_grads, state.policy.opt_state, state.policy.params)
        new_policy = ZeroTrainState(
            params=optax.apply_updates(state.policy.params, scale(p_upd)),
            batch_stats=p_stats,
            opt_state=p_opt,
            step=state.policy.step + 1,
        )
        (v_loss, (v_stats, value_l)), v_grads = jax.value_and_grad(
            lambda p: value_loss_fn(p, state.value.batch_stats, batch, rv),
            has_aux=True,
        )(state.value.params)
        v_upd, v_opt = tx.update(v_grads, state.value.opt_state, state.value.params)
        new_value = ZeroTrainState(
            params=optax.apply_updates(state.value.params, scale(v_upd)),
            batch_stats=v_stats,
            opt_state=v_opt,
            step=state.value.step + 1,
        )
        metrics = {
            "policy_loss": pl,
            "entropy": ent,
            "value_loss": jnp.mean(value_l),
            "total_loss": pl_loss + v_loss,
            "grad_norm": optax.global_norm(p_grads) + optax.global_norm(v_grads),
        }
        return SplitTrainState(new_policy, new_value), metrics, value_l

    return train_step


def split_predict_fn(nets, dtype=None):
    """Inference over split nets: mirrors predict_fn's interface with
    variables = {"policy": ..., "value": ...} (incl. the optional bf16
    inference dtype)."""
    from ipp_rl_tpu.ops.rewards import invert_scaled_value_target

    p_net, v_net = nets

    def predict(variables, planes, valid_mask):
        if dtype is not None:
            variables = jax.tree_util.tree_map(
                lambda x: x.astype(dtype)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                variables,
            )
            planes = planes.astype(dtype)
        log_policy = p_net.apply(variables["policy"], planes, valid_mask, train=False)
        value, _ = v_net.apply(variables["value"], planes, train=False)
        log_policy = log_policy.astype(jnp.float32)
        value = value.astype(jnp.float32)
        return jnp.exp(log_policy), invert_scaled_value_target(value)

    predict.infer_dtype = dtype
    return predict


def inference_dtype(hp: MCTSZeroHyperParams):
    """Map hp.inference_dtype to the jnp dtype for predict_fn (None = f32)."""
    return jnp.bfloat16 if hp.inference_dtype == "bfloat16" else None

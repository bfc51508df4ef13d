"""Flax building blocks for the policy-value CNN.

Re-designs the reference's torch modules (reference
planning/common/layers.py:5-346) in flax.linen, NHWC layout (TPU-native
conv layout).  Notable reference behaviors preserved:

  * ERFNet-style ``NonBottleneck1d`` separable 3×1/1×3 residual blocks
    (reference layers.py:40-100),
  * KataGo-style ``MixGlobalContext`` — global avg‖max statistics of the
    first G channels broadcast-added into the remaining C−G channels
    (reference layers.py:103-148),
  * the encoder reuses ONE block instance per (kind, stride), i.e.
    weights are shared across repeated depth positions (reference
    layers.py:186-223 instantiates each block once and calls it in the
    loop) — flax shares parameters the same way when a submodule defined
    in setup() is called repeatedly,
  * explicit torch-convention padding so spatial sizes match exactly.

BatchNorm runs in batch-stats mode during training and running-average
mode for inference (the reference uses torch BatchNorm2d throughout).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn


def nonlinearity_fn(use_silu: bool) -> Callable:
    return nn.silu if use_silu else nn.relu


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm (reference layers.py:5-8)."""

    features: int
    kernel: tuple
    stride: int = 1
    padding: int = 0
    dilation: tuple = (1, 1)
    use_bias: bool = False
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = self.kernel
        dh, dw = self.dilation
        pad = (
            ((kh - 1) // 2 * dh, (kh - 1) // 2 * dh),
            ((kw - 1) // 2 * dw, (kw - 1) // 2 * dw),
        ) if self.padding == -1 else (
            (self.padding, self.padding),
            (self.padding, self.padding),
        )
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=(self.stride, self.stride),
            padding=pad,
            kernel_dilation=self.dilation,
            use_bias=self.use_bias,
        )(x)
        return nn.BatchNorm(
            use_running_average=not train, epsilon=self.bn_eps, momentum=0.9
        )(x)


class GlobalPooling(nn.Module):
    """Global avg‖max pooling → (B, 2C) (reference layers.py:151-161)."""

    @nn.compact
    def __call__(self, x):
        return jnp.concatenate([jnp.mean(x, axis=(1, 2)), jnp.max(x, axis=(1, 2))], axis=-1)


class ResidualBlock(nn.Module):
    """Plain 3×3 res block (reference layers.py:11-37)."""

    features: int
    stride: int = 1
    dropout: float = 0.0
    use_silu: bool = True
    use_1x1conv: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = nonlinearity_fn(self.use_silu)
        identity = (
            nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride))(x)
            if self.use_1x1conv
            else x
        )
        out = ConvBN(self.features, (3, 3), self.stride, 1)(x, train)
        out = act(out)
        out = ConvBN(self.features, (3, 3), 1, 1)(out, train)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return act(out + identity)


class NonBottleneck1d(nn.Module):
    """Separable factorized 3×1/1×3 residual block, ERFNet-style
    (reference layers.py:40-100)."""

    features: int
    dilated: int = 1
    dropout: float = 0.0
    use_silu: bool = True
    use_1x1conv: bool = False
    down_sample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = nonlinearity_fn(self.use_silu)
        if self.down_sample:
            x = nn.Conv(
                self.features, (1, 1), strides=(2, 2), use_bias=False
            )(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = act(x)

        x = (
            nn.Conv(self.features, (1, 1), strides=(1, 1))(x)
            if self.use_1x1conv
            else x
        )
        out = nn.Conv(self.features, (3, 1), padding=((1, 1), (0, 0)))(x)
        out = act(out)
        out = nn.Conv(self.features, (1, 3), padding=((0, 0), (1, 1)))(out)
        out = nn.BatchNorm(use_running_average=not train, epsilon=1e-3)(out)
        out = act(out)
        d = self.dilated
        out = nn.Conv(
            self.features, (3, 1), padding=((d, d), (0, 0)), kernel_dilation=(d, 1)
        )(out)
        out = act(out)
        out = nn.Conv(
            self.features, (1, 3), padding=((0, 0), (d, d)), kernel_dilation=(1, d)
        )(out)
        out = nn.BatchNorm(use_running_average=not train, epsilon=1e-3)(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return act(out + x)


class MixGlobalContext(nn.Module):
    """Global-context mixing block (reference layers.py:103-148): pooled
    statistics of the first G channels are broadcast into the rest."""

    features: int
    num_global_pooling_channels: int = 32
    stride: int = 1
    dropout: float = 0.0
    use_silu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = nonlinearity_fn(self.use_silu)
        g = self.num_global_pooling_channels
        assert g < self.features, (
            f"num_global_pooling_channels ({g}) must be < num_channels "
            f"({self.features})"
        )
        identity = (
            nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride))(x)
            if self.stride > 1
            else x
        )
        out = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            use_bias=False,
        )(x)
        pool = out[..., :g]
        pool = nn.BatchNorm(use_running_average=not train)(pool)
        pool = act(pool)
        pool = GlobalPooling()(pool)  # (B, 2G)
        pool = nn.Dense(self.features - g)(pool)
        pool = act(pool)
        out = jnp.concatenate(
            [out[..., :g], out[..., g:] + pool[:, None, None, :]], axis=-1
        )
        out = ConvBN(self.features, (3, 3), 1, 1)(out, train)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return act(out + identity)


class Encoder(nn.Module):
    """7×7 s2 stem + N residual blocks; stride-2 at i ∈ {0, 1, 3, 5};
    MixGlobalContext replaces every block with i > 0, i % 3 == 0
    (reference layers.py:164-223).  One instance per (kind, stride) —
    weights shared across repeated positions, as in the reference."""

    input_channels: int
    features: int
    num_res_blocks: int
    dropout: float = 0.0
    use_silu: bool = True
    use_separable: bool = True
    use_global_context: bool = True
    num_global_pooling_channels: int = 32

    def setup(self):
        self.stem = ConvBN(self.features, (7, 7), 2, 3, name="stem")
        kw = dict(dropout=self.dropout, use_silu=self.use_silu)
        if self.use_separable:
            self.block_s1 = NonBottleneck1d(
                self.features, 1, use_1x1conv=True, down_sample=False, **kw
            )
            self.block_s2 = NonBottleneck1d(
                self.features, 1, use_1x1conv=True, down_sample=True, **kw
            )
        else:
            self.block_s1 = ResidualBlock(
                self.features, 1, use_1x1conv=True, **kw
            )
            self.block_s2 = ResidualBlock(
                self.features, 2, use_1x1conv=True, **kw
            )
        self.mix_s1 = MixGlobalContext(
            self.features,
            self.num_global_pooling_channels,
            stride=1,
            **kw,
        )
        self.mix_s2 = MixGlobalContext(
            self.features,
            self.num_global_pooling_channels,
            stride=2,
            **kw,
        )

    def __call__(self, x, train: bool = False):
        act = nonlinearity_fn(self.use_silu)
        x = act(self.stem(x, train))
        for i in range(self.num_res_blocks):
            stride = 2 if i in (0, 1, 3, 5) else 1
            if i > 0 and i % 3 == 0 and self.use_global_context:
                x = self.mix_s1(x, train) if stride == 1 else self.mix_s2(x, train)
            else:
                x = self.block_s2(x, train) if stride == 2 else self.block_s1(x, train)
        return x


class Decoder(nn.Module):
    """Transposed-conv reconstruction head (reference layers.py:226-252)."""

    features: int
    dropout: float = 0.0
    use_silu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = nonlinearity_fn(self.use_silu)
        c = self.features
        x = nn.ConvTranspose(c // 2, (2, 2), strides=(2, 2))(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = act(x)
        x = ConvBN(c // 4, (3, 3), 1, 1)(x, train)
        x = act(x)
        x = nn.ConvTranspose(c // 8, (2, 2), strides=(2, 2))(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = act(x)
        x = ConvBN(1, (3, 3), 1, 1)(x, train)
        return x[..., 0]


class ValueHead(nn.Module):
    """Convs → global pool → Dense(2C, 1) → act → softplus
    (reference layers.py:255-298).

    ``unfloored=True`` drops the activation between Dense and softplus:
    the reference's Linear → SiLU → Softplus composition has minimum
    output softplus(min SiLU) ≈ 0.5636, so √-scaled value targets below
    that (raw 5-step returns < 1.45 — 55% of canonical adaptive
    self-play samples, every late-episode state) are unrepresentable
    and the learned value cannot rank depleted regions.  Linear →
    Softplus has range (0, ∞).  Documented deviation, off by default
    (hp.unfloored_value_head)."""

    features: int
    num_blocks: int
    dropout: float = 0.0
    use_silu: bool = True
    use_reward_target: bool = False
    use_global_context: bool = True
    num_global_pooling_channels: int = 32
    unfloored: bool = False

    def setup(self):
        kw = dict(dropout=self.dropout, use_silu=self.use_silu)
        self.mix = MixGlobalContext(
            self.features, self.num_global_pooling_channels, stride=1, **kw
        )
        self.conv_block = ConvBN(self.features, (3, 3), 1, 1)
        self.pool = GlobalPooling()
        self.head = nn.Dense(1)

    def __call__(self, x, train: bool = False):
        act = nonlinearity_fn(self.use_silu)
        for i in range(self.num_blocks):
            if i == 0 and self.use_global_context:
                x = self.mix(x, train)
            else:
                x = act(self.conv_block(x, train))
        x = self.pool(x)
        head_act = (lambda z: z) if self.unfloored else act
        value = nn.softplus(head_act(self.head(x)))[:, 0]
        reward = (
            nn.softplus(head_act(self.head(x)))[:, 0]
            if self.use_reward_target
            else None
        )
        return value, reward


class PolicyHead(nn.Module):
    """Convs → global pool → Dense(2C, A) → invalid-logit −1000 mask →
    log-softmax (reference layers.py:301-346)."""

    features: int
    num_blocks: int
    num_actions: int
    dropout: float = 0.0
    use_silu: bool = True
    mask_policy: bool = True
    use_global_context: bool = True
    num_global_pooling_channels: int = 32

    def setup(self):
        kw = dict(dropout=self.dropout, use_silu=self.use_silu)
        self.mix = MixGlobalContext(
            self.features, self.num_global_pooling_channels, stride=1, **kw
        )
        self.conv_block = ConvBN(self.features, (3, 3), 1, 1)
        self.pool = GlobalPooling()
        self.head = nn.Dense(self.num_actions)

    def __call__(self, x, valid_mask, train: bool = False):
        act = nonlinearity_fn(self.use_silu)
        for i in range(self.num_blocks):
            if i == 0 and self.use_global_context:
                x = self.mix(x, train)
            else:
                x = act(self.conv_block(x, train))
        x = self.pool(x)
        logits = self.head(x)
        if self.mask_policy:
            logits = logits - (1.0 - valid_mask.astype(logits.dtype)) * 1000.0
        return nn.log_softmax(logits, axis=-1)

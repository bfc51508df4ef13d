"""Policy-value networks (reference planning/mcts_zero/networks/).

``PolicyValueNetwork``: shared encoder → policy head + value head
(+ optional decoder reconstruction), exactly the reference composition
(reference networks/policy_value_networks.py:12-69).  Split variants
mirror networks/policy_networks.py:12-58 and value_networks.py:12-53.

Inputs are NHWC (B, S, S, C) with S = num_grid_cells (the feature planes
are covariance-matrix-sized, reference planning/common/features.py:36).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ipp_rl_tpu.config.schema import Config, MCTSZeroHyperParams
from ipp_rl_tpu.models.layers import Decoder, Encoder, PolicyHead, ValueHead


class PolicyValueNetwork(nn.Module):
    hp: MCTSZeroHyperParams
    num_actions: int

    def setup(self):
        hp = self.hp
        common = dict(
            dropout=hp.dropout,
            use_silu=hp.use_silu,
            use_global_context=hp.use_global_context_mixing,
            num_global_pooling_channels=hp.num_global_pooling_channels,
        )
        self.encoder = Encoder(
            input_channels=hp.input_channels,
            features=hp.num_channels,
            num_res_blocks=hp.num_encoder_res_blocks,
            dropout=hp.dropout,
            use_silu=hp.use_silu,
            use_separable=hp.use_separable_conv_layers,
            use_global_context=hp.use_global_context_mixing,
            num_global_pooling_channels=hp.num_global_pooling_channels,
        )
        self.policy_head = PolicyHead(
            features=hp.num_channels,
            num_blocks=hp.num_policy_head_conv_bn_blocks,
            num_actions=self.num_actions,
            mask_policy=hp.mask_policy_head,
            **common,
        )
        self.value_head = ValueHead(
            features=hp.num_channels,
            num_blocks=hp.num_value_head_conv_bn_blocks,
            use_reward_target=hp.use_reward_target,
            unfloored=hp.unfloored_value_head,
            **common,
        )
        if hp.use_autoencoder:
            self.decoder = Decoder(
                hp.num_channels, dropout=hp.dropout, use_silu=hp.use_silu
            )

    def __call__(
        self, x: jnp.ndarray, valid_mask: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        """x: (B, S, S, C) planes; valid_mask: (B, A).

        Returns (log_policy (B, A), value (B,), reward (B,)|None,
        reconstruction (B, h, w)|None)."""
        feat = self.encoder(x, train)
        log_policy = self.policy_head(feat, valid_mask, train)
        value, reward = self.value_head(feat, train)
        recon = self.decoder(feat, train) if self.hp.use_autoencoder else None
        return log_policy, value, reward, recon


class PolicyNetwork(nn.Module):
    """Split policy-only net (reference networks/policy_networks.py:12-58)."""

    hp: MCTSZeroHyperParams
    num_actions: int

    @nn.compact
    def __call__(self, x, valid_mask, train: bool = False):
        hp = self.hp
        feat = Encoder(
            input_channels=hp.input_channels,
            features=hp.num_channels,
            num_res_blocks=hp.num_encoder_res_blocks,
            dropout=hp.dropout,
            use_silu=hp.use_silu,
            use_separable=hp.use_separable_conv_layers,
            use_global_context=hp.use_global_context_mixing,
            num_global_pooling_channels=hp.num_global_pooling_channels,
        )(x, train)
        return PolicyHead(
            features=hp.num_channels,
            num_blocks=hp.num_policy_head_conv_bn_blocks,
            num_actions=self.num_actions,
            dropout=hp.dropout,
            use_silu=hp.use_silu,
            mask_policy=hp.mask_policy_head,
            use_global_context=hp.use_global_context_mixing,
            num_global_pooling_channels=hp.num_global_pooling_channels,
        )(feat, valid_mask, train)


class ValueNetwork(nn.Module):
    """Split value-only net (reference networks/value_networks.py:12-53)."""

    hp: MCTSZeroHyperParams
    num_actions: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        hp = self.hp
        feat = Encoder(
            input_channels=hp.input_channels,
            features=hp.num_channels,
            num_res_blocks=hp.num_encoder_res_blocks,
            dropout=hp.dropout,
            use_silu=hp.use_silu,
            use_separable=hp.use_separable_conv_layers,
            use_global_context=hp.use_global_context_mixing,
            num_global_pooling_channels=hp.num_global_pooling_channels,
        )(x, train)
        return ValueHead(
            features=hp.num_channels,
            num_blocks=hp.num_value_head_conv_bn_blocks,
            dropout=hp.dropout,
            use_silu=hp.use_silu,
            use_reward_target=hp.use_reward_target,
            use_global_context=hp.use_global_context_mixing,
            num_global_pooling_channels=hp.num_global_pooling_channels,
            unfloored=hp.unfloored_value_head,
        )(feat, train)


def build_network(cfg: Config, hp: MCTSZeroHyperParams) -> PolicyValueNetwork:
    return PolicyValueNetwork(hp=hp, num_actions=cfg.num_actions)

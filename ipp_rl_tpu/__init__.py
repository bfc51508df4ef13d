"""ipp_rl_tpu — TPU-native informative path planning + RL framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
dmar-bonn/ipp-rl (ICRA 2022, arXiv 2109.13570): a UAV plans measurement
positions over a 2-D scalar field, maintains a Kalman-filter belief
(mean + full covariance) over a grid map, and maximizes uncertainty
reduction per unit travel budget.  Planners: static baselines
(lawnmower / spiral / random), greedy, classic MCTS, CMA-ES, and the
flagship AlphaZero-style "MCTS-zero" with a learned policy-value CNN
trained by self-play.

Design stance (TPU-first, not a port):
  * the unit of work is a *mission batch* ``(B, ...)`` living on device;
  * every subsystem is a pure function over one state pytree;
  * the action lattice is finite and config-static, so all measurement
    models (H, R, block-mean matrices) are precomputed constants baked
    into the compiled program;
  * planner sweeps need only the whitened gain factor Wc = P Hᵀ L⁻ᵀ
    (trace reduction = ‖Wc‖²_F), never the full posterior covariance;
  * episode loops are ``lax.scan`` with per-mission active masks;
  * multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map`` over a
    mission axis (psum replaces the reference's root-merging pools).
"""

__version__ = "0.1.0"

from ipp_rl_tpu.config.schema import Config, load_config  # noqa: F401

"""Device-mesh utilities: the multi-chip story.

The reference scales with process pools and filesystem queues
(SURVEY.md §2 parallelism inventory); here everything maps onto one
global device mesh:

  * axis ``dp``  — mission/data parallelism: self-play env batches,
    replay batches, root-parallel search trees are sharded over it and
    reduced with psum (replacing the reference's root merging,
    reference planning/mcts_zero/mcts_zero_mission.py:516-521);
  * axis ``mp``  — optional model/state parallelism for large grids:
    the (N, N) covariance and its KF update shard over rows
    (ops covariance sharding — the framework's "sequence parallel").

On a single host, ``make_mesh`` builds the mesh from local devices;
multi-host initialization goes through ``jax.distributed.initialize``
before calling it (all processes see the global mesh).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    mp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp, mp) mesh.  Defaults: all visible devices on dp."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    total = len(devs)
    if dp is None:
        assert total % mp == 0, f"{total} devices not divisible by mp={mp}"
        dp = total // mp
    assert dp * mp == total, f"mesh {dp}x{mp} != {total} devices"
    arr = np.asarray(devs).reshape(dp, mp)
    return Mesh(arr, axis_names=("dp", "mp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (mission/batch) axis over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree with leading batch axes onto the mesh (dp-sharded)."""
    sh = batch_sharding(mesh)

    def place(x):
        spec = P(*(("dp",) + (None,) * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Mesh:
    """Initialize JAX distributed across hosts and return the global mesh.

    Replaces the reference's single-host multiprocessing architecture
    (SURVEY.md §5 communication inventory): one ``jax.distributed``
    runtime, one global (dp, mp) mesh spanning every chip on every host.
    Mission batches shard over dp (ICI within a slice, DCN across
    hosts); covariance rows shard over mp for large grids
    (parallel/sharded_kalman.py).

    On a single host this is a no-op wrapper around make_mesh().
    Multi-host usage (same invocation on every host):

        mesh = initialize_multihost("10.0.0.1:1234", num_processes=4,
                                    process_id=int(os.environ["TASK_ID"]))
    """
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return make_mesh()

"""Subprocess body for the 2-process multihost test.

Each process owns 4 virtual CPU devices; `initialize_multihost` joins
them into one 8-device global runtime (the TPU-pod topology in
miniature: one jax process per host, `jax.distributed` for rendezvous,
collectives over the global mesh).  Validates the path the reference
covers with multiprocessing pools + filesystem queues
(reference planning/mcts_zero/mcts_zero_mission.py:516-521) — here it
is one SPMD program over a global (dp, mp) mesh.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
Prints "MULTIHOST_OK <psum> <ndev>" on success.
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    # fresh flags: each process gets exactly 4 virtual CPU devices
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    # the axon plugin's sitecustomize overrides JAX_PLATFORMS (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ipp_rl_tpu.parallel.mesh import initialize_multihost

    mesh = initialize_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    ndev = mesh.devices.size
    assert ndev == 4 * nproc, f"global mesh has {ndev} devices, want {4 * nproc}"
    assert jax.process_count() == nproc

    # one dp-sharded global array built from process-local shards, reduced
    # with a mesh collective — the minimal end-to-end multihost program
    B = 2 * ndev
    sharding = NamedSharding(mesh, P("dp"))
    global_vals = np.arange(B, dtype=np.float64)
    arr = jax.make_array_from_callback(
        (B,), sharding, lambda idx: global_vals[idx]
    )

    @jax.jit
    def total(x):
        return jnp.sum(x)  # XLA inserts the cross-process all-reduce

    out = float(total(arr))
    expect = float(global_vals.sum())
    assert out == expect, f"psum {out} != {expect}"
    print(f"MULTIHOST_OK {out} {ndev}", flush=True)


if __name__ == "__main__":
    main()

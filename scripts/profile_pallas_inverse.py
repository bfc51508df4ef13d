"""VERDICT r4 weak #8: does `spd_inverse_pallas` beat the unrolled XLA
small-SPD inverse on-chip at the sweep's real shapes?  Measures both at
(B·A, 9, 9) batches with the K-scan methodology (K=50 — the tunnel's
~29 ms fixed dispatch overhead biases K=10 rows by ~3 ms/iter).

The committed decision lives in docs/PERFORMANCE.md ("Pallas inverse"
subsection); ops/kalman._USE_PALLAS_INVERSE stays default-off unless
this script shows a win.

Run on the real chip:  python scripts/profile_pallas_inverse.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ipp_rl_tpu.ops import kalman
from ipp_rl_tpu.ops.pallas_kernels import spd_inverse_pallas


def scan_time(name, body, init, K=50, repeats=3):
    @jax.jit
    def block(c):
        def step(c, _):
            return body(c), None

        c, _ = jax.lax.scan(step, c, None, length=K)
        return c

    out = jax.block_until_ready(block(init))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(block(out))
        ts.append((time.perf_counter() - t0) / K)
    print(f"{name:52s} {min(ts)*1e3:9.3f} ms/iter")
    return min(ts) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--actions", type=int, default=200)
    args = ap.parse_args()
    B, A, M = args.batch, args.actions, 9

    S0 = 0.1 * jax.random.normal(jax.random.key(3), (B * A, M, M), jnp.float32)
    S0 = 0.5 * (S0 + jnp.swapaxes(S0, -1, -2)) + 9.0 * jnp.eye(M)
    print(f"shape=({B}*{A}, {M}, {M})  device={jax.devices()[0]}")

    def evolve(S, Si):
        # keep the carry changing and well-conditioned (identical inputs
        # hit the tunnel's result cache; the perturbation must exceed
        # the f32 ulp at S ~ 9.0, i.e. ~1e-6 — the original 1e-6*Si
        # (delta ~1e-7) was an EXACT fixpoint and read 0.001 ms/iter)
        S = 0.999 * S + 1e-2 * Si
        return 0.5 * (S + jnp.swapaxes(S, -1, -2)) + 1e-3 * jnp.eye(M)

    def xla_body(S):
        Si = kalman._small_spd_inverse(S)
        return evolve(S, Si)

    t_xla = scan_time("unrolled XLA inverse (ops/smallchol path)", xla_body, S0)

    def pallas_body(S):
        Si = spd_inverse_pallas(S)
        return evolve(S, Si)

    t_pal = scan_time("spd_inverse_pallas", pallas_body, S0)

    # agreement check
    Si_x = kalman._small_spd_inverse(S0[:64])
    Si_p = spd_inverse_pallas(S0[:64])
    err = float(jnp.max(jnp.abs(Si_x - Si_p)))
    print(f"max |xla - pallas| on 64 samples: {err:.3e}")
    print(f"verdict: {'PALLAS WINS' if t_pal < t_xla else 'XLA WINS'} "
          f"({t_pal:.2f} vs {t_xla:.2f} ms/iter)")


if __name__ == "__main__":
    main()

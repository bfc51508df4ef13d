"""Micro-roofline calibration: what do batched GEMMs/elementwise ops on
(B, 100, 100) tensors actually cost on this chip?  Pins whether the
10.5 ms commit is GEMM-shape-bound or something else.

Run:  python scripts/profile_micro.py [--batch 4096]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def scan_time(name, body, init, K=10, repeats=3):
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
    args = ap.parse_args()
    B, N, M = args.batch, 100, 9

    k0 = jax.random.key(0)
    P = jax.random.normal(k0, (B, N, N), jnp.float32)
    Hb = jax.random.normal(k0, (B, M, N), jnp.float32)
    Kb = jax.random.normal(k0, (B, N, M), jnp.float32)
    print(f"batch={B}  device={jax.devices()[0]}")

    # NOTE: carries must neither saturate nor repeat — the axon remote
    # executor appears to cache (program, input)-identical executions,
    # which made early versions of the pure-GEMM rows read 6 us/iter.
    def renorm(out):
        return out * jax.lax.rsqrt(jnp.mean(out * out) + 1.0)

    # traffic yardstick: one full read+write of P (328 MB @ B=4096)
    scan_time("P*1.0001 + 1e-6 (elementwise, 2 pass)", lambda P: P * 1.0001 + 1e-6, P)
    scan_time(
        "0.5*(P+P^T) batched symmetrize",
        lambda P: 0.5 * (P + jnp.swapaxes(P, -1, -2)) + 1e-6,
        P,
    )
    scan_time(
        "batched GEMM (N,N)x(N,N) f32",
        lambda P: renorm(
            jnp.einsum("bnc,bcm->bnm", P, P, preferred_element_type=jnp.float32)
        ),
        P,
    )
    scan_time(
        "batched GEMM (N,N)x(N,N) bf16->f32",
        lambda P: renorm(
            jnp.einsum(
                "bnc,bcm->bnm",
                P.astype(jnp.bfloat16),
                P.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        ),
        P,
    )

    def k100(P):
        out = jnp.einsum("bnc,bmc->bnm", P, Hb, preferred_element_type=jnp.float32)
        return P + 1e-9 * out[:, :, :1]

    scan_time("batched GEMM (N,N)x(N,M) f32  k=100", k100, P)

    # loop-dependence guard: scale one operand by a scalar derived from
    # the carry so XLA cannot hoist the GEMM out of the scan (adds one
    # ~0.2 ms read pass of P — same for every guarded row)
    def k9(P):
        Kd = Kb * (1.0 + 1e-12 * jnp.mean(P))
        out = jnp.einsum("bnm,bmc->bnc", Kd, Hb, preferred_element_type=jnp.float32)
        return P + 1e-9 * out

    scan_time("batched GEMM (N,M)x(M,N) f32  k=9", k9, P)

    def k9_bf16(P):
        Kd = Kb * (1.0 + 1e-12 * jnp.mean(P))
        out = jnp.einsum(
            "bnm,bmc->bnc",
            Kd.astype(jnp.bfloat16),
            Hb.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return P + 1e-9 * out

    scan_time("batched GEMM (N,M)x(M,N) bf16 k=9", k9_bf16, P)

    # the sweep's big dense stage-1 GEMM shape: (A*M, N) x (B, N, N)
    Hf = jax.random.normal(k0, (900, N), jnp.bfloat16)

    def stage1(P):
        T = jax.lax.dot_general(
            Hf,
            P.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (2,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        )
        return P + 1e-9 * T[0].astype(jnp.float32)[:, :, None]

    scan_time("dense stage-1 (900,100)x(B,N,N) bf16", stage1, P)

    # layout-aware variants: the M=9 axis in the SUBLANE position —
    # operands (B, M, N), never an (B, ..., 9)-minor array
    def k9_sublane(P):
        # contraction over the 9-dim sublane axis of two (B, 9, 100)s
        Hd = Hb * (1.0 + 1e-12 * jnp.mean(P))
        out = jnp.einsum("bmn,bmc->bnc", Hd, Hb, preferred_element_type=jnp.float32)
        return P + 1e-9 * out

    scan_time("batched GEMM (M,N)'x(M,N) f32 sublane-9", k9_sublane, P)

    def hp_layout(P):
        # A = H·P: contraction over n, output (B, 9, 100) — minor is N
        A = jnp.einsum("bmn,bnc->bmc", Hb, P, preferred_element_type=jnp.float32)
        return P + 1e-9 * A[:, :1, :].swapaxes(1, 2)

    scan_time("batched A=H@P (out B,9,100) f32", hp_layout, P)

    # the full layout-aware rank-M Joseph commit (ops/kalman.kf_update r5.1)
    from ipp_rl_tpu.ops import kalman

    Rb = jnp.ones((B, M), jnp.float32)

    def joseph_chain(P):
        _, P2 = jax.vmap(
            lambda P1, h, r: kalman.kf_update(
                P1, jnp.zeros(P1.shape[-1], P1.dtype), h, r
            )
        )(0.5 * (P + jnp.swapaxes(P, -1, -2)) + 100.0 * jnp.eye(N), Hb, Rb)
        return P + 1e-6 * (P2 - P)

    scan_time("full layout-aware Joseph commit", joseph_chain, P)


if __name__ == "__main__":
    main()

"""MXU rate of the candidate wgrad matmul shapes (throughput work).

The conv wgrad for the Spectral2DCNN trunk is a contraction over
K = B*F*T producing the (5, 13, 64, 64) kernel.  How it is framed as a
matmul decides MXU utilization:

  naive      (4160, K) x (K, 64)   — N=64: half the MXU lanes idle
  tap-concat (320, K)  x (K, 832)  — freq taps in M, time taps in N:
                                     both operand dims fill 128-tiles
  pair       (320, K)  x (K, 128)  — dy shifted+paired, 7 dots

This measures the pure dot_general rate at those shapes (operands
pre-materialized in HBM, bf16, fp32 accumulation) to bound what a
Pallas wgrad kernel could achieve before its expansion overheads.

Usage: python scripts/profile_wgrad_shapes.py  (real chip, idle TPU)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from functools import partial


def time_scalar_fn(fn, n_lo=2, n_hi=12):
    @partial(jax.jit, static_argnums=0)
    def run(n):
        def body(acc, i):
            return acc + fn(i), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc

    float(run(n_lo))
    float(run(n_hi))
    t0 = time.perf_counter()
    float(run(n_lo))
    t1 = time.perf_counter()
    float(run(n_hi))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n_hi - n_lo)


def report(name, sec, flops):
    print(f"{name:42s} {sec * 1e3:8.2f} ms  {flops / sec / 1e12:6.1f} TFLOP/s")


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind}", flush=True)
    # K sized like one layer-2 wgrad contraction at batch 128:
    # B*F*T = 128*128*345 = 5.65M rows; use 1M rows and scale — the
    # rate is K-independent once K >> 128.  Operands are generated ON
    # DEVICE: host arrays of this size would take minutes over the
    # ~45 MB/s axon tunnel.
    K = 1_048_576

    shapes = [
        ("naive   (4160,K)x(K,64)", (4160, 64)),
        ("tap-cat (320,K)x(K,832)", (320, 832)),
        ("pair    (320,K)x(K,128)", (320, 128)),
        ("control (512,K)x(K,512)", (512, 512)),
    ]
    key = jax.random.PRNGKey(0)
    for name, (m, n) in shapes:
        ka, kb = jax.random.split(jax.random.fold_in(key, m * 131 + n))
        a = jax.jit(
            lambda k: jax.random.normal(k, (K, m), jnp.bfloat16) * 0.1
        )(ka)
        b = jax.jit(
            lambda k: jax.random.normal(k, (K, n), jnp.bfloat16) * 0.1
        )(kb)

        def f(i, a=a, b=b):
            w = jax.lax.dot_general(
                a + i * jnp.bfloat16(1e-6),
                b,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return jnp.sum(w) * 1e-9

        report(name, time_scalar_fn(f), 2.0 * K * m * n)
        sys.stdout.flush()


if __name__ == "__main__":
    main()

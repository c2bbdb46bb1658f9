"""XLA-level wgrad formulation probe (round-5 throughput work).

The round-4 trace pinned conv wgrad at 90-95 TF/s vs dgrad's 154-176 on
the same shapes — the one remaining >=10 ms step lever (ROUND_NOTES r4).
Both Pallas attempts lost to VPU tap-marshalling, so before a third
kernel this probe asks whether the gap can be closed WITHOUT Mosaic, by
reformulating the wgrad contraction at the XLA level:

  A. vjp      — jax.vjp of `conv2d_same` w.r.t. the kernel: exactly what
                the train step runs today (XLA's own backprop-filter).
  B. convform — the same contraction expressed manually as a strided
                conv (lhs=x_padded, rhs=dy-as-filter, window_strides=
                (1, dil), custom ConvDimensionNumbers).  Sanity row: if
                A == B, XLA's autodiff already picks this form.
  C. s2b      — space-to-batch: fold the time dilation into the batch
                dim (t = u*dil + r, (B, r) -> batch B*dil), turning the
                stride-dil filter-grad contraction into a DENSE stride-1
                one over batch B*dil and time T/dil.  Includes the cost
                of the reshape/transpose marshalling (HBM relayouts) so
                the number is end-to-end honest.

If C beats A materially on the dilated layers (d = 2..16), the fix is a
custom-VJP wgrad at lax level (`wgrad_impl="s2b"`) — no Mosaic risk.
If A ~= B ~= C everywhere, the ~47%-of-peak wgrad is a contraction-
shape limit (N = co = 64 fills half the MXU lanes) and only a Pallas
kernel that packs taps into both matmul dims can pass it.

Usage:
  python scripts/probe_wgrad_xla.py            # real chip, idle TPU
  python scripts/probe_wgrad_xla.py --check    # numeric parity only
  (--batch N to override the default 128)
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mod_extraction_tpu.ops.conv import (
    conv2d_same,
    conv2d_wgrad_convform,
    conv2d_wgrad_s2b,
    same_pads_1d,
)

B = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 128
T = 345
KF, KT = 5, 13
# (Cin, Cout, F, t_dil) per trunk layer, paper config
LAYERS = [
    (2, 64, 256, 1),
    (64, 64, 128, 1),
    (64, 64, 64, 2),
    (64, 64, 32, 4),
    (64, 64, 16, 8),
    (64, 64, 8, 16),
]


def wgrad_vjp(x, dy, dil, co):
    """Formulation A: XLA's own backprop-filter (preferred=None matches
    the trunk's bf16 training path, so a bf16 cotangent feeds the vjp
    exactly as in the real step)."""
    w0 = jnp.zeros((KF, KT, x.shape[-1], co), x.dtype)
    _, vjp = jax.vjp(lambda w: conv2d_same(x, w, 1, dil, preferred=None), w0)
    return vjp(dy.astype(x.dtype))[0]


def wgrad_convform(x, dy, dil, co=None):
    """Formulation B — see ops/conv.py::conv2d_wgrad_convform."""
    return conv2d_wgrad_convform(x, dy, KF, KT, dil)


def wgrad_s2b(x, dy, dil, co=None):
    """Formulation C — see ops/conv.py::conv2d_wgrad_s2b."""
    return conv2d_wgrad_s2b(x, dy, KF, KT, dil)


def check():
    """Numeric parity of B and C against A on small shapes (any backend)."""
    key = jax.random.PRNGKey(0)
    for dil in (1, 2, 4, 8, 16):
        kx, kd = jax.random.split(jax.random.fold_in(key, dil))
        x = jax.random.normal(kx, (3, 12, 57, 5), jnp.float32)
        dy = jax.random.normal(kd, (3, 12, 57, 7), jnp.float32)
        ref = wgrad_vjp(x, dy, dil, 7)
        for name, fn in (("convform", wgrad_convform), ("s2b", wgrad_s2b)):
            got = fn(x, dy, dil)
            err = float(jnp.max(jnp.abs(got - ref)))
            scale = float(jnp.max(jnp.abs(ref)))
            status = "PASS" if err <= 1e-3 * max(scale, 1.0) else "FAIL"
            print(f"[{status}] dil={dil:2d} {name:9s} max|d|={err:.2e}")


def time_scalar_fn(fn, *operands, n_lo=2, n_hi=10):
    """Scalar-fence timing (verify-skill pattern).  `operands` are
    passed through jit as ARGUMENTS — closing over large device arrays
    would embed them as literal constants in the remote-compile payload
    (observed: HTTP 413 on the axon compile endpoint at trunk shapes)."""

    @partial(jax.jit, static_argnums=0)
    def run(n, *ops):
        def body(acc, i):
            return acc + fn(i, *ops), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc

    float(run(n_lo, *operands))
    float(run(n_hi, *operands))
    t0 = time.perf_counter()
    float(run(n_lo, *operands))
    t1 = time.perf_counter()
    float(run(n_hi, *operands))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n_hi - n_lo)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind}  batch={B}", flush=True)
    key = jax.random.PRNGKey(1)
    forms = [("vjp", None), ("convform", wgrad_convform), ("s2b", wgrad_s2b)]
    # remote compiles dominate this probe's wall time (~2 per cell), so
    # allow narrowing: --forms vjp,s2b --layers 1,2,5
    if "--forms" in sys.argv:
        keep = sys.argv[sys.argv.index("--forms") + 1].split(",")
        forms = [fm for fm in forms if fm[0] in keep]
    layer_ids = list(range(len(LAYERS)))
    if "--layers" in sys.argv:
        layer_ids = [
            int(s) for s in sys.argv[sys.argv.index("--layers") + 1].split(",")
        ]
    totals = {name: 0.0 for name, _ in forms}
    for li in layer_ids:
        ci, co, f, dil = LAYERS[li]
        kx, kd = jax.random.split(jax.random.fold_in(key, li))
        x = jax.jit(
            lambda k: jax.random.normal(k, (B, f, T, ci), jnp.bfloat16) * 0.1
        )(kx)
        dy = jax.jit(
            lambda k: jax.random.normal(k, (B, f, T, co), jnp.bfloat16) * 0.1
        )(kd)
        flops = 2.0 * B * f * T * KF * KT * ci * co
        for name, fn in forms:
            if fn is None:
                def g(i, xx, dd, dil=dil, co=co):
                    dw = wgrad_vjp(xx + i * jnp.bfloat16(1e-6), dd, dil, co)
                    return jnp.sum(dw) * 1e-9
            else:
                def g(i, xx, dd, dil=dil, fn=fn):
                    dw = fn(xx + i * jnp.bfloat16(1e-6), dd, dil)
                    return jnp.sum(dw) * 1e-9
            sec = time_scalar_fn(g, x, dy)
            totals[name] += sec
            print(
                f"L{li} ci={ci:3d} f={f:3d} dil={dil:2d} {name:9s} "
                f"{sec * 1e3:8.2f} ms  {flops / sec / 1e12:6.1f} TFLOP/s",
                flush=True,
            )
    print("---")
    for name, _ in forms:
        print(f"total {name:9s} {totals[name] * 1e3:8.2f} ms")


if __name__ == "__main__":
    if "--check" in sys.argv:
        check()
    else:
        main()

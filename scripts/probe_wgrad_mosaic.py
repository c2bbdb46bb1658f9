"""Mosaic-side wgrad probe: can the round-3 tap-concat kernel be
rescued by tiling, or is its VPU marshalling structural?

Round-4 measured the tap-concat Pallas wgrad losing ~1.8x end-to-end
(639 vs 1139 audio-s/s), attributed to ~65 concat/relayout ops per grid
step.  But those numbers were taken at the shipped tiling
(chunk_f=8, auto tile_t), which rebuilds the A/B tap matrices per
8-row f-chunk — 16 rebuilds per grid step at the F=128 layer.  The
kernel already exposes (chunk_f, tile_t) and the 64 MB vmem_limit
makes much larger chunks legal, so before writing a third kernel this
sweeps the EXISTING one:

  * per trunk layer, tapcat at chunk_f in {8, 16, 32, f} x tile_t in
    {32, 64, 128} (skipping combos whose VMEM working set cannot fit),
    vs the XLA vjp wgrad on the same shapes;
  * a marshalling-isolated variant is approximated by the delta between
    the best tapcat time and the pure dot rate at (320, K)x(K, 832)
    (scripts/profile_wgrad_shapes.py).

Usage: python scripts/probe_wgrad_mosaic.py   (real chip, idle TPU)
       add --quick for the F=128 layer only.
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mod_extraction_tpu.ops.pallas_conv import conv2d_wgrad_tapcat
from probe_wgrad_xla import LAYERS, T, KF, KT, wgrad_vjp, time_scalar_fn

B = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 128


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind}  batch={B}", flush=True)
    key = jax.random.PRNGKey(2)
    layers = LAYERS[2:3] if "--quick" in sys.argv else LAYERS[1:]
    for li, (ci, co, f, dil) in enumerate(layers):
        kx, kd = jax.random.split(jax.random.fold_in(key, li))
        x = jax.jit(
            lambda k: jax.random.normal(k, (B, f, T, ci), jnp.bfloat16) * 0.1
        )(kx)
        dy = jax.jit(
            lambda k: jax.random.normal(k, (B, f, T, co), jnp.bfloat16) * 0.1
        )(kd)
        flops = 2.0 * B * f * T * KF * KT * ci * co

        def report(name, sec):
            print(
                f"ci={ci:3d} f={f:3d} dil={dil:2d} {name:24s} "
                f"{sec * 1e3:8.2f} ms  {flops / sec / 1e12:6.1f} TFLOP/s",
                flush=True,
            )

        def g_vjp(i, xx, dd, dil=dil, co=co):
            return jnp.sum(
                wgrad_vjp(xx + i * jnp.bfloat16(1e-6), dd, dil, co)
            ) * 1e-9

        report("xla vjp", time_scalar_fn(g_vjp, x, dy))
        for chunk_f in (8, 32, f):
            for tile_t in (32, 64, 128):
                # rough VMEM bound: a_mat + b_mat + dyw halo copies (bf16)
                rows = min(chunk_f, f) * tile_t
                halo_cols = (KT - 1) * dil + tile_t
                est = 2 * (
                    rows * (KF * ci + KT * co)
                    + min(chunk_f, f) * 3 * halo_cols * co
                    + (f + KF - 1) * tile_t * ci
                    + 3 * f * tile_t * co
                )
                if est > 56 * 1024 * 1024:
                    continue

                def g_tap(i, xx, dd, dil=dil, cf=chunk_f, tt=tile_t):
                    dw = conv2d_wgrad_tapcat(
                        xx + i * jnp.bfloat16(1e-6), dd, KF, KT, dil,
                        tile_t=tt, chunk_f=cf,
                    )
                    return jnp.sum(dw) * 1e-9

                try:
                    sec = time_scalar_fn(g_tap, x, dy)
                except Exception as e:
                    print(
                        f"ci={ci:3d} f={f:3d} dil={dil:2d} "
                        f"tapcat cf={chunk_f} tt={tile_t}: FAILED "
                        f"{type(e).__name__}: {str(e)[:80]}",
                        flush=True,
                    )
                    continue
                report(f"tapcat cf={chunk_f} tt={tile_t}", sec)


if __name__ == "__main__":
    main()

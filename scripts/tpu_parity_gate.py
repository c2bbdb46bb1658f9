"""On-TPU Pallas parity gate (VERDICT r2 weak #3).

The CI suite checks every Pallas kernel against its `lax.scan` reference
in interpret mode only (tests/conftest.py forces CPU), so on-device
kernel correctness previously rested on manual bench/eval runs.  This
script is the missing gate: run it on the REAL chip (plain `python`,
which routes through the axon plugin) after any kernel or Mosaic/runtime
change, and record the line in ROUND_NOTES.

Checks (kernel vs scan, compiled on the real TPU backend):
  1. flanger fwd — flanger regime (short delay line) and chorus regime
     (~1.8k-slot line, two lane tiles), t_chunk < T so the cross-chunk
     VMEM state carry executes;
  2. phaser fwd — 6-stage TPT allpass cascade with feedback;
  3. LSTM-64 fwd — production hidden size, [latent; x] packing;
  4. LSTM-64 train fwd+bwd — the custom-VJP kernel pair vs jax.grad of
     the flax scan model at the TBPTT chunk length (1024), all param /
     input / state cotangents;
  5. conv wgrad — the tap-concat Pallas weight gradient
     (ops/pallas_conv.py) vs XLA autodiff at two real trunk shapes
     (dil=2 single-copy halo, dil=16 three-copy halo), plus a
     bf16-exact-input check at 1e-3 so indexing bugs can't hide behind
     the bf16 contraction tolerance;
  6. row-pair conv — conv2d_pair_rows fwd vs conv2d_same in bf16 at two
     trunk shapes, and the composed pair+pair+pallas custom VJP
     (loss/dx/dw) vs the plain lax/xla step.

Usage: python scripts/tpu_parity_gate.py   (TPU must be otherwise idle)
Exits nonzero on the first tolerance breach; prints one line per check.

Tolerances are wider than the interpret-mode tests (2e-6): on TPU the
scan reference itself runs MXU matmuls with different accumulation
order than the fused kernels, so f32 ULP-level equality is not the
contract — agreement to ~1e-4 absolute on [-1, 1] audio is.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


FAILURES = []
INTERPRET = False  # set on CPU so the gate is smokeable without the chip
QUICK = False  # --quick (auto on CPU): small shapes, harness smoke only


def check(name, got, want, atol, rtol=0.0):
    got, want = np.asarray(got), np.asarray(want)
    delta = np.max(np.abs(got - want))
    tol = atol + rtol * np.max(np.abs(want))
    status = "PASS" if delta <= tol else "FAIL"
    print(f"[{status}] {name}: max|Δ|={delta:.3e} (tol {tol:.1e})")
    if status == "FAIL":
        FAILURES.append(name)


def gate_flanger(rng):
    from mod_extraction_tpu.ops.fx import _flanger_scan
    from mod_extraction_tpu.ops.pallas_fx import flanger_pallas

    for regime, d, lo in (("flanger", 485, 0.5), ("chorus", 1764, 1325.0)):
        b, c, t = (6, 1, 512) if QUICK else (130, 1, 8192)  # b*c > 128 -> two lane tiles
        x = jnp.asarray(rng.uniform(-0.5, 0.5, (b, c, t)).astype(np.float32))
        mod = rng.uniform(0, 1, (b, c, t)).astype(np.float32)
        delay = jnp.asarray((mod * (d - lo - 2) + lo).astype(np.float32))
        fb = jnp.asarray(rng.uniform(0, 0.7, (b, 1, 1)).astype(np.float32))
        depth = jnp.asarray(rng.uniform(0.5, 1.0, (b, 1, 1)).astype(np.float32))
        mix = jnp.asarray(rng.uniform(0.5, 1.0, (b, 1, 1)).astype(np.float32))
        ref = jax.jit(_flanger_scan, static_argnums=5)(
            x, delay, fb, depth, mix, d
        )
        out = flanger_pallas(x, delay, fb, depth, mix, d, t_chunk=4096,
                             interpret=INTERPRET)
        check(f"flanger fwd ({regime} regime)", out, ref, atol=1e-4)


def gate_phaser(rng):
    from mod_extraction_tpu.ops.fx import _phaser_scan
    from mod_extraction_tpu.ops.pallas_fx import phaser_pallas

    b, c, t, n_stages = (4, 1, 512, 6) if QUICK else (128, 1, 8192, 6)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (b, c, t)).astype(np.float32))
    g = jnp.asarray(rng.uniform(0.01, 1.5, (b, c, t)).astype(np.float32))
    fb = jnp.asarray(rng.uniform(0, 0.7, (b, 1, 1)).astype(np.float32))
    mix = jnp.asarray(rng.uniform(0.3, 1.0, (b, 1, 1)).astype(np.float32))
    ref = _phaser_scan(x, g, fb, mix, n_stages)
    out = phaser_pallas(x, g, fb, mix, n_stages=n_stages, t_chunk=4096,
                        interpret=INTERPRET)
    check("phaser fwd (6 stages)", out, ref, atol=1e-4)


def _lstm_setup(rng, b, t, hid=64):
    from mod_extraction_tpu.models.lstm import LSTMEffectModel, lstm_init_state

    model = LSTMEffectModel(in_ch=1, out_ch=1, n_hidden=hid, latent_dim=1)
    x = jnp.asarray((0.3 * rng.standard_normal((b, 1, t))).astype(np.float32))
    latent = jnp.asarray(rng.uniform(0, 1, (b, 1, t)).astype(np.float32))
    params = model.init(
        jax.random.PRNGKey(0), x, latent, lstm_init_state(b, hid)
    )
    return model, params, x, latent, lstm_init_state(b, hid)


def gate_lstm_fwd(rng):
    from mod_extraction_tpu.ops.pallas_lstm import lstm_effect_model_pallas

    model, params, x, latent, h0 = _lstm_setup(
        rng, b=4 if QUICK else 32, t=512 if QUICK else 4096
    )
    y_ref, (h_ref, c_ref) = jax.jit(model.apply)(params, x, latent, h0)
    y, (h, c) = lstm_effect_model_pallas(
        params, x, latent, h0, t_chunk=2048, interpret=INTERPRET
    )
    check("lstm-64 fwd y", y, y_ref, atol=1e-4)
    check("lstm-64 fwd h_n", h, h_ref, atol=1e-4)
    check("lstm-64 fwd c_n", c, c_ref, atol=1e-4)


def gate_lstm_train(rng):
    from mod_extraction_tpu.ops.pallas_lstm import (
        lstm_effect_model_pallas_train,
    )

    b, t = (2, 256) if QUICK else (8, 1024)  # TBPTT update-chunk length
    model, params, x, latent, h0 = _lstm_setup(rng, b, t)
    tgt = jnp.asarray(rng.standard_normal((b, 1, t)).astype(np.float32))

    def loss_scan(p, x, lat, st):
        y, (hn, cn) = model.apply(p, x, lat, st)
        return jnp.mean((y - tgt) ** 2) + jnp.mean(hn**2) + jnp.mean(cn**2)

    def loss_pal(p, x, lat, st):
        y, (hn, cn) = lstm_effect_model_pallas_train(
            p, x, lat, st, interpret=INTERPRET
        )
        return jnp.mean((y - tgt) ** 2) + jnp.mean(hn**2) + jnp.mean(cn**2)

    args = (params, x, latent, h0)
    l_ref, g_ref = jax.jit(
        jax.value_and_grad(loss_scan, argnums=(0, 1, 2, 3))
    )(*args)
    l_pal, g_pal = jax.jit(
        jax.value_and_grad(loss_pal, argnums=(0, 1, 2, 3))
    )(*args)
    check("lstm-64 train loss", l_pal, l_ref, atol=1e-6, rtol=1e-4)
    flat_ref = jax.tree.leaves(g_ref)
    flat_pal = jax.tree.leaves(g_pal)
    assert len(flat_ref) == len(flat_pal)
    deltas = [
        float(np.max(np.abs(np.asarray(a) - np.asarray(r))))
        for a, r in zip(flat_pal, flat_ref)
    ]
    scale = max(float(np.max(np.abs(np.asarray(r)))) for r in flat_ref)
    check(
        f"lstm-64 train grads ({len(deltas)} leaves)",
        np.asarray([max(deltas)]),
        np.asarray([0.0]),
        atol=5e-4 * max(scale, 1.0),
    )


def gate_conv_wgrad(rng):
    from mod_extraction_tpu.ops.pallas_conv import (
        conv2d_wgrad_reference,
        conv2d_wgrad_tapcat,
    )

    # (B, F, T, dil): trunk L2 (single dy copy) and L5 (halo 192 > tile,
    # three copies); T=345 is the real frame count
    shapes = [(4, 16, 96, 2), (2, 8, 128, 16)] if QUICK else [
        (32, 64, 345, 2),
        (32, 8, 345, 16),
    ]
    for b, f, t, dil in shapes:
        x = jnp.asarray((0.3 * rng.standard_normal((b, f, t, 64))).astype(np.float32))
        dy = jnp.asarray((0.3 * rng.standard_normal((b, f, t, 64))).astype(np.float32))
        ref = conv2d_wgrad_reference(x, dy, dil=dil)
        got = conv2d_wgrad_tapcat(x, dy, dil=dil, interpret=INTERPRET)
        # the kernel contracts in bf16 (as the bf16 training step does);
        # tolerance is relative to the gradient magnitude
        scale = float(np.max(np.abs(np.asarray(ref)))) + 1e-6
        check(
            f"conv wgrad tap-concat (dil={dil})",
            np.asarray(got) / scale,
            np.asarray(ref) / scale,
            atol=2e-2,
        )

    # bf16-EXACT inputs (VERDICT r3 weak #5): values pre-rounded to the
    # bf16 grid make the kernel's bf16 casts lossless and its products
    # exact in the fp32 accumulator, so only accumulation order remains
    # — an indexing/tap bug cannot hide behind bf16 rounding tolerance.
    b, f, t, dil = (4, 16, 96, 2) if QUICK else (32, 64, 345, 2)
    x = jnp.asarray(
        (0.3 * rng.standard_normal((b, f, t, 64)))
        .astype(np.float32)
        .astype(jnp.bfloat16)
        .astype(np.float32)
    )
    dy = jnp.asarray(
        (0.3 * rng.standard_normal((b, f, t, 64)))
        .astype(np.float32)
        .astype(jnp.bfloat16)
        .astype(np.float32)
    )
    ref = conv2d_wgrad_reference(x, dy, dil=dil)
    got = conv2d_wgrad_tapcat(x, dy, dil=dil, interpret=INTERPRET)
    scale = float(np.max(np.abs(np.asarray(ref)))) + 1e-6
    check(
        "conv wgrad tap-concat (bf16-exact inputs)",
        np.asarray(got) / scale,
        np.asarray(ref) / scale,
        atol=1e-3,
    )


def gate_conv_wgrad_s2b(rng):
    """Round-5 space-to-batch wgrad framing (ops/conv.py, pure XLA):
    on-chip f32 parity vs the autodiff framing at trunk-like shapes.
    Tighter tolerance than the Pallas rows — both sides contract in
    f32 here, only accumulation order differs."""
    from mod_extraction_tpu.ops.conv import conv2d_wgrad_s2b
    from mod_extraction_tpu.ops.pallas_conv import conv2d_wgrad_reference

    shapes = [(4, 16, 96, 2), (2, 8, 128, 16)] if QUICK else [
        (32, 64, 345, 2),
        (32, 8, 345, 16),
    ]
    for b, f, t, dil in shapes:
        x = jnp.asarray(
            (0.3 * rng.standard_normal((b, f, t, 64))).astype(np.float32)
        )
        dy = jnp.asarray(
            (0.3 * rng.standard_normal((b, f, t, 64))).astype(np.float32)
        )
        ref = conv2d_wgrad_reference(x, dy, dil=dil)
        got = conv2d_wgrad_s2b(x, dy, 5, 13, dil)
        scale = float(np.max(np.abs(np.asarray(ref)))) + 1e-6
        check(
            f"conv wgrad s2b (dil={dil})",
            np.asarray(got) / scale,
            np.asarray(ref) / scale,
            atol=1e-4,
        )


def gate_conv_pair(rng):
    """Row-pair conv path (VERDICT r3 missing #4): `conv2d_pair_rows`
    fwd vs `conv2d_same` in bf16 at trunk shapes, plus the composed
    pair+pair+pallas custom VJP (`make_conv2d_custom`) loss and grads vs
    the plain lax/xla step — the bf16 on-chip behavior of the path the
    trainer defaults select (models/spectral_2dcnn.py::_TrunkConv)."""
    from mod_extraction_tpu.ops.conv import conv2d_pair_rows, conv2d_same
    from mod_extraction_tpu.ops.pallas_conv import make_conv2d_custom

    # (a) fwd at trunk shapes, bf16 inputs, fp32 accumulation: only
    # accumulation order differs between the two formulations
    shapes = [(2, 16, 64, 2)] if QUICK else [
        (32, 128, 345, 1),  # trunk L1
        (32, 8, 345, 16),   # trunk L5
    ]
    for b, f, t, dil in shapes:
        x = jnp.asarray(
            (0.3 * rng.standard_normal((b, f, t, 64))).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(
            (0.1 * rng.standard_normal((5, 13, 64, 64))).astype(np.float32)
        ).astype(jnp.bfloat16)
        ref = conv2d_same(x, w, 1, dil, preferred=jnp.float32)
        got = conv2d_pair_rows(x, w, 1, dil, preferred=jnp.float32)
        scale = float(np.max(np.abs(np.asarray(ref)))) + 1e-6
        check(
            f"conv pair-rows fwd bf16 (F={f}, dil={dil})",
            np.asarray(got) / scale,
            np.asarray(ref) / scale,
            atol=1e-3,
        )

    # (b) composed custom VJP at a trunk shape: loss + dx + dw
    b, f, t, dil = (2, 16, 64, 2) if QUICK else (32, 64, 345, 2)
    x = jnp.asarray(
        (0.3 * rng.standard_normal((b, f, t, 64))).astype(np.float32)
    ).astype(jnp.bfloat16)
    w = jnp.asarray(
        (0.1 * rng.standard_normal((5, 13, 64, 64))).astype(np.float32)
    ).astype(jnp.bfloat16)
    conv_pair = make_conv2d_custom(
        dil, fwd_impl="pair", dgrad_impl="pair", wgrad_impl="pallas",
        interpret=INTERPRET,
    )

    def loss_pair(w, x):
        return jnp.mean(conv_pair(x, w).astype(jnp.float32) ** 2)

    def loss_ref(w, x):
        y = conv2d_same(x, w, 1, dil, preferred=None)
        return jnp.mean(y.astype(jnp.float32) ** 2)

    l_p, (dw_p, dx_p) = jax.jit(
        jax.value_and_grad(loss_pair, argnums=(0, 1))
    )(w, x)
    l_r, (dw_r, dx_r) = jax.jit(
        jax.value_and_grad(loss_ref, argnums=(0, 1))
    )(w, x)
    check("conv pair+pallas composed loss", l_p, l_r, atol=0.0, rtol=1e-2)
    for name, got, ref, tol in (
        # dx: both paths multiply the same bf16 values; the pair dgrad is
        # a re-bracketed sum — bf16-output rounding dominates (~1 ulp)
        ("dx", dx_p, dx_r, 1e-2),
        # dw: Pallas bf16 contraction vs XLA's framing — same budget as
        # the standalone wgrad check
        ("dw", dw_p, dw_r, 2e-2),
    ):
        scale = float(np.max(np.abs(np.asarray(ref, np.float32)))) + 1e-6
        check(
            f"conv pair+pallas composed {name}",
            np.asarray(got, np.float32) / scale,
            np.asarray(ref, np.float32) / scale,
            atol=tol,
        )


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind}")
    if dev.platform == "cpu":
        global INTERPRET, QUICK
        INTERPRET = QUICK = True
        print(
            "WARNING: running on CPU in interpret mode with small shapes — "
            "the real gate is plain `python scripts/tpu_parity_gate.py` on "
            "the chip"
        )
    if "--quick" in sys.argv[1:]:
        QUICK = True
    rng = np.random.default_rng(0)
    t0 = time.time()
    gate_flanger(rng)
    gate_phaser(rng)
    gate_lstm_fwd(rng)
    gate_lstm_train(rng)
    gate_conv_wgrad(rng)
    gate_conv_wgrad_s2b(rng)
    gate_conv_pair(rng)
    print(f"gate finished in {time.time() - t0:.0f}s: "
          + ("FAIL " + ", ".join(FAILURES) if FAILURES else "ALL PASS"))
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()

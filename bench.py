"""Headline benchmark: audio-seconds rendered+trained per second per chip.

Pipeline measured: the reference's hottest path — flanger-modulated
training data rendered ON DEVICE + Spectral2DCNN (paper config) forward/
backward + AdamW update, all in one jitted step (the reference renders
flanger batches with a per-sample Python loop on host CPU,
`mod_extraction/fx.py:104-115` via `data_modules.py:419-458`, and trains
those configs on CPU, `configs/train_lfo_flanger.yml:21`).

Baseline: the reference-equivalent per-sample torch loop measured here on
CPU (render-dominated pipeline), extrapolated to audio-seconds/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def bench_ours(
    batch_size: int = 128,
    n_steps: int = 8,
    conv_impl: str = "lax",
    wgrad_impl: str = "xla",
    grad_barrier: bool = False,
    stft_impl: str = "auto",
    act_io_dtype: str = "float32",
) -> float:
    """Stage-1 train-step throughput (audio-s/s/chip) at the given knobs.

    NOTE (defaults divergence, deliberate): these FUNCTION defaults are
    the conservative f32-frontend/batch-128 config so programmatic A/B
    callers measure a knob against the round-3 control unless they opt
    in; `main()` overrides them with the measured end-to-end winner
    (batch 256 + dft_bf16 + act_io=compute) for the driver's headline
    line, and records every knob in the JSON so the two are never
    conflated."""
    import jax
    import optax

    from mod_extraction_tpu.data.synthetic import make_synthetic_batch
    from mod_extraction_tpu.models import Spectral2DCNN
    from mod_extraction_tpu.train.lfo_task import LFOExtractionTask
    from mod_extraction_tpu.train.render import RenderConfig

    sr, n_samples = 44100.0, 88200
    render_cfg = RenderConfig(
        sr=sr,
        n_samples=n_samples,
        effects=(2,),  # flanger/chorus
        max_delay_samples=485,  # 11 ms @ 44.1 kHz
    )
    model = Spectral2DCNN(
        in_ch=2,
        n_samples=n_samples,
        sr=sr,
        n_fft=1024,
        hop_len=256,
        n_mels=256,
        kernel_size=(5, 13),
        out_channels=(64,) * 6,
        temp_dilations=(1, 1, 2, 4, 8, 16),
        pool_size=(2, 1),
        freq_mask_amount=0.25,
        time_mask_amount=0.25,
        compute_dtype="bfloat16",
        conv_impl=conv_impl,
        wgrad_impl=wgrad_impl,
        grad_barrier=grad_barrier,
        stft_impl=stft_impl,
        act_io_dtype=act_io_dtype,
    )
    task = LFOExtractionTask(
        model=model,
        render_cfg=render_cfg,
        optimizer=optax.adamw(1e-4, b1=0.8, b2=0.99),
        loss_dict={"l1": 1.0, "fdl1": 5.0, "sdl1": 10.0, "mse": 0.0},
    )
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    state = task.init_state(key)
    # n_steps DISTINCT synthetic batches (distinct keys too — reusing
    # one batch+key across steps lets XLA CSE the render away and
    # overstates throughput), stacked for the compiled multi-step
    # dispatch (task.train_steps — the trainer's steps_per_dispatch
    # path, a lax.scan of optimizer updates in one device program)
    batches = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[
            make_synthetic_batch(i, batch_size, n_samples, sr, "flanger")
            for i in range(n_steps)
        ],
    )

    def step_keys(rep: int):
        k = jax.random.fold_in(key, rep)
        return jnp.stack(
            [jax.random.fold_in(k, i) for i in range(n_steps)]
        )

    # warmup/compile.  NOTE: force a host pull of a scalar metric rather
    # than block_until_ready — remote-tunnel TPU backends can return from
    # block_until_ready before execution finishes, and the metric depends
    # on the full step so pulling it fences the computation.
    state, m = task.train_steps(state, batches, step_keys(0))
    float(jax.tree.leaves(m)[0][-1])
    n_reps = 2
    t0 = time.perf_counter()
    for r in range(1, n_reps + 1):
        state, m = task.train_steps(state, batches, step_keys(r))
    # dispatches chain through `state`, so pulling a final-rep metric
    # fences everything since t0.
    float(jax.tree.leaves(m)[0][-1])
    dt = time.perf_counter() - t0
    audio_sec = batch_size * (n_samples / sr) * n_steps * n_reps
    return audio_sec / dt


def bench_tbptt(batch_size: int = 32, n_steps: int = 4) -> float:
    """Stage-2 (TBPTT) throughput at the shipped config (VERDICT r3 #6):
    flanger-rendered batches + frozen r6 extractor conditioning + the
    Pallas-LSTM chunk loop (85 inner optimizer updates per 2 s batch,
    matching the reference's hot loop `mod_extraction/lightning.py:356-384`
    at `configs/train_em_sim_*.yml` batch 32).  Returns audio-s/s/chip."""
    import jax
    import jax.numpy as jnp
    import optax

    from mod_extraction_tpu.data.synthetic import make_synthetic_batch
    from mod_extraction_tpu.models import Spectral2DCNN
    from mod_extraction_tpu.models.lstm import LSTMEffectModel
    from mod_extraction_tpu.train.checkpoints import load_weights
    from mod_extraction_tpu.train.render import RenderConfig
    from mod_extraction_tpu.train.tbptt_task import TBPTTEffectModelingTask

    sr, n_samples = 44100.0, 88200
    lfo_model = Spectral2DCNN(
        in_ch=2, n_samples=n_samples, sr=sr, n_fft=1024, hop_len=256,
        n_mels=256, kernel_size=(5, 13), out_channels=(64,) * 6,
        temp_dilations=(1, 1, 2, 4, 8, 16), pool_size=(2, 1),
        compute_dtype="bfloat16",
    )
    lfo_params = {"params": load_weights(
        "models/lfo_2dcnn_io_sa_25_25_no_ch_ln__interwoven_idmt_all_live_r6.npz"
    )}
    task = TBPTTEffectModelingTask(
        effect_model=LSTMEffectModel(in_ch=1, out_ch=1, n_hidden=64,
                                     latent_dim=1),
        render_cfg=RenderConfig(sr=sr, n_samples=n_samples, effects=(2,),
                                max_delay_samples=485),
        lfo_model=lfo_model,
        lfo_params=lfo_params,
        optimizer=optax.adamw(1e-4, b1=0.8, b2=0.99),
    )
    key = jax.random.PRNGKey(0)
    state = task.init_state(key)
    batches = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[
            make_synthetic_batch(i, batch_size, n_samples, sr, "flanger")
            for i in range(n_steps)
        ],
    )

    def step_keys(rep: int):
        k = jax.random.fold_in(key, rep)
        return jnp.stack([jax.random.fold_in(k, i) for i in range(n_steps)])

    state, m = task.train_steps(state, batches, step_keys(0))
    float(jax.tree.leaves(m)[0][-1])  # fence (see bench_ours note)
    n_reps = 2
    t0 = time.perf_counter()
    for r in range(1, n_reps + 1):
        state, m = task.train_steps(state, batches, step_keys(r))
    float(jax.tree.leaves(m)[0][-1])
    dt = time.perf_counter() - t0
    audio_sec = batch_size * (n_samples / sr) * n_steps * n_reps
    return audio_sec / dt


def bench_reference_torch_cpu(n_reps: int = 5) -> float:
    """Reference-style per-sample flanger loop (torch, host CPU).

    Measures full 2-second example renders (the reference's actual chunk
    length, `fx.py:104-115`) at the reference's actual render batch size
    of 1000 (`configs/train_lfo_flanger.yml:21`, rendered per batch in
    `data_modules.py:419-458`), `n_reps` timed repetitions after a short
    warmup rep.  Batch 1000 amortizes torch's per-op dispatch overhead
    across the batch exactly as the reference pipeline does — timing the
    loop at a small batch would overstate our speedup ~25x (VERDICT r2
    weak #1).  The reference pipeline is render-bound (flanger configs
    train on CPU too, `train_lfo_flanger.yml:21-24`), so audio-sec/sec ==
    rendered audio seconds / wall seconds, an upper bound on the
    reference's end-to-end throughput.  NOT extrapolated from a
    sub-second slice — the loop is timed at the real per-example length,
    so per-iteration overheads are fully included."""
    sr = 44100.0
    b, t = 1000, 88200  # the reference's batch-1000 render of 2 s chunks
    _torch_flanger_render(b, 11025)  # warmup (allocator, thread pools)
    # median-of-n per-rep rate: this host is a 1-vCPU VM whose torch
    # throughput jitters ~25% rep to rep; the median is the robust
    # honest estimate (mean is dragged by descheduling stalls)
    rates = sorted(
        b * t / sr / _torch_flanger_render(b, t) for _ in range(n_reps)
    )
    return rates[len(rates) // 2]


def _torch_flanger_render(b: int, t: int) -> float:
    """Reference-style per-sample flanger loop (`fx.py:104-115` shape):
    per-sample gather/lerp/feedback-write over a (b, 1, 485) delay buf.
    Returns the loop's elapsed seconds (index precompute excluded)."""
    import torch as tr

    d = 485
    x = tr.rand(b, 1, t) * 0.5
    mod = tr.rand(b, 1, t)
    feedback = tr.full((b, 1), 0.3)
    depth = tr.full((b, 1), 0.8)
    buf = tr.zeros(b, 1, d)
    out = tr.zeros(b, 1, t)
    delay = mod * 440.0 + 20.0
    write_idx_all = tr.arange(t) % d
    read_idx_all = (write_idx_all.view(1, 1, -1) - delay + d) % d
    frac_all = read_idx_all - tr.floor(read_idx_all)
    prev_all = tr.floor(read_idx_all).long()
    next_all = (prev_all + 1) % d
    t0 = time.perf_counter()
    with tr.no_grad():
        for i in range(t):
            prev_v = tr.gather(
                buf, -1, prev_all[:, :, i].unsqueeze(-1)
            ).squeeze(-1)
            next_v = tr.gather(
                buf, -1, next_all[:, :, i].unsqueeze(-1)
            ).squeeze(-1)
            interp = (
                frac_all[:, :, i] * next_v + (1 - frac_all[:, :, i]) * prev_v
            )
            buf[:, :, write_idx_all[i]] = x[:, :, i] + feedback * interp
            out[:, :, i] = x[:, :, i] + depth * interp
    return time.perf_counter() - t0


def bench_tbptt_reference_torch_cpu(n_reps: int = 3) -> float:
    """Reference-equivalent stage-2 (TBPTT) loop on host CPU (torch),
    matching what `bench_tbptt` measures on-device: per-batch flanger
    render (the host per-sample loop, as in the FlangerCPU data module
    `data_modules.py:419-458`) + the TBPTT hot loop
    (`lightning.py:340-384`): 1024-sample LSTM-64 warmup with hidden
    detach, then 85 chunks of 1024 samples, each doing LSTM forward →
    L1 loss → backward → AdamW step → hidden detach.  Batch 32 (the
    shipped stage-2 config).  The frozen-extractor forward
    (`lightning.py:314-318`) is EXCLUDED from the baseline — our bench
    includes it on-device, so the omission is conservative (favors the
    baseline).  Returns audio-s/s (median of n_reps)."""
    import torch as tr

    sr = 44100.0
    b, t, chunk, hid = 32, 88200, 1024, 64
    lstm = tr.nn.LSTM(2, hid, batch_first=True)
    fc = tr.nn.Linear(hid, 1)
    opt = tr.optim.AdamW(
        list(lstm.parameters()) + list(fc.parameters()),
        lr=1e-4,
        betas=(0.8, 0.99),
    )

    def tbptt_pass() -> float:
        t_render = _torch_flanger_render(b, t)
        x = tr.rand(b, t, 2)  # [latent; dry] features, audio rate
        wet = tr.rand(b, t, 1)
        t0 = time.perf_counter()
        with tr.no_grad():  # warmup chunk (reference: fwd, detach, zero)
            _, hc = lstm(x[:, :chunk])
        h = tuple(s.detach() for s in hc)
        n_chunks = (t - chunk) // chunk  # 85 updates per 2 s batch
        for i in range(1, 1 + n_chunks):
            seg = x[:, i * chunk : (i + 1) * chunk]
            y, hc = lstm(seg, h)
            y_hat = tr.tanh(fc(y) + seg[:, :, 1:])
            loss = tr.nn.functional.l1_loss(
                y_hat, wet[:, i * chunk : (i + 1) * chunk]
            )
            loss.backward()
            opt.step()
            opt.zero_grad()
            h = tuple(s.detach() for s in hc)
        return t_render + (time.perf_counter() - t0)

    tbptt_pass()  # warmup rep
    rates = sorted(b * t / sr / tbptt_pass() for _ in range(n_reps))
    return rates[len(rates) // 2]


def train_step_model_flops(
    batch_size: int,
    n_samples: int = 88200,
    hop_len: int = 256,
    n_fft: int = 1024,
    n_mels: int = 256,
    channels: tuple = (2, 64, 64, 64, 64, 64, 64),
    kernel: tuple = (5, 13),
    pool_h: int = 2,
) -> float:
    """Analytic model FLOPs for one stage-1 train step (paper config).

    Counts the MXU-relevant terms: conv trunk fwd + dgrad + wgrad (each
    the same MAC count for 'same'-padded convs; 2 FLOPs/MAC), the
    frontend DFT-as-matmul (fwd only — no parameters and no grad w.r.t.
    audio, so the backward stops at conv L0's wgrad), the mel
    projection, and the 1x1 head (fwd+bwd).  Elementwise/LN/loss/adam
    FLOPs are excluded (VPU-side, ~irrelevant to MXU utilization).
    Used for the bench JSON's "mfu" field: flops / step_time / peak."""
    frames = n_samples // hop_len + 1
    kh, kw = kernel
    mels = n_mels
    conv_macs = 0
    for cin, cout in zip(channels[:-1], channels[1:]):
        conv_macs += cin * cout * kh * kw * mels * frames
        mels //= pool_h
    conv_flops = 3 * 2 * conv_macs  # fwd + dgrad + wgrad
    bins = n_fft // 2 + 1
    dft_flops = 2 * (2 * 2 * frames * n_fft * bins)  # 2 ch x (re+im)
    mel_flops = 2 * (2 * frames * bins * n_mels)
    head_flops = 3 * 2 * (channels[-1] * frames)  # 1x1 conv fwd+bwd
    return float(batch_size) * (
        conv_flops + dft_flops + mel_flops + head_flops
    )


# v5e (TPU v5 lite) bf16 peak; override for other chips.
PEAK_FLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12


def _arg(flag: str, env: str, default: str) -> str:
    if flag in sys.argv:
        return sys.argv[sys.argv.index(flag) + 1]
    return os.environ.get(env, default)


def main():
    if "--tbptt" in sys.argv:
        # Stage-2 throughput gate (recorded in ROUND_NOTES each round);
        # the driver's plain `python bench.py` stays one JSON line.
        tb = bench_tbptt()
        try:
            tb_ref = bench_tbptt_reference_torch_cpu()
        except Exception:
            tb_ref = float("nan")
        tb_vs = tb / tb_ref if tb_ref == tb_ref and tb_ref > 0 else None
        print(
            json.dumps(
                {
                    "metric": "tbptt_train_throughput",
                    "value": round(tb, 2),
                    "unit": "audio_sec/sec/chip",
                    "vs_baseline": round(tb_vs, 2) if tb_vs else None,
                    "baseline_value": (
                        round(tb_ref, 2) if tb_ref == tb_ref else None
                    ),
                }
            )
        )
        return
    # Defaults = the measured end-to-end winner on the real chip (round-4
    # A/B at batch 128: lax/xla 1139, pair/xla 963, lax/pallas 639,
    # pair/pallas 487 audio-s/s — both round-3 experimental paths LOSE
    # end-to-end; see ROUND_NOTES round-4 table).  The knobs remain so
    # future kernels can be A/B'd the same way.
    conv_impl = _arg("--conv-impl", "BENCH_CONV_IMPL", "lax")
    wgrad_impl = _arg("--wgrad-impl", "BENCH_WGRAD_IMPL", "xla")
    # Mixed-precision knobs REVERTED to the validated f32 path (round 5,
    # VERDICT r4 next #3): the round-4 +5% knobs (dft_bf16 +
    # act_io=compute) were training-validated with a full r6-recipe run
    # (train_lfo_interwoven_all_live_r6b16.yml, same seed/warm
    # start/schedule) and the converged model lands at eval_lfo val/l1
    # 0.010945 vs the f32-trained 0.010751 (+1.8% relative; monitored
    # best val/loss 0.025880 vs 0.025450).  Per the decision rule, the
    # knobs are NOT training-clean, so the headline measures the config
    # a real training would use.  The knobs remain opt-in flags for A/B.
    # Batch 256 is not a numerics knob and stays (b512 does not compile
    # on v5e — HBM).
    stft_impl = _arg("--stft-impl", "BENCH_STFT_IMPL", "auto")
    act_io_dtype = _arg("--act-io", "BENCH_ACT_IO", "float32")
    batch_size = int(_arg("--batch", "BENCH_BATCH", "256"))
    ours = bench_ours(
        batch_size=batch_size,
        conv_impl=conv_impl,
        wgrad_impl=wgrad_impl,
        stft_impl=stft_impl,
        act_io_dtype=act_io_dtype,
    )
    n_base_reps = 5
    try:
        ref = bench_reference_torch_cpu(n_base_reps)
    except Exception:
        ref = float("nan")
    vs = ours / ref if ref == ref and ref > 0 else None
    # MFU: analytic model FLOPs per step over measured step time over
    # chip peak.  sec/step follows exactly from the rate: rate =
    # batch * (n_samples/sr) / sec_per_step.
    sec_per_step = batch_size * 2.0 / ours
    mfu = train_step_model_flops(batch_size) / sec_per_step / PEAK_FLOPS
    print(
        json.dumps(
            {
                "metric": "lfo_train_throughput",
                "value": round(ours, 2),
                "unit": "audio_sec/sec/chip",
                "vs_baseline": round(vs, 2) if vs else None,
                "mfu": round(mfu, 4),
                # the ratio's denominator, so BENCH_rN swings decompose
                # into numerator vs baseline jitter (VERDICT r3 weak #2)
                "baseline_value": round(ref, 2) if ref == ref else None,
                "baseline_reps": n_base_reps,
                "conv_impl": conv_impl,
                "wgrad_impl": wgrad_impl,
                "stft_impl": stft_impl,
                "act_io_dtype": act_io_dtype,
                "batch_size": batch_size,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Per-stage pipeline profiler: times each compute stage of both tasks on
the current backend and prints one line per stage (audio-seconds/sec and
ms/step).  The SURVEY §5.1 "tracing/profiling" subsystem counterpart to
the reference's `profiler: null` placeholder; `custom.profile_dir` in a
train config additionally captures a jax.profiler trace of live steps.

Usage: python scripts/profile_pipeline.py [batch_size] [n_samples]

Timing uses scalar host pulls chained through state — see
.claude/skills/verify/SKILL.md for why block_until_ready is not enough
on tunneled TPU backends.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax


def timeit(fn, *args, n=6):
    float(jnp.sum(jax.tree.leaves(fn(*args))[0]))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / n


if __name__ == "__main__":
    from mod_extraction_tpu.data.synthetic import make_synthetic_batch
    from mod_extraction_tpu.models import LSTMEffectModel, Spectral2DCNN
    from mod_extraction_tpu.train.lfo_task import LFOExtractionTask
    from mod_extraction_tpu.train.render import RenderConfig, render_batch
    from mod_extraction_tpu.train.tbptt_task import TBPTTEffectModelingTask

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 88200
    sr = 44100.0
    audio_s = bs * n / sr
    print(f"backend={jax.default_backend()} batch={bs} n_samples={n}")

    cfg = RenderConfig(sr=sr, n_samples=n, effects=(2,), max_delay_samples=485)
    batch = jax.tree.map(jnp.asarray, make_synthetic_batch(0, bs, n, sr, "flanger"))
    key = jax.random.PRNGKey(0)

    render_j = jax.jit(lambda b: render_batch(b, cfg)[1])
    dt = timeit(render_j, batch)
    print(f"render (flanger):       {dt*1e3:8.1f} ms  {audio_s/dt:9.0f} audio-s/s")

    model = Spectral2DCNN(
        in_ch=2, n_samples=n, sr=sr, n_fft=1024, hop_len=256, n_mels=256,
        kernel_size=(5, 13), out_channels=(64,) * 6,
        temp_dilations=(1, 1, 2, 4, 8, 16), pool_size=(2, 1),
        compute_dtype="bfloat16",
    )
    x2 = jnp.concatenate([batch["dry"], batch["dry"]], 1)
    params = model.init(jax.random.PRNGKey(1), x2[:2])
    fwd_j = jax.jit(lambda p, x: model.apply(p, x)[0])
    dt = timeit(fwd_j, params, x2)
    print(f"extractor fwd:          {dt*1e3:8.1f} ms  {audio_s/dt:9.0f} audio-s/s")
    bwd_j = jax.jit(lambda p, x: jax.grad(lambda q: model.apply(q, x)[0].sum())(p))
    dt = timeit(bwd_j, params, x2)
    print(f"extractor fwd+bwd:      {dt*1e3:8.1f} ms  {audio_s/dt:9.0f} audio-s/s")

    task = LFOExtractionTask(
        model=model, render_cfg=cfg,
        optimizer=optax.adamw(1e-4, b1=0.8, b2=0.99),
        loss_dict={"l1": 1.0, "fdl1": 5.0, "sdl1": 10.0, "mse": 0.0},
    )
    st = [task.init_state(key)]

    def lfo_step(b):
        s, m = task.train_step(st[0], b, key)
        st[0] = s
        return m

    dt = timeit(lfo_step, batch)
    print(f"LFO train step:         {dt*1e3:8.1f} ms  {audio_s/dt:9.0f} audio-s/s")

    tb = TBPTTEffectModelingTask(
        effect_model=LSTMEffectModel(in_ch=1, out_ch=1, n_hidden=64, latent_dim=1),
        render_cfg=cfg, warmup_n_samples=1024, step_n_samples=1024,
        lfo_model=None, model_smooth_n_frames=8, should_stretch=True,
    )
    tst = [tb.init_state(key)]
    batch2 = jax.tree.map(jnp.asarray, make_synthetic_batch(1, bs, n, sr, "flanger"))

    def tb_step(b):
        s, m = tb.train_step(tst[0], b, key)
        tst[0] = s
        return m

    dt = timeit(tb_step, batch2)
    print(f"TBPTT train step:       {dt*1e3:8.1f} ms  {audio_s/dt:9.0f} audio-s/s")

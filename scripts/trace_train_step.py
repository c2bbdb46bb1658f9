"""Capture a jax.profiler device trace of the bench train step and print
the per-HLO-op time table (throughput work: decide where the backward
pass's ~143 ms actually goes before writing custom kernels).

Usage: python scripts/trace_train_step.py [batch] [outdir]
Parses the xplane with tensorboard_plugin_profile and prints the top ops
by self-time plus a category rollup (conv fwd / dgrad / wgrad / other).
"""

import glob
import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def capture(batch_size: int, outdir: str) -> None:
    import optax

    from mod_extraction_tpu.data.synthetic import make_synthetic_batch
    from mod_extraction_tpu.models import Spectral2DCNN
    from mod_extraction_tpu.train.lfo_task import LFOExtractionTask
    from mod_extraction_tpu.train.render import RenderConfig

    sr, n = 44100.0, 88200
    model = Spectral2DCNN(
        in_ch=2, n_samples=n, sr=sr, n_fft=1024, hop_len=256, n_mels=256,
        kernel_size=(5, 13), out_channels=(64,) * 6,
        temp_dilations=(1, 1, 2, 4, 8, 16), pool_size=(2, 1),
        freq_mask_amount=0.25, time_mask_amount=0.25,
        compute_dtype="bfloat16",
    )
    task = LFOExtractionTask(
        model=model,
        render_cfg=RenderConfig(sr=sr, n_samples=n, effects=(2,),
                                max_delay_samples=485),
        optimizer=optax.adamw(1e-4, b1=0.8, b2=0.99),
        loss_dict={"l1": 1.0, "fdl1": 5.0, "sdl1": 10.0, "mse": 0.0},
    )
    key = jax.random.PRNGKey(0)
    state = task.init_state(key)
    batches = [
        jax.tree.map(jnp.asarray, make_synthetic_batch(i, batch_size, n, sr, "flanger"))
        for i in range(3)
    ]
    # compile + warm
    state, m = task.train_step(state, batches[0], key)
    float(jax.tree.leaves(m)[0])
    with jax.profiler.trace(outdir):
        for i, b in enumerate(batches):
            state, m = task.train_step(state, b, jax.random.fold_in(key, i))
        float(jax.tree.leaves(m)[0])
    print("trace captured to", outdir)


def parse(outdir: str, n_steps: int = 3) -> None:
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xplanes = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    if not xplanes:
        print("no xplane found under", outdir)
        return
    data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    import gzip
    import json

    if isinstance(data, bytes):
        # tensorboard_plugin_profile returns gzip bytes on some versions
        # and plain JSON bytes on others; OSError is gzip's "not a gzip
        # file" signal — the plain-bytes case, not an error to hide.
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    table = json.loads(data)
    # hlo_stats schema: list with {cols: [...], rows: [{c: [{v:..}]}]}
    tbl = table[0] if isinstance(table, list) else table
    cols = [c["label"] for c in tbl["cols"]]
    rows = [[cell.get("v") for cell in r["c"]] for r in tbl["rows"]]
    i_name = cols.index("HLO Expression") if "HLO Expression" in cols else None
    i_cat = next((i for i, c in enumerate(cols) if "category" in c.lower()), None)
    i_time = next(
        (i for i, c in enumerate(cols) if "total time" in c.lower()
         or "self time" in c.lower()), None)
    i_prog = next((i for i, c in enumerate(cols) if "program" in c.lower()), None)
    print("columns:", cols)
    # rollup by category
    by_cat = {}
    for r in rows:
        cat = r[i_cat] if i_cat is not None else "?"
        t = float(r[i_time] or 0.0) if i_time is not None else 0.0
        by_cat[cat] = by_cat.get(cat, 0.0) + t
    tot = sum(by_cat.values())
    print(f"\n== category rollup (us over {n_steps} steps; /step = /{n_steps}) ==")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{cat:40s} {t:12.0f} us  {t / n_steps / 1e3:8.2f} ms/step  {100 * t / tot:5.1f}%")
    # top ops
    rows.sort(key=lambda r: -(float(r[i_time] or 0.0) if i_time is not None else 0.0))
    print("\n== top 25 ops ==")
    for r in rows[:25]:
        nm = (r[i_name] or "")[:110] if i_name is not None else "?"
        t = float(r[i_time] or 0.0)
        print(f"{t / n_steps / 1e3:8.2f} ms/step  {r[i_cat] if i_cat is not None else '?':28s} {nm}")


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/trace_train_step"
    if not os.environ.get("PARSE_ONLY"):
        capture(bs, outdir)
    parse(outdir)

"""Plotting / media logging (matplotlib, librosa-free).

Re-design of `mod_extraction/plotting.py` + the media callbacks
(`mod_extraction/callbacks.py:37-184`): spectrogram images, mod-sig
overlay plots (with the paper's L1%-error title), and stacked waveform
plots — saved as PNGs (and optionally WAVs) under the out dir on val
batch 0 instead of pushed to wandb.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from mod_extraction_tpu.data.wav import wav_write  # noqa: E402
from mod_extraction_tpu.ops.stft import hann_window  # noqa: E402
from mod_extraction_tpu.paths import OUT_DIR, ensure_dir  # noqa: E402


def _log_spec(audio: np.ndarray, n_fft: int = 512, hop: int = 128) -> np.ndarray:
    pad = n_fft // 2
    x = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = (len(x) - n_fft) // hop + 1
    win = hann_window(n_fft)
    frames = np.stack([x[i * hop : i * hop + n_fft] * win for i in range(n_frames)])
    mag = np.abs(np.fft.rfft(frames, axis=-1)).T
    return np.log(np.maximum(mag, 1e-7))


def plot_spectrogram(
    audio: np.ndarray,
    save_name: str,
    title: str = "",
    sr: float = 44100.0,
    save_dir: Optional[str] = None,
    save_audio: bool = False,
) -> str:
    """Log-spectrogram PNG (reference `plotting.py:35-68`); optional WAV."""
    save_dir = ensure_dir(save_dir or os.path.join(OUT_DIR, "media"))
    audio = np.asarray(audio).reshape(-1)
    spec = _log_spec(audio)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.imshow(spec, origin="lower", aspect="auto", cmap="magma")
    ax.set_title(title or save_name)
    ax.set_xlabel("frames")
    ax.set_ylabel("bins")
    path = os.path.join(save_dir, f"{save_name}.png")
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    if save_audio:
        # short fade to avoid clicks (reference applies torchaudio Fade)
        fade = min(256, len(audio) // 8)
        env = np.ones_like(audio)
        ramp = np.linspace(0.0, 1.0, fade, dtype=audio.dtype)
        env[:fade] = ramp
        env[-fade:] = ramp[::-1]
        wav_write(os.path.join(save_dir, f"{save_name}.wav"), audio * env, int(sr))
    return path


def plot_mod_sig(
    mod_sig_hat: np.ndarray,
    mod_sig: Optional[np.ndarray] = None,
    save_name: str = "mod_sig",
    save_dir: Optional[str] = None,
) -> str:
    """Overlayed GT/estimate LFO plot with L1%-error title
    (reference `plotting.py:71-97`)."""
    save_dir = ensure_dir(save_dir or os.path.join(OUT_DIR, "media"))
    mod_sig_hat = np.asarray(mod_sig_hat).reshape(-1)
    fig, ax = plt.subplots(figsize=(6, 2.5))
    ax.plot(mod_sig_hat, label="mod_sig_hat", color="tab:orange")
    title = save_name
    if mod_sig is not None:
        mod_sig = np.asarray(mod_sig).reshape(-1)
        n = min(len(mod_sig), len(mod_sig_hat))
        ax.plot(mod_sig[:n], label="mod_sig", color="tab:blue", alpha=0.7)
        l1 = float(np.mean(np.abs(mod_sig[:n] - mod_sig_hat[:n])))
        title = f"{save_name}  l1: {l1 * 100:.2f}%"
    ax.set_ylim(-0.05, 1.05)
    ax.set_title(title)
    ax.legend(loc="upper right", fontsize=7)
    path = os.path.join(save_dir, f"{save_name}.png")
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_waveforms_stacked(
    waveforms: list[np.ndarray],
    labels: list[str],
    save_name: str = "waveforms",
    sr: float = 44100.0,
    save_dir: Optional[str] = None,
) -> str:
    """Stacked waveform plot (reference `plotting.py:113-155`)."""
    save_dir = ensure_dir(save_dir or os.path.join(OUT_DIR, "media"))
    n = len(waveforms)
    fig, axes = plt.subplots(n, 1, figsize=(6, 1.6 * n), sharex=True)
    if n == 1:
        axes = [axes]
    for ax, w, label in zip(axes, waveforms, labels):
        w = np.asarray(w).reshape(-1)
        t = np.arange(len(w)) / sr
        ax.plot(t, w, linewidth=0.4)
        ax.set_ylabel(label, fontsize=8)
        ax.set_ylim(-1.05, 1.05)
    axes[-1].set_xlabel("seconds")
    path = os.path.join(save_dir, f"{save_name}.png")
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


def lfo_media_callback(max_examples: int = 4):
    """Media hook for Trainer: on val batch 0, save spectrograms + LFO
    overlays for the first few examples (reference `callbacks.py:37-99`)."""

    def cb(trainer, params, batch, epoch):
        import jax

        from mod_extraction_tpu.train.render import render_batch

        task = trainer.task
        host = jax.tree.map(np.asarray, batch)
        dry, wet, mod_frames, fx = jax.tree.map(
            np.asarray,
            render_batch(host, task.render_cfg, trainer.corpus),
        )
        key = jax.random.PRNGKey(0)
        mod_hat, _ = task._extract(params, dry, wet, fx, key, train=False)
        mod_hat, mod_gt = task._postprocess(np.asarray(mod_hat), mod_frames)
        save_dir = ensure_dir(
            os.path.join(trainer.out_dir, trainer.run_name + "_media", f"ep{epoch}")
        )
        for i in range(min(max_examples, dry.shape[0])):
            plot_mod_sig(
                np.asarray(mod_hat)[i], np.asarray(mod_gt)[i],
                save_name=f"{i}_mod_sig", save_dir=save_dir,
            )
            plot_spectrogram(
                wet[i, 0], f"{i}_wet", sr=task.render_cfg.sr, save_dir=save_dir
            )
        return None

    return cb


def em_media_callback(max_examples: int = 4, save_audio: bool = True):
    """Media hook for the TBPTT effect-model Trainer: on val batch 0, save
    stacked dry/wet/wet_hat waveform plots + audio for the first few
    examples (reference `callbacks.py:102-184`, LogAudioCallback)."""

    def cb(trainer, params, batch, epoch):
        import jax

        from mod_extraction_tpu.models.lstm import lstm_init_state

        task = trainer.task
        key = jax.random.PRNGKey(0)
        dry, wet, mod_sr, _, _, _, _ = task._prepare(batch, key)
        b = dry.shape[0]
        h0 = lstm_init_state(b, task.effect_model.n_hidden)
        wet_hat, _ = task.effect_model.apply(params, dry, mod_sr, h0)
        dry, wet, wet_hat = (np.asarray(a) for a in (dry, wet, wet_hat))
        sr = task.render_cfg.sr
        save_dir = ensure_dir(
            os.path.join(trainer.out_dir, trainer.run_name + "_media", f"ep{epoch}")
        )
        for i in range(min(max_examples, b)):
            plot_waveforms_stacked(
                [dry[i, 0], wet[i, 0], wet_hat[i, 0]],
                ["dry", "wet", "wet_hat"],
                save_name=f"{i}_waveforms",
                sr=sr,
                save_dir=save_dir,
            )
            if save_audio:
                for name, a in (("dry", dry), ("wet", wet), ("wet_hat", wet_hat)):
                    wav_write(
                        os.path.join(save_dir, f"{i}_{name}.wav"),
                        a[i], int(sr),
                    )
        return None

    return cb

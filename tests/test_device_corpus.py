"""Device-resident corpus mode (data/corpus.py): batches carry chunk
offsets, the render stage gathers from one flat int16 HBM array.
Must be bit-identical to the int16 wire format, incl. dry/wet pairing,
peak-norm gains, and the full fit loop on the 8-device mesh."""

import os

import jax
import numpy as np

from mod_extraction_tpu.data.modules import (
    PedalboardPhaserDataModule,
    RandomAudioChunkDryWetDataModule,
)
from mod_extraction_tpu.data.wav import wav_write
from mod_extraction_tpu.train.render import RenderConfig, render_batch

SR, N = 8000, 4000

PHASER_FX = {
    "pedalboard_phaser": {
        "rate_hz": {"min": 0.5, "max": 3.0},
        "depth": {"min": 0.2, "max": 1.0},
        "centre_frequency_hz": {"min": 70.0, "max": 3000.0},
        "feedback": {"min": 0.0, "max": 0.7},
        "mix": {"min": 0.2, "max": 1.0},
    }
}


def _write_wavs(d, n_files=2, stereo=False, seed=0):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n_files):
        c = 2 if stereo else 1
        a = rng.uniform(-0.5, 0.5, (c, 3 * SR)).astype(np.float32)
        wav_write(os.path.join(d, f"f{i}.wav"), a, SR)


def _phaser_dm(tmp, **kw):
    return PedalboardPhaserDataModule(
        batch_size=8,
        train_dir=os.path.join(tmp, "wavs"),
        val_dir=os.path.join(tmp, "wavs"),
        train_num_examples_per_epoch=8,
        val_num_examples_per_epoch=8,
        n_samples=N,
        sr=SR,
        check_dataset=False,
        fx_config=PHASER_FX,
        num_workers=0,
        **kw,
    )


def test_corpus_batch_matches_int16_wire(tmp_path):
    tmp = str(tmp_path)
    _write_wavs(os.path.join(tmp, "wavs"), stereo=True)

    wire = _phaser_dm(tmp, transfer_dtype="int16")
    wire.setup("fit")
    corp = _phaser_dm(tmp, device_corpus=True)
    corp.setup("fit")
    corpus = corp.corpus_payload()

    b_wire = next(wire.train_loader().epoch(0))
    b_corp = next(corp.train_loader().epoch(0))
    assert "dry" not in b_corp and b_corp["dry_idx"].dtype == np.int32

    cfg = RenderConfig(sr=SR, n_samples=N, effects=(1,))  # phaser
    d1, w1, m1, fx1 = jax.tree.map(np.asarray, render_batch(b_wire, cfg))
    d2, w2, m2, fx2 = jax.tree.map(
        np.asarray, render_batch(b_corp, cfg, jax.numpy.asarray(corpus))
    )
    # identical host draws (same seed), identical quantization path
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(m1, m2)
    for k in fx1:
        np.testing.assert_array_equal(fx1[k], fx2[k])


def test_drywet_corpus_with_peak_norm(tmp_path):
    tmp = str(tmp_path)
    _write_wavs(os.path.join(tmp, "dry"), seed=1)
    _write_wavs(os.path.join(tmp, "wet"), seed=2)

    def dm(**kw):
        return RandomAudioChunkDryWetDataModule(
            batch_size=8,
            dry_train_dir=os.path.join(tmp, "dry"),
            dry_val_dir=os.path.join(tmp, "dry"),
            wet_train_dir=os.path.join(tmp, "wet"),
            wet_val_dir=os.path.join(tmp, "wet"),
            train_num_examples_per_epoch=8,
            val_num_examples_per_epoch=8,
            n_samples=N,
            sr=SR,
            check_dataset=False,
            should_peak_norm=True,
            num_workers=0,
            **kw,
        )

    wire = dm(transfer_dtype="int16")
    wire.setup("fit")
    corp = dm(device_corpus=True)
    corp.setup("fit")
    corpus = corp.corpus_payload()

    b_wire = next(wire.train_loader().epoch(0))
    b_corp = next(corp.train_loader().epoch(0))
    cfg = RenderConfig(sr=SR, n_samples=N, effects=())
    d1, w1, _, _ = jax.tree.map(np.asarray, render_batch(b_wire, cfg))
    d2, w2, _, _ = jax.tree.map(
        np.asarray, render_batch(b_corp, cfg, jax.numpy.asarray(corpus))
    )
    # wire path quantizes AFTER peak norm, corpus path applies the gain
    # after dequantizing the raw int16 — equal up to one int16 LSB * gain
    tol = 2.0 / 32768.0 * float(np.abs(b_corp["dry_gain"]).max() + 1)
    np.testing.assert_allclose(d1, d2, atol=tol)
    np.testing.assert_allclose(w1, w2, atol=tol)


def test_fit_end_to_end_with_device_corpus(tmp_path):
    """Full Trainer loop on the 8-device mesh: corpus replicated, batch
    (and its dry_idx) sharded on the data axis."""
    import optax

    from mod_extraction_tpu.models import Spectral2DCNN
    from mod_extraction_tpu.train.lfo_task import LFOExtractionTask
    from mod_extraction_tpu.train.loop import Trainer

    tmp = str(tmp_path)
    _write_wavs(os.path.join(tmp, "wavs"))
    dm = _phaser_dm(tmp, device_corpus=True)
    model = Spectral2DCNN(
        in_ch=2, n_samples=N, sr=SR, n_fft=256, hop_len=64, n_mels=16,
        out_channels=(4, 4), bin_dilations=(1, 1), temp_dilations=(1, 2),
        pool_size=(2, 1),
    )
    task = LFOExtractionTask(
        model=model,
        render_cfg=dm.render_cfg,
        optimizer=optax.adamw(1e-4),
        loss_dict={"l1": 1.0},
    )
    trainer = Trainer(task, dm, max_epochs=1, out_dir=os.path.join(tmp, "out"))
    state = trainer.fit()
    assert trainer.corpus is not None
    assert int(np.asarray(state.step)) == 1


def test_one_compiled_step_reads_the_corpus_passed_per_call(tmp_path):
    """The corpus is a traced step ARGUMENT: calling the same compiled
    val step with a different corpus must change the result (guards the
    validate_many sweep against trace-time corpus capture)."""
    import optax

    from mod_extraction_tpu.models import Spectral2DCNN
    from mod_extraction_tpu.train.lfo_task import LFOExtractionTask

    tmp = str(tmp_path)
    _write_wavs(os.path.join(tmp, "wavs"))
    dm = _phaser_dm(tmp, device_corpus=True)
    dm.setup("fit")
    corpus = jax.numpy.asarray(dm.corpus_payload())
    model = Spectral2DCNN(
        in_ch=2, n_samples=N, sr=SR, n_fft=256, hop_len=64, n_mels=16,
        out_channels=(4, 4), bin_dilations=(1, 1), temp_dilations=(1, 2),
        pool_size=(2, 1),
    )
    task = LFOExtractionTask(
        model=model, render_cfg=dm.render_cfg,
        optimizer=optax.adamw(1e-4), loss_dict={"l1": 1.0},
    )
    state = task.init_state(jax.random.PRNGKey(0))
    batch = next(dm.val_loader().epoch(0))
    batch = jax.tree.map(jax.numpy.asarray, batch)
    key = jax.random.PRNGKey(1)
    m1 = task.val_step(state.params, batch, key, corpus)
    m2 = task.val_step(state.params, batch, key, corpus * 0)  # silence
    assert float(m1["loss"]) != float(m2["loss"])

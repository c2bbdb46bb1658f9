"""Media-callback cadence: the Trainer only invokes the media hook every
`media_every_n_epochs`-th epoch (the hook pulls full audio batches to
host and renders matplotlib figures — too expensive to run per epoch on
remote-TPU hosts), while epoch 0 always logs (so plain `validate()` eval
runs keep producing media)."""

import numpy as np

from mod_extraction_tpu.train.loop import Trainer


class _StubLoader:
    def epoch(self, epoch):
        yield {"x": np.zeros((8, 4), np.float32)}


class _StubTask:
    def val_step(self, params, batch, key, corpus):
        return {"loss": np.float32(0.25)}


class _StubDM:
    def corpus_payload(self):
        return None


def _trainer(tmp_path, every):
    calls = []
    t = Trainer(
        _StubTask(),
        _StubDM(),
        out_dir=str(tmp_path),
        run_name="media_cadence",
        media_callback=lambda tr, params, batch, epoch: calls.append(epoch),
        media_every_n_epochs=every,
    )
    return t, calls


def test_media_only_on_cadence_epochs(tmp_path):
    trainer, calls = _trainer(tmp_path, every=10)
    for epoch in range(12):
        m = trainer.validate(None, _StubLoader(), epoch)
        assert m == {"loss": 0.25}
    assert calls == [0, 10]


def test_media_every_epoch_when_one(tmp_path):
    trainer, calls = _trainer(tmp_path, every=1)
    for epoch in range(3):
        trainer.validate(None, _StubLoader(), epoch)
    assert calls == [0, 1, 2]

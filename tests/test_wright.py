"""Parity of the Wright reference losses vs direct torch ports of the
CoreAudioML formulas (`mod_extraction/wright_code.py:15-73`)."""

import numpy as np
import torch as tr

from mod_extraction_tpu.losses.wright import (
    wright_dc_loss,
    wright_esr_loss,
    wright_pre_emph,
)


def test_wright_esr_dc_match_torch(rng):
    y_hat = rng.standard_normal((7, 3, 1)).astype(np.float32)
    y = rng.standard_normal((7, 3, 1)).astype(np.float32)
    to, tt = tr.from_numpy(y_hat), tr.from_numpy(y)

    esr_ref = (tr.mean((tt - to) ** 2) / tr.mean(tt**2)).item()
    dc_ref = (
        tr.mean((tr.mean(tt, 0) - tr.mean(to, 0)) ** 2) / tr.mean(tt**2)
    ).item()

    np.testing.assert_allclose(float(wright_esr_loss(y_hat, y)), esr_ref, rtol=1e-5)
    np.testing.assert_allclose(float(wright_dc_loss(y_hat, y)), dc_ref, rtol=1e-5)


def test_wright_pre_emph_matches_torch(rng):
    t, b = 50, 2
    cfs = [-0.85, 1.0]
    y_hat = rng.standard_normal((t, b, 1)).astype(np.float32)
    y = rng.standard_normal((t, b, 1)).astype(np.float32)

    conv = tr.nn.Conv1d(1, 1, kernel_size=2, bias=False)
    conv.weight.data = tr.tensor([[cfs]])
    z = tr.zeros(1, b, 1)

    def ref(x):
        xp = tr.cat((z, tr.from_numpy(x)))
        return conv(xp.permute(1, 2, 0)).permute(2, 0, 1).detach().numpy()

    out, tgt = wright_pre_emph(y_hat, y, cfs)
    np.testing.assert_allclose(np.asarray(out), ref(y_hat), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tgt), ref(y), atol=1e-6)

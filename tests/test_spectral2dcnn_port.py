"""Full-model port parity for Spectral2DCNN: build the reference's CNN
trunk in torch (LN -> dilated 'same' Conv2d -> MaxPool(2,1) -> PReLU,
stack of L; freq-mean; 1x1 Conv1d; sigmoid — `mod_extraction/models.py:
128-215`), port its state_dict with `port_spectral_2dcnn`, and compare
outputs on identical spectrogram features (frontend bypassed so the test
isolates the trunk + key mapping)."""

import jax
import numpy as np
import pytest
import torch
import torch.nn as tnn

from mod_extraction_tpu.models.spectral_2dcnn import Spectral2DCNN
from mod_extraction_tpu.models.torch_port import port_spectral_2dcnn


class TorchRefCNN(tnn.Module):
    def __init__(self, in_ch, n_mels, n_frames, chans, temp_dils, latent_dim=1):
        super().__init__()
        layers = []
        bins = n_mels
        prev = in_ch
        for ch, d in zip(chans, temp_dils):
            layers.append(tnn.LayerNorm([bins, n_frames], elementwise_affine=False))
            layers.append(
                tnn.Conv2d(prev, ch, (5, 13), dilation=(1, d), padding="same")
            )
            layers.append(tnn.MaxPool2d((2, 1)))
            layers.append(tnn.PReLU(ch))
            bins //= 2
            prev = ch
        self.cnn = tnn.Sequential(*layers)
        self.output = tnn.Conv1d(prev, latent_dim, 1)

    def forward(self, spec):
        h = torch.log(torch.clamp(spec, min=1e-7))
        h = self.cnn(h)
        h = torch.mean(h, dim=-2)
        return torch.sigmoid(self.output(h))


def test_spectral2dcnn_port_full_model(rng):
    in_ch, n_mels, n_frames = 2, 32, 40
    chans, dils = [8, 8, 8], [1, 2, 4]
    spec = rng.uniform(0.0, 2.0, (3, in_ch, n_mels, n_frames)).astype(np.float32)

    ref = TorchRefCNN(in_ch, n_mels, n_frames, chans, dils)
    ref.eval()
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(spec)).numpy()

    model = Spectral2DCNN(
        in_ch=in_ch, n_samples=n_frames * 256 - 256, sr=44100,
        n_mels=n_mels, out_channels=tuple(chans),
        bin_dilations=(1,) * len(chans), temp_dilations=tuple(dils),
        pool_size=(2, 1),
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"params": port_spectral_2dcnn(sd, len(chans))}
    import jax.numpy as jnp

    x_dummy = jnp.zeros((3, in_ch, 8))  # unused when features are given
    with jax.default_matmul_precision("highest"):
        out, latent = model.apply(params, x_dummy, features=jnp.asarray(spec))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=5e-5)
    assert latent.shape == (3, chans[-1], n_frames)

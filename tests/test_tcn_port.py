"""TCN torch-port parity: build the reference's non-causal TCN trunk in
torch (LN(no affine, [C, T]) -> dilated 'same' Conv1d -> PReLU -> 1x1
residual, `mod_extraction/tcn.py:103-232`), port its state_dict with
`port_tcn`, and compare outputs — pins both the key mapping and the
padding/residual-crop semantics."""

import jax
import numpy as np
import torch
import torch.nn as tnn

from mod_extraction_tpu.models.tcn import TCN
from mod_extraction_tpu.models.torch_port import port_tcn


class TorchRefBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, k, dil, temporal_dim):
        super().__init__()
        self.ln = tnn.LayerNorm([in_ch, temporal_dim], elementwise_affine=False)
        pad = k // 2 * dil  # reference padding=None, non-causal
        self.conv = tnn.Conv1d(in_ch, out_ch, k, dilation=dil, padding=pad)
        self.act = tnn.PReLU(out_ch)
        self.res = tnn.Conv1d(in_ch, out_ch, 1, bias=False)

    def forward(self, x):
        x_in = x
        h = self.act(self.conv(self.ln(x)))
        res = self.res(x_in)
        # center crop the residual to the conv output length
        extra = res.size(-1) - h.size(-1)
        if extra > 0:
            res = res[:, :, extra // 2 : extra // 2 + h.size(-1)]
        return h + res


class TorchRefTCN(tnn.Module):
    def __init__(self, in_ch, chans, dils, k, temporal_dim):
        super().__init__()
        blocks, prev = [], in_ch
        for ch, d in zip(chans, dils):
            blocks.append(TorchRefBlock(prev, ch, k, d, temporal_dim))
            prev = ch
        self.blocks = tnn.ModuleList(blocks)

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        return x


def test_tcn_port_noncausal_parity(rng):
    in_ch, t, k = 6, 60, 5
    chans, dils = [8, 8, 8], [1, 2, 4]
    x = rng.standard_normal((2, in_ch, t)).astype(np.float32)

    ref = TorchRefTCN(in_ch, chans, dils, k, t)
    ref.eval()
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()

    sd = {kk: v.detach().numpy() for kk, v in ref.state_dict().items()}
    params = {"params": port_tcn(sd, len(chans))}
    tcn = TCN(
        chans, dils, in_ch=in_ch, kernel_size=k, padding=None, use_ln=True,
        temporal_dims=[t] * len(chans), use_res=True, is_causal=False,
    )
    import jax.numpy as jnp

    with jax.default_matmul_precision("highest"):
        out = tcn.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=5e-5)

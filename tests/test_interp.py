"""Parity of linear resampling vs torch.nn.functional.interpolate."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mod_extraction_tpu.utils.interp import linear_interpolate_last_dim


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("n_in,n_out", [(441, 345), (345, 88200), (10, 3), (3, 10), (7, 7)])
def test_matches_torch(rng, align_corners, n_in, n_out):
    x = rng.standard_normal((4, n_in)).astype(np.float32)
    ours = np.asarray(linear_interpolate_last_dim(x, n_out, align_corners))
    theirs = (
        F.interpolate(
            torch.from_numpy(x).unsqueeze(1),
            n_out,
            mode="linear",
            align_corners=align_corners,
        )
        .squeeze(1)
        .numpy()
    )
    # torch computes source positions in float32 on CPU; ours are exact
    # float64 — semantically identical linear interp, ~1e-4 float noise.
    np.testing.assert_allclose(ours, theirs, rtol=1e-2, atol=3e-4)


def test_leading_dims(rng):
    x = rng.standard_normal((2, 3, 50)).astype(np.float32)
    out = np.asarray(linear_interpolate_last_dim(x, 20))
    assert out.shape == (2, 3, 20)
    # endpoint exactness under align_corners=True
    np.testing.assert_allclose(out[..., 0], x[..., 0], rtol=1e-6)
    np.testing.assert_allclose(out[..., -1], x[..., -1], rtol=1e-6)

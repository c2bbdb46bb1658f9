"""Pallas kernel parity: interpret-mode kernels vs the `lax.scan`
reference implementations (which are themselves torch-parity tested in
`test_fx.py`).  Uses short sequences + small delay lines so interpret
mode stays fast; exercises the time-chunked grid (t_chunk < T) so the
cross-chunk VMEM state carry is covered."""

import jax.numpy as jnp
import numpy as np

from mod_extraction_tpu.ops.fx import _flanger_scan, _phaser_scan
from mod_extraction_tpu.ops.pallas_fx import flanger_pallas, phaser_pallas


def test_flanger_pallas_matches_scan(rng):
    b, c, t, d = 3, 2, 500, 37
    x = rng.uniform(-0.5, 0.5, (b, c, t)).astype(np.float32)
    mod = rng.uniform(0, 1, (b, c, t)).astype(np.float32)
    delay = (mod * (d - 2) + 0.5).astype(np.float32)
    fb = rng.uniform(0, 0.4, (b, 1, 1)).astype(np.float32)
    depth = rng.uniform(0.5, 1.0, (b, 1, 1)).astype(np.float32)
    mix = rng.uniform(0.5, 1.0, (b, 1, 1)).astype(np.float32)

    ref = _flanger_scan(
        jnp.asarray(x), jnp.asarray(delay), jnp.asarray(fb), jnp.asarray(depth),
        jnp.asarray(mix), d,
    )
    out = flanger_pallas(
        jnp.asarray(x), jnp.asarray(delay), jnp.asarray(fb), jnp.asarray(depth),
        jnp.asarray(mix), d, t_chunk=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_phaser_pallas_matches_scan(rng):
    b, c, t, n_stages = 2, 1, 700, 6
    x = rng.uniform(-0.5, 0.5, (b, c, t)).astype(np.float32)
    g = rng.uniform(0.01, 1.5, (b, c, t)).astype(np.float32)
    fb = rng.uniform(0, 0.6, (b, 1, 1)).astype(np.float32)
    mix = rng.uniform(0.3, 1.0, (b, 1, 1)).astype(np.float32)

    ref = _phaser_scan(jnp.asarray(x), jnp.asarray(g), jnp.asarray(fb),
                       jnp.asarray(mix), n_stages)
    out = phaser_pallas(jnp.asarray(x), jnp.asarray(g), jnp.asarray(fb),
                        jnp.asarray(mix), n_stages=n_stages, t_chunk=256,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_flanger_pallas_multi_tile_and_chorus_regime(rng):
    """Batch*channels > 128 exercises the second lane tile (scratch must
    reset per tile); chorus delay regime uses the long (~1.7k-slot) line."""
    b, c, t, d = 70, 2, 300, 200  # b*c = 140 -> 2 lane tiles
    x = rng.uniform(-0.5, 0.5, (b, c, t)).astype(np.float32)
    mod = rng.uniform(0, 1, (b, c, t)).astype(np.float32)
    delay = (mod * (d - 62) + 60.0).astype(np.float32)  # chorus-like offsets
    fb = rng.uniform(0, 0.5, (b, 1, 1)).astype(np.float32)
    depth = rng.uniform(0.5, 1.0, (b, 1, 1)).astype(np.float32)
    mix = rng.uniform(0.5, 1.0, (b, 1, 1)).astype(np.float32)
    ref = _flanger_scan(
        jnp.asarray(x), jnp.asarray(delay), jnp.asarray(fb), jnp.asarray(depth),
        jnp.asarray(mix), d,
    )
    out = flanger_pallas(
        jnp.asarray(x), jnp.asarray(delay), jnp.asarray(fb), jnp.asarray(depth),
        jnp.asarray(mix), d, t_chunk=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

"""Loss parity vs torch formulas + weighting semantics."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mod_extraction_tpu.losses import (
    WeightedLossDict,
    dc_loss,
    esr_loss,
    first_derivative_l1_loss,
    get_loss_func_by_name,
    l1_loss,
    mr_stft_loss,
    mse_loss,
    second_derivative_l1_loss,
)


@pytest.fixture
def pair(rng):
    y_hat = rng.standard_normal((4, 2, 100)).astype(np.float32)
    y = rng.standard_normal((4, 2, 100)).astype(np.float32)
    return y_hat, y


def test_l1_mse(pair):
    y_hat, y = pair
    assert float(l1_loss(y_hat, y)) == pytest.approx(np.abs(y_hat - y).mean(), rel=1e-5)
    assert float(mse_loss(y_hat, y)) == pytest.approx(((y_hat - y) ** 2).mean(), rel=1e-5)


def test_esr_dc_match_reference_formula(pair):
    y_hat, y = pair
    num = ((y - y_hat) ** 2).sum(-1)
    den = (y**2).sum(-1) + 1e-8
    assert float(esr_loss(y_hat, y)) == pytest.approx((num / den).mean(), rel=1e-5)
    num = (y - y_hat).mean(-1) ** 2
    den = (y**2).mean(-1) + 1e-8
    assert float(dc_loss(y_hat, y)) == pytest.approx((num / den).mean(), rel=1e-5)


def test_derivative_losses(pair):
    y_hat, y = pair
    d = lambda x: (x[..., 2:] - x[..., :-2]) / 2
    assert float(first_derivative_l1_loss(y_hat, y)) == pytest.approx(
        np.abs(d(y_hat) - d(y)).mean(), rel=1e-5
    )
    assert float(second_derivative_l1_loss(y_hat, y)) == pytest.approx(
        np.abs(d(d(y_hat)) - d(d(y))).mean(), rel=1e-5
    )


def test_weights_drop_examples(pair):
    y_hat, y = pair
    w = np.array([1.0, 1.0, 0.0, 0.0], np.float32)
    full = float(l1_loss(y_hat[:2], y[:2]))
    masked = float(l1_loss(y_hat, y, w))
    assert masked == pytest.approx(full, rel=1e-5)


def test_weighted_loss_dict(pair):
    y_hat, y = pair
    agg = WeightedLossDict({"l1": 1.0, "fdl1": 5.0, "sdl1": 10.0, "mse": 0.0})
    total, metrics = agg(jnp.asarray(y_hat), jnp.asarray(y))
    expect = (
        float(l1_loss(y_hat, y))
        + 5 * float(first_derivative_l1_loss(y_hat, y))
        + 10 * float(second_derivative_l1_loss(y_hat, y))
    )
    assert float(total) == pytest.approx(expect, rel=1e-5)
    assert set(metrics) == {"l1", "fdl1", "sdl1", "mse", "loss"}
    # zero-weighted mse is still reported
    assert float(metrics["mse"]) == pytest.approx(((y_hat - y) ** 2).mean(), rel=1e-5)


def test_registry():
    for name in ("l1", "fdl1", "sdl1", "mse", "esr", "dc", "mrstft", "log_mel_l1"):
        assert callable(get_loss_func_by_name(name))
    with pytest.raises(KeyError):
        get_loss_func_by_name("nope")


def test_mr_stft_sanity(rng):
    y = (0.3 * rng.standard_normal((2, 1, 4096))).astype(np.float32)
    noisy = y + 0.1 * rng.standard_normal(y.shape).astype(np.float32)
    zero_ish = float(mr_stft_loss(y, y))
    noisy_val = float(mr_stft_loss(noisy, y))
    assert zero_ish < 1e-4
    assert noisy_val > 0.1

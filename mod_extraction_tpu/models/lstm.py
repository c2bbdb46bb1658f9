"""LSTMEffectModel — the conditional LSTM-64 black-box effect model.

TPU-native re-design of the reference (`mod_extraction/models.py:311-339`):
concat(latent, x) on the channel axis -> single-layer LSTM -> Dense ->
residual add of the input -> tanh.  Hidden state is an EXPLICIT pytree
argument/return (no module-held mutable state like the reference's
`HiddenStateModel`, `models.py:292-308`), which makes TBPTT
(`detach_hidden` == `stop_gradient`) and streaming inference trivial
under `jit`.

TPU mapping: the input projection for the whole chunk is one batched
matmul (MXU); only the (B, H) @ (H, 4H) recurrent matvec lives in the
`lax.scan` body.  Gate order is torch's (i, f, g, o) so reference
checkpoints port directly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

LSTMState = Tuple[jnp.ndarray, jnp.ndarray]  # (h, c), each (B, H)


def lstm_init_state(batch_size: int, n_hidden: int, dtype=jnp.float32) -> LSTMState:
    z = jnp.zeros((batch_size, n_hidden), dtype)
    return (z, z)


def detach_state(state: LSTMState) -> LSTMState:
    """TBPTT hidden detach (reference `models.py:302-305`)."""
    return jax.tree.map(jax.lax.stop_gradient, state)


class LSTMEffectModel(nn.Module):
    in_ch: int = 1
    out_ch: int = 1
    n_hidden: int = 64
    latent_dim: int = 1
    # lax.scan unroll factor: trades compile time for lower per-step while-
    # loop overhead on the latency-bound sample-rate recurrence.
    unroll: int = 8

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, latent: jnp.ndarray, state: LSTMState
    ) -> Tuple[jnp.ndarray, LSTMState]:
        """x: (B, in_ch, T); latent: (B, latent_dim, T); state: ((B,H),(B,H)).

        Returns (y_hat (B, out_ch, T), new_state)."""
        assert x.ndim == 3
        b, _, t = x.shape
        h0, c0 = state
        in_dim = self.in_ch + self.latent_dim
        hid = self.n_hidden

        # torch LSTM init: U[-1/sqrt(H), 1/sqrt(H)] for all weights/biases.
        def u_init(key, shape, dtype=jnp.float32):
            k = 1.0 / jnp.sqrt(hid)
            return jax.random.uniform(key, shape, dtype, -k, k)

        w_ih = self.param("w_ih", u_init, (in_dim, 4 * hid))
        w_hh = self.param("w_hh", u_init, (hid, 4 * hid))
        # single fused bias (= torch's b_ih + b_hh when porting weights)
        b_gates = self.param("b_gates", u_init, (4 * hid,))

        seq = jnp.concatenate([latent, x], axis=1)  # (B, in+lat, T)
        seq = jnp.transpose(seq, (2, 0, 1))  # (T, B, in_dim)
        gx = seq @ w_ih + b_gates  # one big MXU matmul for the whole chunk

        def step(carry, gx_t):
            h, c = carry
            gates = gx_t + h @ w_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)  # torch gate order
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        (h_n, c_n), hs = jax.lax.scan(
            step, (h0, c0), gx, unroll=self.unroll
        )  # hs: (T, B, H)

        fc = nn.Dense(self.out_ch, name="fc")
        y = fc(hs)  # (T, B, out_ch)
        y = jnp.transpose(y, (1, 2, 0))  # (B, out_ch, T)
        y = jnp.tanh(y + x)  # residual + tanh (models.py:336-337)
        return y, (h_n, c_n)

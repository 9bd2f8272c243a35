"""Recurrent module with 'step' and 'batch' modes, GRU/LSTM cells, optional
bidirectional batch mode — functional port of the reference RNN wrapper
(``kin_poly/models/rnn.py`` / ``uhc/khrylib/models/rnn.py``).

In JAX the hidden state is explicit: `step` takes and returns the carry;
`batch` scans over the time axis (axis 0 or 1)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class RNN(nn.Module):
    hidden_dim: int
    cell_type: str = "gru"      # 'gru' | 'lstm'
    bi_dir: bool = False

    def setup(self):
        if self.cell_type == "gru":
            self.cell = nn.GRUCell(features=self.hidden_dim)
        elif self.cell_type == "lstm":
            self.cell = nn.OptimizedLSTMCell(features=self.hidden_dim)
        else:
            raise ValueError(self.cell_type)
        if self.bi_dir:
            if self.cell_type == "gru":
                self.cell_bwd = nn.GRUCell(features=self.hidden_dim)
            else:
                self.cell_bwd = nn.OptimizedLSTMCell(features=self.hidden_dim)

    def init_carry(self, batch_shape=(), dtype=jnp.float32):
        if self.cell_type == "gru":
            return jnp.zeros(batch_shape + (self.hidden_dim,), dtype)
        return (jnp.zeros(batch_shape + (self.hidden_dim,), dtype),
                jnp.zeros(batch_shape + (self.hidden_dim,), dtype))

    def step(self, carry, x):
        """One step: (carry, (..., in)) -> (carry, (..., hidden))."""
        return self.cell(carry, x)

    def __call__(self, x, time_axis: int = 1):
        """Batch mode: scan over `time_axis` of x; returns per-step outputs
        (concatenated fwd+bwd when bi_dir)."""
        xs = jnp.moveaxis(x, time_axis, 0)
        B = xs.shape[1:-1]
        carry0 = self.init_carry(B, x.dtype)

        def fwd(cell, carry, xt):
            return cell(carry, xt)

        scan = nn.transforms.scan(fwd, variable_broadcast="params",
                                  split_rngs={"params": False})
        _, out = scan(self.cell, carry0, xs)
        if self.bi_dir:
            _, out_b = scan(self.cell_bwd, self.init_carry(B, x.dtype), xs[::-1])
            out = jnp.concatenate([out, out_b[::-1]], axis=-1)
        return jnp.moveaxis(out, 0, time_axis)

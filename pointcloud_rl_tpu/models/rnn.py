"""Recurrent policy module (GRU) with episode-aware sequence handling.

The reference exposes a recurrent branch throughout (Visuomotor rnn_cfg,
SAC's is_recurrent path, RNN-state threading in rollout) but its snapshot
ships no working RNN module — torch layers were auto-registered but cannot
accept the (rnn_states, episode_dones, rnn_mode) call contract.  This is a
functional implementation of that contract:

* step mode  (rollout): feat [B, D], state -> feat [B, H], new state,
  with states zeroed where ``episode_dones`` is set.
* sequence mode (updates): feat [B, T, D] scanned over time with
  reset-on-done, returning [B, T, H] and the final state.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import NETWORK


@NETWORK.register_module(name="RNN")
@NETWORK.register_module()
class GRU(nn.Module):
    hidden_size: int
    num_layers: int = 1

    def setup(self):
        self.cells = [nn.GRUCell(features=self.hidden_size, name=f"layer_{i}") for i in range(self.num_layers)]

    def initial_state(self, batch: int):
        return jnp.zeros((batch, self.num_layers, self.hidden_size), jnp.float32)

    def _step(self, carry, x, done=None):
        """carry: [B, L, H]; x: [B, D]; done: [B, 1] resets BEFORE the step."""
        if done is not None:
            carry = carry * (1.0 - done.astype(carry.dtype))[..., None]
        new_layers = []
        h = x
        for i, cell in enumerate(self.cells):
            c, h = cell(carry[:, i], h)
            new_layers.append(c)
        return jnp.stack(new_layers, axis=1), h

    def __call__(self, feat, rnn_states=None, episode_dones=None, rnn_mode: str = "base", **kwargs):
        """feat [B, D] (step) or [B, T, D] (sequence).

        rnn_mode "base": return features only; "with_states": (features,
        final_state) (reference ActorCriticBase contract, actor_critic.py:20-28).
        """
        is_seq = feat.ndim == 3
        B = feat.shape[0]
        if rnn_states is None:
            rnn_states = self.initial_state(B)
        if not is_seq:
            done = episode_dones if episode_dones is not None else None
            state, out = self._step(rnn_states, feat, done)
            return out if rnn_mode == "base" else (out, state)

        T = feat.shape[1]
        dones = (
            jnp.zeros((B, T, 1), jnp.float32)
            if episode_dones is None
            else episode_dones.astype(jnp.float32).reshape(B, T, 1)
        )

        def scan_fn(carry, xs):
            x_t, d_t = xs
            carry, out = self._step(carry, x_t, d_t)
            return carry, out

        xs = (jnp.swapaxes(feat, 0, 1), jnp.swapaxes(dones, 0, 1))  # time-major
        final_state, outs = nn.scan(
            lambda mdl, c, x: GRU._step(mdl, c, x[0], x[1]),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(self, rnn_states, xs)
        outs = jnp.swapaxes(outs, 0, 1)  # back to [B, T, H]
        return outs if rnn_mode == "base" else (outs, final_state)

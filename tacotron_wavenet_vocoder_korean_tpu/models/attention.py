"""Attention mechanisms for the Tacotron decoder, as pure flax modules with
explicit state.

Covers the reference's selectable set (reference tacotron/tacotron.py:127-146,
tacotron/rnn_wrappers.py:471-825):

  * ``bah`` / ``bah_norm``          — Bahdanau additive (optionally normalized)
  * ``bah_mon`` / ``bah_mon_norm``  — Bahdanau monotonic (Raffel et al. 2017),
                                      parallel-mode stable cumulative product
  * ``bah_mon_norm_hccho``          — monotonic variant with learned score &
                                      alignment biases + relu renorm
  * ``loc_sen``                     — location-sensitive (Chorowski et al.)
  * ``gmm``                         — Graves GMM windows
  * ``luong`` / ``luong_scaled``    — multiplicative

Each mechanism exposes:
  ``init_state(batch, T)``  initial recurrent attention state
  ``__call__(query, state, keys, values, mask)`` -> (alignments, next_state)

``keys`` are the memory-layer-projected encoder outputs (precomputed once per
utterance — the W_k @ memory matmul stays out of the decode loop, which is the
TPU-friendly factoring of TF's _BaseAttentionMechanism).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9


def safe_cumprod_exclusive(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Numerically stable exclusive cumprod: exp(exclusive-cumsum(log(clip(x))))
    (TF's safe_cumprod used by monotonic_attention)."""
    logs = jnp.log(jnp.clip(x, 1e-10, 1.0))
    csum = jnp.cumsum(logs, axis=axis)
    excl = csum - logs  # exclusive cumsum
    return jnp.exp(excl)


def monotonic_attention_parallel(p_choose: jnp.ndarray,
                                 previous: jnp.ndarray) -> jnp.ndarray:
    """Raffel et al. 2017 'parallel' mode expected attention.

    attention_i = p_i * cumprod_{j<i}(1-p_j) *
                  cumsum_i(previous_i / clip(cumprod_{j<i}(1-p_j)))
    """
    cp = safe_cumprod_exclusive(1.0 - p_choose, axis=-1)
    return p_choose * cp * jnp.cumsum(
        previous / jnp.clip(cp, 1e-10, 1.0), axis=-1)


class BahdanauAttention(nn.Module):
    """Additive attention; ``normalize=True`` gives the weight-normalized
    variant (TF _bahdanau_score, rnn_wrappers.py:562)."""

    num_units: int
    normalize: bool = False

    def init_state(self, batch: int, t: int) -> jnp.ndarray:
        return jnp.zeros((batch, t), jnp.float32)

    def score(self, query: jnp.ndarray, keys: jnp.ndarray) -> jnp.ndarray:
        q = nn.Dense(self.num_units, use_bias=False, name="query_layer")(query)
        v = self.param("attention_v", nn.initializers.glorot_uniform(),
                       (self.num_units, 1))
        if self.normalize:
            g = self.param("attention_g",
                           lambda *_: jnp.asarray(
                               (1.0 / self.num_units) ** 0.5, jnp.float32), ())
            b = self.param("attention_b", nn.initializers.zeros,
                           (self.num_units,))
            normed_v = g * v / jnp.linalg.norm(v)
            return jnp.squeeze(
                jnp.tanh(keys + q[:, None, :] + b) @ normed_v, -1)
        return jnp.squeeze(jnp.tanh(keys + q[:, None, :]) @ v, -1)

    @nn.compact
    def __call__(self, query, state, keys, values, mask
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        s = jnp.where(mask, self.score(query, keys), NEG_INF)
        alignments = jax.nn.softmax(s, axis=-1)
        return alignments, alignments


class BahdanauMonotonicAttention(BahdanauAttention):
    """TF BahdanauMonotonicAttention (the reference default with
    normalize=True, tacotron.py:129-130): sigmoid scores + parallel-mode
    monotonic expectation; recurrent state is the previous alignments,
    initialized to a dirac at position 0."""

    sigmoid_noise: float = 0.0
    score_bias_init: float = 0.0

    def init_state(self, batch: int, t: int) -> jnp.ndarray:
        return jax.nn.one_hot(jnp.zeros(batch, jnp.int32), t)

    @nn.compact
    def __call__(self, query, state, keys, values, mask):
        score_bias = self.param(
            "score_bias",
            lambda *_: jnp.asarray(self.score_bias_init, jnp.float32), ())
        s = self.score(query, keys) + score_bias
        s = jnp.where(mask, s, NEG_INF)
        if self.sigmoid_noise > 0:
            rng = self.make_rng("sample")
            s = s + self.sigmoid_noise * jax.random.normal(rng, s.shape)
        p_choose = jax.nn.sigmoid(s)
        alignments = monotonic_attention_parallel(p_choose, state)
        return alignments, alignments


class BahdanauMonotonicAttentionHccho(BahdanauMonotonicAttention):
    """The reference's custom variant (rnn_wrappers.py:471-577): monotonic
    alignments pass through a learned bias + relu + renormalization before use,
    while the *unbiased* alignments remain the recurrent state."""

    @nn.compact
    def __call__(self, query, state, keys, values, mask):
        score_bias = self.param(
            "score_bias",
            lambda *_: jnp.asarray(self.score_bias_init, jnp.float32), ())
        align_bias = self.param("alignments_bias", nn.initializers.zeros, (1,))
        s = self.score(query, keys) + score_bias
        s = jnp.where(mask, s, NEG_INF)
        p_choose = jax.nn.sigmoid(s)
        next_state = monotonic_attention_parallel(p_choose, state)
        a = jax.nn.relu(next_state + align_bias)
        alignments = a / (jnp.sum(a, axis=-1, keepdims=True) + 1e-12)
        return alignments, next_state


class LocationSensitiveAttention(nn.Module):
    """Hybrid content+location attention with cumulative alignments
    (rnn_wrappers.py:581-726)."""

    num_units: int
    smoothing: bool = False
    cumulate: bool = True

    def init_state(self, batch: int, t: int) -> jnp.ndarray:
        return jnp.zeros((batch, t), jnp.float32)

    @nn.compact
    def __call__(self, query, state, keys, values, mask):
        q = nn.Dense(self.num_units, use_bias=False, name="query_layer")(query)
        f = nn.Conv(32, kernel_size=(31,), padding="SAME",
                    name="location_convolution")(state[..., None])
        loc = nn.Dense(self.num_units, use_bias=False,
                       name="location_layer")(f)
        v_a = self.param("attention_variable",
                         nn.initializers.glorot_uniform(), (self.num_units, 1))
        b_a = self.param("attention_bias", nn.initializers.zeros,
                         (self.num_units,))
        energy = jnp.squeeze(
            jnp.tanh(keys + q[:, None, :] + loc + b_a) @ v_a, -1)
        energy = jnp.where(mask, energy, NEG_INF)
        if self.smoothing:
            sig = jax.nn.sigmoid(energy)
            alignments = sig / jnp.sum(sig, axis=-1, keepdims=True)
        else:
            alignments = jax.nn.softmax(energy, axis=-1)
        next_state = alignments + state if self.cumulate else alignments
        return alignments, next_state


class GmmAttention(nn.Module):
    """Graves GMM window attention (rnn_wrappers.py:751-825).  Recurrent state
    is the monotone kappa vector, not alignments."""

    num_mixtures: int = 256

    def init_state(self, batch: int, t: int) -> jnp.ndarray:
        return jnp.zeros((batch, self.num_mixtures), jnp.float32)

    @nn.compact
    def __call__(self, query, state, keys, values, mask):
        params = nn.Dense(3 * self.num_mixtures, name="gmm_query_layer")(query)
        alpha_hat, beta_hat, kappa_hat = jnp.split(params, 3, axis=-1)
        alpha = jnp.exp(alpha_hat)[..., None]
        beta = jnp.exp(beta_hat)[..., None]
        kappa = (state + jnp.exp(kappa_hat))[..., None]
        t = values.shape[1]
        mu = jnp.arange(t, dtype=jnp.float32)[None, None, :]
        phi = jnp.sum(alpha * jnp.exp(-beta * (kappa - mu) ** 2), axis=1)
        alignments = jnp.where(mask, phi, 0.0)  # GMM masks with 0, not -inf
        return alignments, jnp.squeeze(kappa, -1)


class LuongAttention(nn.Module):
    """Multiplicative attention; keys here are the memory-layer projection
    (TF LuongAttention)."""

    num_units: int
    scale: bool = False

    def init_state(self, batch: int, t: int) -> jnp.ndarray:
        return jnp.zeros((batch, t), jnp.float32)

    @nn.compact
    def __call__(self, query, state, keys, values, mask):
        # TF's LuongAttention requires query depth == num_units and errors
        # otherwise (the reference only runs it because attention_size ==
        # decoder size); we instead project the query so every config is
        # safe.  Identity-free when dims already match.
        if query.shape[-1] != keys.shape[-1]:
            query = nn.Dense(keys.shape[-1], use_bias=False,
                             name="luong_query_projection")(query)
        s = jnp.einsum("bu,btu->bt", query, keys)
        if self.scale:
            g = self.param("attention_g", nn.initializers.ones, ())
            s = g * s
        s = jnp.where(mask, s, NEG_INF)
        alignments = jax.nn.softmax(s, axis=-1)
        return alignments, alignments


def make_attention(attention_type: str, num_units: int) -> nn.Module:
    """Factory keyed by the reference's attention_type strings
    (tacotron.py:127-146)."""
    table = {
        "bah": lambda: BahdanauAttention(num_units, normalize=False),
        "bah_norm": lambda: BahdanauAttention(num_units, normalize=True),
        "bah_mon": lambda: BahdanauMonotonicAttention(num_units, normalize=False),
        "bah_mon_norm": lambda: BahdanauMonotonicAttention(num_units, normalize=True),
        "bah_mon_norm_hccho": lambda: BahdanauMonotonicAttentionHccho(
            num_units, normalize=True),
        "loc_sen": lambda: LocationSensitiveAttention(num_units),
        "gmm": lambda: GmmAttention(num_units),
        "luong": lambda: LuongAttention(num_units, scale=False),
        "luong_scaled": lambda: LuongAttention(num_units, scale=True),
    }
    if attention_type not in table:
        raise KeyError(f"unknown attention type {attention_type!r}; "
                       f"have {sorted(table)}")
    return table[attention_type]()

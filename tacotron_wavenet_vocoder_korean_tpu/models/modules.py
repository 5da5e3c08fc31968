"""Tacotron building blocks: prenet, highway, batch-normed conv1d, CBHG.

Reference: tacotron/modules.py:10-96.  All convolutions are NWC lax convs
(MXU-friendly); the CBHG bi-GRU uses flax's RNN with sequence lengths, which
reproduces TF's ``bidirectional_dynamic_rnn`` reverse_sequence semantics.
"""
from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen.recurrent import flip_sequences

Dtype = Any  # compute dtype for mixed precision; params stay float32


def _fused_gru_input_init(key, shape, dtype=jnp.float32):
    """lecun_normal per [D,H] block — matches flax Dense's default init for
    the ir/iz/in kernels it replaces."""
    d, three_h = shape
    h = three_h // 3
    init = nn.initializers.lecun_normal()
    return jnp.concatenate(
        [init(k, (d, h), dtype) for k in jax.random.split(key, 3)], axis=1)


def _fused_gru_recurrent_init(key, shape, dtype=jnp.float32):
    """orthogonal per [H,H] block — matches flax GRUCell's recurrent init."""
    h = shape[0]
    init = nn.initializers.orthogonal()
    return jnp.concatenate(
        [init(k, (h, h), dtype) for k in jax.random.split(key, 3)], axis=1)


def _fused_gru_step(h, xp, w_hh, b_hn):
    """One GRU step given a precomputed input projection xp = x@w_ih + b_ih.

    Same math as flax.linen.GRUCell (r/z/n gates, h' = (1-z)n + zh) but with
    the three recurrent matmuls fused into a single [H,3H] product."""
    hr, hz, hn = jnp.split(h @ w_hh, 3, axis=-1)
    xr, xz, xn = jnp.split(xp, 3, axis=-1)
    r = nn.sigmoid(xr + hr)
    z = nn.sigmoid(xz + hz)
    n = nn.tanh(xn + r * (hn + b_hn))
    new_h = (1.0 - z) * n + z * h
    return new_h, new_h


class FusedGRUCell(nn.Module):
    """GRU cell with block-fused kernels: one [D,3H] input matmul + one
    [H,3H] recurrent matmul per step instead of flax GRUCell's six separate
    Dense matmuls.  Math is identical (blocks ordered r,z,n);
    :func:`fuse_gru_params` converts a trained GRUCell tree into this layout
    exactly.  TPU rationale: the decoder scan is latency-bound on many tiny
    matmuls — fusing cuts the per-step matmul count 3x."""

    features: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, carry, x):
        h_dim = self.features
        w_ih = self.param("w_ih", _fused_gru_input_init,
                          (x.shape[-1], 3 * h_dim))
        w_hh = self.param("w_hh", _fused_gru_recurrent_init,
                          (h_dim, 3 * h_dim))
        b_ih = self.param("b_ih", nn.initializers.zeros, (3 * h_dim,))
        b_hn = self.param("b_hn", nn.initializers.zeros, (h_dim,))
        if self.dtype is not None:
            w_ih, w_hh, b_ih, b_hn = (a.astype(self.dtype)
                                      for a in (w_ih, w_hh, b_ih, b_hn))
            x = x.astype(self.dtype)
            carry = carry.astype(self.dtype)
        return _fused_gru_step(carry, x @ w_ih + b_ih, w_hh, b_hn)


def _is_gru_cell(d) -> bool:
    return (isinstance(d, Mapping)
            and {"ir", "iz", "in", "hr", "hz", "hn"} <= set(d.keys()))


def _fuse_cell(d) -> dict:
    return {
        "w_ih": jnp.concatenate(
            [d["ir"]["kernel"], d["iz"]["kernel"], d["in"]["kernel"]], axis=1),
        "w_hh": jnp.concatenate(
            [d["hr"]["kernel"], d["hz"]["kernel"], d["hn"]["kernel"]], axis=1),
        "b_ih": jnp.concatenate(
            [d["ir"]["bias"], d["iz"]["bias"], d["in"]["bias"]]),
        "b_hn": d["hn"]["bias"],
    }


def fuse_gru_params(tree):
    """Convert every flax GRUCell param subtree (ir/iz/in/hr/hz/hn Denses)
    in ``tree`` into the fused layout (w_ih/w_hh/b_ih/b_hn), exactly
    preserving the computed function.  Handles both layouts this framework
    produces: a cell subtree named ``GRUCell_0`` under a GRU module scope
    (spliced into the parent), and a cell directly at a module scope (the
    decoder's attention_gru / decoder_gru_i).  Use to load checkpoints
    trained with ``fused_rnn=False`` into a ``fused_rnn=True`` model."""
    if not isinstance(tree, Mapping):
        return tree
    out = {}
    for k, v in tree.items():
        if _is_gru_cell(v):
            out[k] = _fuse_cell(v)
        elif (isinstance(v, Mapping) and "GRUCell_0" in v
              and _is_gru_cell(v["GRUCell_0"])):
            rest = {kk: fuse_gru_params(vv)
                    for kk, vv in v.items() if kk != "GRUCell_0"}
            out[k] = {**rest, **_fuse_cell(v["GRUCell_0"])}
        else:
            out[k] = fuse_gru_params(v)
    return out


class Prenet(nn.Module):
    """Dense+relu+dropout stack (modules.py:15-23).  Dropout is live in both
    train and eval in the reference's decoder (a known Tacotron trait) — we
    follow flax convention instead: the caller controls ``deterministic``."""

    layer_sizes: Sequence[int]
    dropout_rate: float = 0.5
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        for i, size in enumerate(self.layer_sizes):
            x = nn.relu(nn.Dense(size, dtype=self.dtype,
                                 name=f"dense_{i + 1}")(x))
            x = nn.Dropout(self.dropout_rate, name=f"dropout_{i + 1}")(
                x, deterministic=deterministic)
        return x


class HighwayLayer(nn.Module):
    """H*T + x*(1-T) with T-gate bias init -1 (modules.py:83-89)."""

    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        h = nn.relu(nn.Dense(dim, dtype=self.dtype, name="H")(x))
        t = nn.sigmoid(nn.Dense(
            dim, dtype=self.dtype, name="T",
            bias_init=nn.initializers.constant(-1.0))(x))
        return h * t + x * (1.0 - t)


class BatchNormConv1d(nn.Module):
    """SAME conv1d -> activation -> batch norm (modules.py:92-96; note the
    reference also normalizes *after* activation)."""

    channels: int
    kernel_size: int
    activation: Optional[str] = None  # None | 'relu'
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        y = nn.Conv(self.channels, kernel_size=(self.kernel_size,),
                    padding="SAME", dtype=self.dtype, name="conv")(x)
        if self.activation == "relu":
            y = nn.relu(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         dtype=self.dtype, name="bn")(y)
        return y


class GRU(nn.Module):
    """Unidirectional GRU over [B, T, D] with optional initial state and
    sequence-length masking.

    Two implementations with identical semantics (flax reverse_sequence
    convention: with ``reverse=True`` the flip happens within each row's
    ``seq_lengths``, padding stays at the end, and outputs are flipped back):

      * ``fused=False``: flax nn.RNN over nn.GRUCell (6 matmuls/step).
      * ``fused=True``: the [D,3H] input projection is hoisted out of the
        scan into ONE whole-sequence MXU matmul; the scan body is a single
        [H,3H] recurrent matmul + gates.  Params are w_ih/w_hh/b_ih/b_hn at
        this module's scope (convert old checkpoints with fuse_gru_params).
    """

    units: int
    reverse: bool = False
    dtype: Dtype = None
    unroll: int = 1
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 seq_lengths: Optional[jnp.ndarray] = None,
                 initial_state: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if self.fused:
            return self._fused_call(x, seq_lengths, initial_state)
        cell = nn.GRUCell(features=self.units, dtype=self.dtype)
        rnn = nn.RNN(cell, reverse=self.reverse, keep_order=self.reverse,
                     unroll=self.unroll, name="rnn")
        kwargs = {}
        if seq_lengths is not None:
            kwargs["seq_lengths"] = seq_lengths
        if initial_state is not None:
            # scan requires a dtype-stable carry: match the cell's compute
            # dtype (mixed precision keeps params f32, activations in dtype)
            if self.dtype is not None:
                initial_state = initial_state.astype(self.dtype)
            kwargs["initial_carry"] = initial_state
        return rnn(x, **kwargs)

    def _fused_call(self, x, seq_lengths, initial_state):
        h_dim = self.units
        w_ih = self.param("w_ih", _fused_gru_input_init,
                          (x.shape[-1], 3 * h_dim))
        w_hh = self.param("w_hh", _fused_gru_recurrent_init,
                          (h_dim, 3 * h_dim))
        b_ih = self.param("b_ih", nn.initializers.zeros, (3 * h_dim,))
        b_hn = self.param("b_hn", nn.initializers.zeros, (h_dim,))
        if self.dtype is not None:
            w_ih, w_hh, b_ih, b_hn = (a.astype(self.dtype)
                                      for a in (w_ih, w_hh, b_ih, b_hn))
            x = x.astype(self.dtype)

        # Hoisted input projection: one big [B,T,D]@[D,3H] matmul.
        xp = x @ w_ih + b_ih
        if self.reverse:
            xp = flip_sequences(xp, seq_lengths, num_batch_dims=1,
                                time_major=False)

        if initial_state is None:
            h0 = jnp.zeros((x.shape[0], h_dim), xp.dtype)
        else:
            h0 = initial_state.astype(xp.dtype)

        def step(h, xp_t):
            return _fused_gru_step(h, xp_t, w_hh, b_hn)

        _, ys = jax.lax.scan(step, h0, jnp.swapaxes(xp, 0, 1),
                             unroll=self.unroll)
        ys = jnp.swapaxes(ys, 0, 1)
        if self.reverse:  # keep_order: flip outputs back for bi-RNN concat
            ys = flip_sequences(ys, seq_lengths, num_batch_dims=1,
                                time_major=False)
        return ys


class CBHG(nn.Module):
    """Conv bank (k=1..K) -> maxpool -> projections -> residual -> highway ->
    bi-GRU (reference tacotron/modules.py:25-74).

    ``before_highway`` / ``rnn_init_state`` carry DeepVoice2-style speaker
    conditioning (tacotron.py:69-86).
    """

    bank_size: int
    bank_channel_size: int
    maxpool_width: int
    highway_depth: int
    rnn_size: int
    proj_sizes: Sequence[int]
    proj_width: int
    dtype: Dtype = None
    unroll: int = 1
    fused_rnn: bool = False

    @nn.compact
    def __call__(self, inputs: jnp.ndarray,
                 input_lengths: Optional[jnp.ndarray],
                 train: bool,
                 before_highway: Optional[jnp.ndarray] = None,
                 rnn_init_state: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # Convolution bank: concat channel outputs of kernel sizes 1..K.
        conv_outputs = jnp.concatenate([
            BatchNormConv1d(self.bank_channel_size, k, "relu",
                            dtype=self.dtype,
                            name=f"conv1d_bank_{k}")(inputs, train)
            for k in range(1, self.bank_size + 1)
        ], axis=-1)

        # Max pooling width 2, stride 1, SAME.
        pad_r = self.maxpool_width - 1
        padded = jnp.pad(conv_outputs,
                         ((0, 0), (0, pad_r), (0, 0)),
                         constant_values=-jnp.inf)
        windows = jnp.stack([padded[:, i:i + conv_outputs.shape[1]]
                             for i in range(self.maxpool_width)], axis=0)
        maxpool = jnp.max(windows, axis=0)

        # Two projection conv layers; last one linear.
        proj = maxpool
        for idx, size in enumerate(self.proj_sizes):
            act = None if idx == len(self.proj_sizes) - 1 else "relu"
            proj = BatchNormConv1d(size, self.proj_width, act,
                                   dtype=self.dtype,
                                   name=f"proj_{idx + 1}")(proj, train)

        # Residual (+ speaker injection).
        if before_highway is not None:
            highway_input = proj + inputs + \
                before_highway[:, None, :].astype(proj.dtype)
        else:
            highway_input = proj + inputs

        if highway_input.shape[-1] != self.rnn_size:
            highway_input = nn.Dense(self.rnn_size, dtype=self.dtype,
                                     name="highway_in_proj")(highway_input)

        for i in range(self.highway_depth):
            highway_input = HighwayLayer(dtype=self.dtype,
                                         name=f"highway_{i + 1}")(highway_input)

        # Bidirectional GRU with optional speaker-derived init states.
        if rnn_init_state is not None:
            init_fw, init_bw = jnp.split(rnn_init_state, 2, axis=-1)
        else:
            init_fw = init_bw = None
        out_fw = GRU(self.rnn_size, dtype=self.dtype, unroll=self.unroll,
                     fused=self.fused_rnn, name="gru_fw")(
            highway_input, seq_lengths=input_lengths, initial_state=init_fw)
        out_bw = GRU(self.rnn_size, reverse=True, dtype=self.dtype,
                     unroll=self.unroll, fused=self.fused_rnn, name="gru_bw")(
            highway_input, seq_lengths=input_lengths, initial_state=init_bw)
        return jnp.concatenate([out_fw, out_bw], axis=-1)

"""Tacotron building blocks: prenet, highway, batch-normed conv1d, CBHG.

Reference: tacotron/modules.py:10-96.  All convolutions are NWC lax convs
(MXU-friendly); the CBHG bi-GRU uses flax's RNN with sequence lengths, which
reproduces TF's ``bidirectional_dynamic_rnn`` reverse_sequence semantics.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any  # compute dtype for mixed precision; params stay float32


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
    sequence-length masking, via flax nn.RNN."""

    units: int
    reverse: bool = False
    dtype: Dtype = None
    unroll: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 seq_lengths: Optional[jnp.ndarray] = None,
                 initial_state: Optional[jnp.ndarray] = None) -> jnp.ndarray:
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
                     name="gru_fw")(
            highway_input, seq_lengths=input_lengths, initial_state=init_fw)
        out_bw = GRU(self.rnn_size, reverse=True, dtype=self.dtype,
                     unroll=self.unroll, name="gru_bw")(
            highway_input, seq_lengths=input_lengths, initial_state=init_bw)
        return jnp.concatenate([out_fw, out_bw], axis=-1)

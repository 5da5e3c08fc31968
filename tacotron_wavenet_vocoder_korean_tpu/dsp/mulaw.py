"""Mu-law companding family (reference: utils/audio.py:244-341,
wavenet/ops.py:22-47).

Single jnp implementation — works identically on host numpy arrays and traced
TPU values (no numpy/TF polymorphic wrappers needed).
"""
from __future__ import annotations

import jax.numpy as jnp


def mulaw(x, mu: int = 256):
    """Compand [-1,1] -> [-1,1]: sign(x) * log1p(mu|x|) / log1p(mu)."""
    mu = float(mu)
    return jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)


def inv_mulaw(y, mu: int = 256):
    mu = float(mu)
    return jnp.sign(y) * (1.0 / mu) * ((1.0 + mu) ** jnp.abs(y) - 1.0)


def mulaw_quantize(x, mu: int = 256):
    """[-1,1] -> int in [0, mu-1] (mu-1 companding then scale)."""
    m = mu - 1
    y = mulaw(x, m)
    return ((y + 1) / 2 * m).astype(jnp.int32)


def inv_mulaw_quantize(y, mu: int = 256):
    m = mu - 1
    y = 2 * y.astype(jnp.float32) / m - 1
    return inv_mulaw(y, m)


def mulaw_encode(audio, quantization_channels: int = 256):
    """Float audio [-1,1] -> quantized ids [0, qc-1] (reference
    wavenet/ops.py:22-34)."""
    mu = float(quantization_channels - 1)
    safe = jnp.clip(audio, -1.0, 1.0)
    magnitude = jnp.log1p(mu * jnp.abs(safe)) / jnp.log1p(mu)
    signal = jnp.sign(safe) * magnitude
    return ((signal + 1) / 2 * mu + 0.5).astype(jnp.int32)


def mulaw_decode(ids, quantization_channels: int = 256):
    """Quantized ids -> float audio [-1,1] (reference wavenet/ops.py:36-47)."""
    mu = float(quantization_channels - 1)
    signal = 2.0 * (ids.astype(jnp.float32) / mu) - 1.0
    magnitude = (1.0 / mu) * ((1.0 + mu) ** jnp.abs(signal) - 1.0)
    return jnp.sign(signal) * magnitude

"""Griffin-Lim phase reconstruction as a jitted on-device loop.

The reference runs 60 numpy iterations on CPU (reference:
utils/audio.py:127-137) — here the whole loop is one XLA program using
``lax.fori_loop``, so synthesis stays on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import AudioConfig
from .stft import (
    stft as _stft, istft as _istft, denormalize as _denormalize,
    db_to_amp as _db_to_amp, mel_to_linear as _mel_to_linear,
    inv_preemphasis as _inv_preemphasis,
)


@functools.partial(jax.jit, static_argnames=("cfg", "n_iters"))
def griffin_lim(magnitude: jnp.ndarray, cfg: AudioConfig, n_iters: int = None,
                seed: int = 0) -> jnp.ndarray:
    """Reconstruct a waveform from a linear magnitude spectrogram
    [num_freq, frames].

    Random initial phase, then n_iters of (istft -> stft -> take phase).
    """
    if n_iters is None:
        n_iters = cfg.griffin_lim_iters

    key = jax.random.PRNGKey(seed)
    phase = jax.random.uniform(key, magnitude.shape, minval=0.0, maxval=2 * jnp.pi)
    angles = jnp.exp(1j * phase)
    mag = jnp.abs(magnitude).astype(jnp.complex64)

    y = _istft(mag * angles, cfg)

    def body(_, y):
        est = _stft(y, cfg)
        ang = est / jnp.maximum(1e-8, jnp.abs(est)).astype(jnp.complex64)
        # stft may produce one extra frame vs. the source spectrogram length;
        # clamp to the target frame count for a static-shape loop.
        ang = ang[:, :mag.shape[1]]
        return _istft(mag * ang, cfg)

    return jax.lax.fori_loop(0, n_iters, body, y)


def inv_linear_spectrogram(linear: jnp.ndarray, cfg: AudioConfig,
                           seed: int = 0) -> jnp.ndarray:
    """Normalized linear spectrogram [num_freq, frames] -> waveform
    (reference utils/audio.py:77-92)."""
    D = _denormalize(linear, cfg)
    mag = _db_to_amp(D + cfg.ref_level_db)
    y = griffin_lim(mag ** cfg.power, cfg, seed=seed)
    return _inv_preemphasis(y, cfg.preemphasis, cfg.preemphasize)


def inv_mel_spectrogram(mel: jnp.ndarray, cfg: AudioConfig,
                        seed: int = 0) -> jnp.ndarray:
    """Normalized mel spectrogram [num_mels, frames] -> waveform
    (reference utils/audio.py:95-110)."""
    D = _denormalize(mel, cfg)
    mag = _mel_to_linear(_db_to_amp(D + cfg.ref_level_db), cfg)
    y = griffin_lim(mag ** cfg.power, cfg, seed=seed)
    return _inv_preemphasis(y, cfg.preemphasis, cfg.preemphasize)

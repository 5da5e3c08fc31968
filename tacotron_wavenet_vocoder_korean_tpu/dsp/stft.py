"""Jittable STFT / mel / normalization chain.

Reimplements the reference's librosa-convention DSP (reference:
utils/audio.py:61-146,201-234) in jax.numpy so feature extraction is identical
between preprocessing and synthesis and can run on TPU:

  * STFT: hann(win_size) zero-padded to fft_size, center=True reflect padding,
    hop slicing — matching ``librosa.stft`` defaults.
  * mel: Slaney-style filterbank (librosa default: htk=False, norm='slaney'),
    fmin=0, fmax=sr/2.
  * amp<->db with -100 dB floor, ref-level shift, symmetric [-4, 4] clip
    normalization (Tacotron-2 style).

All functions are pure and jit-compatible; numpy arrays pass straight through
(jnp ops accept them), so the preprocessing pipeline can call them on host.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AudioConfig


# ---------------------------------------------------------------------------
# Windows and filterbanks (host-side constants, cached)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def hann_window(win_size: int, fft_size: int) -> np.ndarray:
    """Periodic Hann of length win_size, centered-zero-padded to fft_size
    (librosa's ``util.pad_center`` convention)."""
    n = np.arange(win_size)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_size)
    lpad = (fft_size - win_size) // 2
    out = np.zeros(fft_size, dtype=np.float32)
    out[lpad:lpad + win_size] = w
    return out


@functools.lru_cache(maxsize=8)
def mel_basis(sample_rate: int, fft_size: int, num_mels: int,
              fmin: float = 0.0, fmax: Optional[float] = None) -> np.ndarray:
    """Slaney-style mel filterbank, [num_mels, fft_size//2+1].

    Matches ``librosa.filters.mel`` defaults (htk=False, norm='slaney') used at
    reference utils/audio.py:193-199.
    """
    if fmax is None:
        fmax = sample_rate / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        # Slaney: linear below 1 kHz, log above.
        f_sp = 200.0 / 3
        mel = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(f >= min_log_hz,
                        min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                        mel)

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f_sp = 200.0 / 3
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel,
                        min_log_hz * np.exp(logstep * (m - min_log_mel)),
                        f_sp * m)

    n_freq = fft_size // 2 + 1
    fftfreqs = np.linspace(0, sample_rate / 2.0, n_freq)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), num_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]

    weights = np.zeros((num_mels, n_freq), dtype=np.float64)
    for i in range(num_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))

    # Slaney normalization: each filter integrates to ~equal area.
    enorm = 2.0 / (hz_pts[2:num_mels + 2] - hz_pts[:num_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# Preemphasis (sequential IIR inverse handled in griffin_lim.py)
# ---------------------------------------------------------------------------

def preemphasis(wav: jnp.ndarray, k: float, enabled: bool = True) -> jnp.ndarray:
    """y[t] = x[t] - k*x[t-1] (reference utils/audio.py:22-25)."""
    if not enabled:
        return wav
    return jnp.concatenate([wav[:1], wav[1:] - k * wav[:-1]])


def inv_preemphasis(wav: jnp.ndarray, k: float, enabled: bool = True) -> jnp.ndarray:
    """IIR y[t] = x[t] + k*y[t-1] as an associative scan (log-depth on TPU).

    scipy's ``lfilter([1],[1,-k])`` is sequential; on TPU we use
    ``jax.lax.associative_scan`` over the linear recurrence instead.
    """
    if not enabled:
        return wav

    def combine(a, b):
        # each element is (multiplier, addend): y = m*y_prev + c
        m1, c1 = a
        m2, c2 = b
        return m2 * m1, m2 * c1 + c2

    m = jnp.full_like(wav, k)
    y = jax.lax.associative_scan(combine, (m, wav))
    return y[1]


# ---------------------------------------------------------------------------
# STFT / iSTFT
# ---------------------------------------------------------------------------

def _frame(y: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """[T] -> [num_frames, frame_length] via strided gather."""
    num_frames = 1 + (y.shape[-1] - frame_length) // hop
    idx = (np.arange(frame_length)[None, :]
           + hop * np.arange(num_frames)[:, None])
    return y[..., idx]


def stft(y: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """Magnitude-preserving complex STFT, [num_freq, num_frames].

    librosa conventions (reference utils/audio.py:139-143): center=True with
    fft_size//2 reflect padding, hann window.
    """
    pad = cfg.fft_size // 2
    y = jnp.pad(y, (pad, pad), mode="reflect")
    frames = _frame(y, cfg.fft_size, cfg.hop_size)        # [F, fft]
    win = jnp.asarray(hann_window(cfg.win_size, cfg.fft_size))
    spec = jnp.fft.rfft(frames * win, axis=-1)            # [F, num_freq]
    return spec.T                                         # [num_freq, F]


def istft(spec: jnp.ndarray, cfg: AudioConfig, length: Optional[int] = None) -> jnp.ndarray:
    """Inverse STFT with hann-squared overlap-add normalization.

    Matches ``librosa.istft`` (center=True trimming) as used by Griffin-Lim
    (reference utils/audio.py:145-146).
    """
    win = jnp.asarray(hann_window(cfg.win_size, cfg.fft_size))
    frames = jnp.fft.irfft(spec.T, n=cfg.fft_size, axis=-1)  # [F, fft]
    frames = frames * win

    num_frames = frames.shape[0]
    total = cfg.fft_size + cfg.hop_size * (num_frames - 1)

    # Overlap-add via scatter-add.
    idx = (np.arange(cfg.fft_size)[None, :]
           + cfg.hop_size * np.arange(num_frames)[:, None]).reshape(-1)
    y = jnp.zeros(total, frames.dtype).at[idx].add(frames.reshape(-1))
    wsum = jnp.zeros(total, frames.dtype).at[idx].add(
        jnp.tile(win * win, (num_frames, 1)).reshape(-1))
    y = y / jnp.maximum(wsum, 1e-8)

    pad = cfg.fft_size // 2
    y = y[pad:total - pad]
    if length is not None:
        y = y[:length]
    return y


# ---------------------------------------------------------------------------
# dB / normalization chain (reference utils/audio.py:201-234)
# ---------------------------------------------------------------------------

def amp_to_db(x: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    min_level = np.exp(cfg.min_level_db / 20 * np.log(10))
    return 20.0 * jnp.log10(jnp.maximum(min_level, x))


def db_to_amp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(10.0, x * 0.05)


def normalize(S: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """db spectrogram -> symmetric [-max_abs, max_abs] (clipped)."""
    if not cfg.signal_normalization:
        return S
    span = -cfg.min_level_db
    if cfg.symmetric_mels:
        out = (2 * cfg.max_abs_value) * ((S - cfg.min_level_db) / span) - cfg.max_abs_value
        lo, hi = -cfg.max_abs_value, cfg.max_abs_value
    else:
        out = cfg.max_abs_value * ((S - cfg.min_level_db) / span)
        lo, hi = 0.0, cfg.max_abs_value
    if cfg.allow_clipping_in_normalization:
        out = jnp.clip(out, lo, hi)
    return out


def denormalize(D: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    if not cfg.signal_normalization:
        return D
    span = -cfg.min_level_db
    if cfg.symmetric_mels:
        if cfg.allow_clipping_in_normalization:
            D = jnp.clip(D, -cfg.max_abs_value, cfg.max_abs_value)
        return ((D + cfg.max_abs_value) * span / (2 * cfg.max_abs_value)
                + cfg.min_level_db)
    if cfg.allow_clipping_in_normalization:
        D = jnp.clip(D, 0, cfg.max_abs_value)
    return D * span / cfg.max_abs_value + cfg.min_level_db


# ---------------------------------------------------------------------------
# Top-level feature extractors (reference utils/audio.py:61-75)
# ---------------------------------------------------------------------------

def linear_spectrogram(wav: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """wav -> normalized linear spectrogram [num_freq, frames]."""
    D = stft(preemphasis(wav, cfg.preemphasis, cfg.preemphasize), cfg)
    S = amp_to_db(jnp.abs(D), cfg) - cfg.ref_level_db
    return normalize(S, cfg)


def mel_spectrogram(wav: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """wav -> normalized mel spectrogram [num_mels, frames]."""
    D = stft(preemphasis(wav, cfg.preemphasis, cfg.preemphasize), cfg)
    basis = jnp.asarray(mel_basis(cfg.sample_rate, cfg.fft_size, cfg.num_mels))
    S = amp_to_db(basis @ jnp.abs(D), cfg) - cfg.ref_level_db
    return normalize(S, cfg)


# ---------------------------------------------------------------------------
# Bucketed batch feature extraction (fast host/device preprocessing)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def _features_from_padded(y_padded: jnp.ndarray, cfg: AudioConfig):
    """Padded signal (already preemphasized + reflect-padded + zero-extended)
    -> (mel, linear) over ALL frames of the padded length.

    Called only through :func:`extract_features`, which buckets padded lengths
    so XLA compiles once per bucket instead of once per utterance.
    """
    frames = _frame(y_padded, cfg.fft_size, cfg.hop_size)
    win = jnp.asarray(hann_window(cfg.win_size, cfg.fft_size))
    mag = jnp.abs(jnp.fft.rfft(frames * win, axis=-1)).T  # [num_freq, F]
    lin = normalize(amp_to_db(mag, cfg) - cfg.ref_level_db, cfg)
    basis = jnp.asarray(mel_basis(cfg.sample_rate, cfg.fft_size, cfg.num_mels))
    mel = normalize(amp_to_db(basis @ mag, cfg) - cfg.ref_level_db, cfg)
    return mel, lin


def extract_features(wav: np.ndarray, cfg: AudioConfig,
                     frame_bucket: int = 128):
    """wav -> (mel, linear), numerically identical to
    :func:`mel_spectrogram`/:func:`linear_spectrogram` but with shape
    bucketing: the signal is zero-extended past its reflect padding to the
    next multiple of ``frame_bucket`` frames, so repeated calls reuse a
    handful of compiled programs.  Every *kept* frame reads only real
    (reflect-padded) samples, so the bucketing is exact.
    """
    wav = np.asarray(wav, dtype=np.float32)
    if cfg.preemphasize:
        y = np.empty_like(wav)
        y[0] = wav[0]
        y[1:] = wav[1:] - cfg.preemphasis * wav[:-1]
    else:
        y = wav
    pad = cfg.fft_size // 2
    y = np.pad(y, (pad, pad), mode="reflect")

    true_frames = 1 + len(wav) // cfg.hop_size
    bucket_frames = ((true_frames + frame_bucket - 1)
                     // frame_bucket) * frame_bucket
    bucket_len = cfg.fft_size + cfg.hop_size * (bucket_frames - 1)
    y = np.pad(y, (0, max(0, bucket_len - len(y))))[:bucket_len]

    # Concurrent first-compilation of the same jitted program from several
    # threads deadlocks on this jax build — serialize the compile (once per
    # (cfg, bucket)), then run lock-free.
    key = (cfg, bucket_frames)
    if key not in _COMPILED_BUCKETS:
        with _COMPILE_LOCK:
            if key not in _COMPILED_BUCKETS:
                _features_from_padded(jnp.asarray(y), cfg)[0].block_until_ready()
                _COMPILED_BUCKETS.add(key)

    mel, lin = _features_from_padded(jnp.asarray(y), cfg)
    return (np.asarray(mel[:, :true_frames]),
            np.asarray(lin[:, :true_frames]))


_COMPILED_BUCKETS: set = set()
from ..utils.compile_lock import COMPILE_LOCK as _COMPILE_LOCK  # noqa: E402


@functools.lru_cache(maxsize=8)
def inv_mel_basis(sample_rate: int, fft_size: int, num_mels: int) -> np.ndarray:
    return np.linalg.pinv(
        mel_basis(sample_rate, fft_size, num_mels)).astype(np.float32)


def mel_to_linear(mel: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """Approximate linear magnitude from mel via pinv (reference
    utils/audio.py:187-191)."""
    inv = jnp.asarray(inv_mel_basis(cfg.sample_rate, cfg.fft_size, cfg.num_mels))
    return jnp.maximum(1e-10, inv @ mel)

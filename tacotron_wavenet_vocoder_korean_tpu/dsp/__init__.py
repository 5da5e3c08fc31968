"""Jittable DSP library shared by preprocessing and synthesis.

TPU-native replacement for reference utils/audio.py: one implementation (jnp)
instead of parallel numpy/TF paths.
"""
from .stft import (
    stft, istft, preemphasis, inv_preemphasis, amp_to_db, db_to_amp,
    normalize, denormalize, linear_spectrogram, mel_spectrogram,
    mel_to_linear, mel_basis, hann_window, extract_features,
)
from .griffin_lim import griffin_lim, inv_linear_spectrogram, inv_mel_spectrogram
from .mulaw import (
    mulaw, inv_mulaw, mulaw_quantize, inv_mulaw_quantize,
    mulaw_encode, mulaw_decode,
)
from .audio_io import (
    load_wav, save_wav, rescale, trim_silence, start_and_end_indices,
)

__all__ = [
    "stft", "istft", "preemphasis", "inv_preemphasis", "amp_to_db",
    "db_to_amp", "normalize", "denormalize", "linear_spectrogram",
    "mel_spectrogram", "mel_to_linear", "mel_basis", "hann_window",
    "extract_features", "griffin_lim", "inv_linear_spectrogram", "inv_mel_spectrogram",
    "mulaw", "inv_mulaw", "mulaw_quantize", "inv_mulaw_quantize",
    "mulaw_encode", "mulaw_decode",
    "load_wav", "save_wav", "rescale", "trim_silence", "start_and_end_indices",
]

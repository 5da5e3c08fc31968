"""Model zoo: Tacotron (text->spectrogram) and WaveNet (mel->waveform)."""
from .tacotron import (
    Tacotron, Decoder, DecoderCarry, tacotron_loss, learning_rate_schedule,
)
from .attention import make_attention
from . import modules, attention

__all__ = [
    "Tacotron", "Decoder", "DecoderCarry", "tacotron_loss",
    "learning_rate_schedule", "make_attention", "modules", "attention",
]

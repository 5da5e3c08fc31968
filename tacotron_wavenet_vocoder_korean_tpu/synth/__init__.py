"""Inference: Tacotron synthesizer and WaveNet generator."""
from .synthesizer import Synthesizer, attention_trim_index

__all__ = ["Synthesizer", "attention_trim_index"]

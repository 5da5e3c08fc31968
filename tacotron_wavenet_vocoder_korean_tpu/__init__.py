"""TPU-native Korean TTS framework: Tacotron + WaveNet vocoder.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
hccho2/Tacotron-Wavenet-Vocoder-Korean (TF-1.x graph mode) for TPU:

  * ``text``     — Korean jamo frontend (pure Python, zero framework deps)
  * ``dsp``      — jittable STFT/mel/Griffin-Lim/mu-law (shared by
                   preprocessing and synthesis)
  * ``data``     — corpus builders + static-shape bucketing batchers
  * ``models``   — flax Tacotron (scan decoder) + WaveNet (scan fast-gen)
  * ``ops``      — Pallas kernels & low-level XLA ops
  * ``parallel`` — mesh/sharding utilities (pjit data parallelism)
  * ``train``    — train steps, checkpointing (Orbax), drivers
  * ``synth``    — text->wav synthesizer and WaveNet generator
"""

__version__ = "0.1.0"

from . import config  # noqa: F401

"""WaveNet generator: mel .npy -> waveform, fully on-device.

Parity with reference generate.py:106-264 (which pins to CPU and does one
sess.run per audio sample): restore run dir, upsample the mel, run the
ring-buffer scan for the whole utterance in one XLA program, mu-law decode per
input_type, save wavs.  EMA shadow params are used by default (the reference
maintains EMA in its checkpoints, wavenet/model.py:30,338-346).
"""
from __future__ import annotations

import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.wavenet import WaveNet, Upsampler, incremental_generate
from ..train.checkpoints import CheckpointManager, load_run_config
from .. import dsp


class WaveNetGenerator:
    def __init__(self):
        self.cfg: Optional[Config] = None
        self.params = None

    def load(self, checkpoint_dir: str, use_ema: bool = True,
             step: Optional[int] = None) -> "WaveNetGenerator":
        from ..train.wavenet_task import WaveNetTask

        self.cfg = load_run_config(checkpoint_dir)
        w = self.cfg.wavenet
        gc_enable = w.num_speakers > 1
        task = WaveNetTask(self.cfg, gc_enable=gc_enable)

        hop = self.cfg.audio.hop_size
        frames = max(2, w.sample_size // hop)

        class _B:
            input_wav = np.zeros((1, frames * hop, 1), np.float32)
            local_condition = np.zeros((1, frames, w.local_condition_channels),
                                       np.float32)
            speaker_id = np.zeros((1,), np.int32)

        state = task.init_state(jax.random.PRNGKey(0), _B)
        mgr = CheckpointManager(checkpoint_dir)
        restored = mgr.restore(jax.tree.map(np.asarray, state), step=step)
        mgr.close()
        from ..utils.misc import packed_device_put
        self.params = packed_device_put(
            restored.ema_params if use_ema else restored.params)
        self.gc_enable = gc_enable
        self.step = int(restored.step)
        return self

    @functools.cached_property
    def _generate(self):
        cfg = self.cfg
        use_pallas = (cfg.wavenet.scalar_input
                      and jax.default_backend() != "cpu")

        @jax.jit
        def gen(params, mel, rng, gc):
            lc = Upsampler(cfg.wavenet).apply(
                {"params": params["upsampler"]}, mel)
            if use_pallas:
                from ..ops.wavenet_pallas import pallas_incremental_generate
                return pallas_incremental_generate(
                    cfg.wavenet, params, lc, rng, gc=gc), lc
            return incremental_generate(
                cfg.wavenet, params, lc, rng,
                gc=gc), lc

        return gen

    def generate(self, mel: np.ndarray,
                 speaker_id: Optional[int] = None,
                 seed: int = 0) -> np.ndarray:
        """mel [frames, num_mels] (the synthesizer's .npy contract) ->
        float waveform [frames*hop]."""
        w = self.cfg.wavenet
        mel = np.asarray(mel, np.float32)
        if mel.ndim == 2:
            mel = mel[None]
        gc = None
        if self.gc_enable:
            gc_table = np.asarray(self.params["gc_embedding"])
            gc = jnp.asarray(gc_table[[speaker_id or 0]])

        rng = jax.random.PRNGKey(seed)
        samples, _ = self._generate(self.params, jnp.asarray(mel), rng, gc)
        samples = np.asarray(samples)[0]

        if w.input_type == "mulaw-quantize":
            return np.asarray(dsp.inv_mulaw_quantize(
                jnp.asarray(samples), w.quantization_channels))
        if w.input_type == "mulaw":
            return np.asarray(dsp.inv_mulaw(
                jnp.asarray(samples), w.quantization_channels))
        return samples  # raw

    def generate_to_file(self, mel_path: str, out_path: str,
                         speaker_id: Optional[int] = None) -> str:
        mel = np.load(mel_path)
        t0 = time.time()
        wav = self.generate(mel, speaker_id)
        dt = time.time() - t0
        sr = self.cfg.audio.sample_rate
        print(f"generated {len(wav)} samples in {dt:.2f}s "
              f"({len(wav) / dt / sr:.2f}x realtime)")
        dsp.save_wav(wav, out_path, sr)
        return out_path

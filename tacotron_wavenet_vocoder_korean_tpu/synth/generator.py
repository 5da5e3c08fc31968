"""WaveNet generator: mel .npy -> waveform, fully on-device.

Parity with reference generate.py:106-264 (which pins to CPU and does one
sess.run per audio sample): restore run dir, upsample the mel, run the
ring-buffer scan / persistent Pallas kernel for the whole utterance in one
XLA program, mu-law decode per input_type, save wavs.  EMA shadow params are
used by default (the reference maintains EMA in its checkpoints,
wavenet/model.py:30,338-346).

Beyond the per-utterance loop, `generate` accepts a LIST of mels and vocodes
up to 8 ragged-length streams through one batched kernel launch (the
reference batches its generation graph the same way, generate.py:120-137):
mels are silence-padded to the longest, generated together, and each wav is
trimmed back to its own length.

``wav_seed`` primes the generation queues from seed audio (reference
generate.py:66,168-192) and ``temperature`` shapes the softmax sampling
(reference generate.py:55,216-231); both work on the scan sampler and the
Pallas kernel.
"""
from __future__ import annotations

import functools
import os
import time
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.wavenet import WaveNet, Upsampler, incremental_generate
from ..train.checkpoints import CheckpointManager, load_run_config
from .. import dsp


def batch_mels(mels: Sequence[np.ndarray], pad_value: float
               ) -> "tuple[np.ndarray, List[int]]":
    """Stack ragged [F_i, M] mels into [B, F_max, M] (silence-padded) and
    return the per-stream frame counts for post-trim."""
    frames = [m.shape[0] for m in mels]
    f_max = max(frames)
    out = np.full((len(mels), f_max, mels[0].shape[1]), pad_value, np.float32)
    for i, m in enumerate(mels):
        out[i, :m.shape[0]] = m
    return out, frames


def encode_seed_audio(cfg, wav: np.ndarray, batch: int) -> jnp.ndarray:
    """Raw float waveform -> the sampler's seed_audio convention
    ([B, T, 1] samples for scalar input, [B, T, Q] one-hot otherwise),
    encoded per input_type (reference generate.py:168-182 runs the seed
    through the same mu-law the model was trained on)."""
    w = cfg.wavenet
    x = jnp.asarray(np.asarray(wav, np.float32).reshape(-1))
    if w.input_type == "mulaw":
        x = dsp.mulaw(x, w.quantization_channels)
    if w.scalar_input:
        seed = x[None, :, None]
    else:
        cls = dsp.mulaw_quantize(x, w.quantization_channels)
        seed = jax.nn.one_hot(cls[None, :], w.quantization_channels)
    return jnp.broadcast_to(seed, (batch,) + seed.shape[1:])


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
            # training graph takes [B, T, 1] audio in every input mode (raw
            # samples, or mu-law class ids for quantized corpora); only the
            # shapes matter here
            input_wav = np.zeros((1, frames * hop, 1), np.float32)
            local_condition = np.zeros((1, frames, w.local_condition_channels),
                                       np.float32)
            speaker_id = np.zeros((1,), np.int32)

        state = task.init_state(jax.random.PRNGKey(0), _B)
        mgr = CheckpointManager(checkpoint_dir)
        restored = mgr.restore(jax.tree.map(np.asarray, state), step=step)
        mgr.close()
        from ..utils.misc import packed_device_put
        from ..models.wavenet import materialize_wn_params
        # weight-normalized checkpoints fold to the standard flat layout
        # here; every generation path below is WN-agnostic
        self.params = packed_device_put(materialize_wn_params(
            w, restored.ema_params if use_ema else restored.params))
        self.gc_enable = gc_enable
        self.step = int(restored.step)
        return self

    @functools.cached_property
    def _generate(self):
        cfg = self.cfg
        use_pallas = jax.default_backend() != "cpu"

        @functools.partial(jax.jit, static_argnames=("temperature",))
        def gen(params, mel, rng, gc, seed_audio, temperature):
            lc = Upsampler(cfg.wavenet).apply(
                {"params": params["upsampler"]}, mel)
            if use_pallas:
                from ..ops.wavenet_pallas import pallas_incremental_generate
                return pallas_incremental_generate(
                    cfg.wavenet, params, lc, rng, gc=gc,
                    seed_audio=seed_audio, temperature=temperature), lc
            return incremental_generate(
                cfg.wavenet, params, lc, rng, gc=gc,
                seed_audio=seed_audio, temperature=temperature), lc

        return gen

    def _decode_samples(self, samples: np.ndarray) -> np.ndarray:
        w = self.cfg.wavenet
        if w.input_type == "mulaw-quantize":
            return np.asarray(dsp.inv_mulaw_quantize(
                jnp.asarray(samples), w.quantization_channels))
        if w.input_type == "mulaw":
            return np.asarray(dsp.inv_mulaw(
                jnp.asarray(samples), w.quantization_channels))
        return samples  # raw

    def generate(self, mel: Union[np.ndarray, Sequence[np.ndarray]],
                 speaker_id: Union[int, Sequence[int], None] = None,
                 seed: int = 0,
                 wav_seed: Optional[np.ndarray] = None,
                 temperature: float = 1.0
                 ) -> Union[np.ndarray, List[np.ndarray]]:
        """mel [frames, num_mels] (the synthesizer's .npy contract), or a
        list of up to 8 ragged mels vocoded in ONE batched kernel launch ->
        float waveform(s) [frames*hop].

        ``wav_seed``: raw waveform that primes the generation queues
        (teacher-forced) before free-running.  ``temperature``: softmax
        sampling temperature (quantized input_type only, like the
        reference)."""
        single = not isinstance(mel, (list, tuple))
        mels = [mel] if single else list(mel)
        assert len(mels) <= 8, "batched generation supports up to 8 streams"
        mels = [np.asarray(m, np.float32) for m in mels]
        a = self.cfg.audio
        hop = a.hop_size
        pad_value = -a.max_abs_value if a.symmetric_mels else 0.0
        batch, frames = batch_mels(mels, pad_value)

        gc = None
        if self.gc_enable:
            ids = (np.zeros(len(mels), np.int64) if speaker_id is None
                   else np.broadcast_to(np.asarray(speaker_id),
                                        (len(mels),)))
            gc_table = np.asarray(self.params["gc_embedding"])
            gc = jnp.asarray(gc_table[ids])

        seed_audio = None
        if wav_seed is not None:
            seed_audio = encode_seed_audio(self.cfg, wav_seed, len(mels))
            # Only the receptive field of the seed can influence generation;
            # the reference primes with waveform[-receptive_field:] (reference
            # generate.py:169-182).  Also keep at least one free-running step
            # so seeds longer than the utterance don't over-run T.
            total = batch.shape[1] * hop
            keep = min(self.cfg.wavenet.receptive_field, total - 1)
            seed_audio = seed_audio[:, -keep:]

        rng = jax.random.PRNGKey(seed)
        samples, _ = self._generate(self.params, jnp.asarray(batch), rng, gc,
                                    seed_audio, float(temperature))
        wavs = [self._decode_samples(np.asarray(samples)[i][:frames[i] * hop])
                for i in range(len(mels))]
        return wavs[0] if single else wavs

    def generate_to_file(self, mel_path: Union[str, Sequence[str]],
                         out_path: Union[str, Sequence[str]],
                         speaker_id: Optional[int] = None,
                         wav_seed: Optional[np.ndarray] = None,
                         temperature: float = 1.0) -> List[str]:
        single = isinstance(mel_path, str)
        mel_paths = [mel_path] if single else list(mel_path)
        out_paths = [out_path] if isinstance(out_path, str) else list(out_path)
        mels = [np.load(p) for p in mel_paths]
        t0 = time.time()
        wavs = self.generate(mels, speaker_id=speaker_id, wav_seed=wav_seed,
                             temperature=temperature)
        if isinstance(wavs, np.ndarray):
            wavs = [wavs]
        dt = time.time() - t0
        sr = self.cfg.audio.sample_rate
        n = sum(len(w) for w in wavs)
        print(f"generated {n} samples ({len(wavs)} stream(s)) in {dt:.2f}s "
              f"({n / dt / sr:.2f}x realtime aggregate)")
        for w, p in zip(wavs, out_paths):
            dsp.save_wav(w, p, sr)
        return out_paths

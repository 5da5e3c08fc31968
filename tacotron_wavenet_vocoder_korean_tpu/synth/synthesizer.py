"""Text -> wav synthesis (Tacotron + Griffin-Lim), the reusable inference API.

Parity with reference synthesizer.py:29-388: restore a run dir (its
params.json config + latest checkpoint), free-run decode with fixed max_iters,
attention-argmax end-of-speech trimming (synthesizer.py:235-256), manual-
attention second pass (argmax one-hot / sharpen / prune, :165-198), Griffin-Lim
vocoding, and wav + alignment-PNG + mel ``.npy`` outputs (the mel npy is the
handoff contract to the WaveNet generator).

TPU-native differences: the decode is one jitted program with static shape
buckets, and Griffin-Lim runs on-device.
"""
from __future__ import annotations

import functools
import os
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.tacotron import Tacotron
from ..train.checkpoints import CheckpointManager, load_run_config
from ..text import TextCodec
from .. import dsp
from ..utils import plot
from ..data.loader import round_up


def attention_trim_index(alignment: np.ndarray, seq_len: int,
                         reduction_factor: int) -> int:
    """Frames to keep, from the attention-argmax end-of-speech heuristic
    (reference synthesizer.py:236-256)."""
    attention_argmax = alignment[:seq_len].argmax(0)
    end_idx = min(seq_len - 1, attention_argmax.max())
    max_counter = min(int((attention_argmax == end_idx).sum()), 5)
    end_idx_counter = 0
    jdx = 0
    for jdx, attend_idx in enumerate(attention_argmax):
        if len(attention_argmax) > jdx + 1:
            if attend_idx == end_idx:
                end_idx_counter += 1
            if attend_idx == end_idx and attention_argmax[jdx + 1] > end_idx:
                break
            if end_idx_counter >= max_counter:
                break
        else:
            break
    return reduction_factor * jdx + 3


class Synthesizer:
    def __init__(self):
        self.cfg: Optional[Config] = None
        self.model: Optional[Tacotron] = None
        self.variables = None
        self.codec: Optional[TextCodec] = None

    # ------------------------------------------------------------------
    def load(self, checkpoint_dir: str, num_speakers: Optional[int] = None,
             step: Optional[int] = None,
             fused_rnn: Optional[bool] = None,
             inference_dropout: Optional[bool] = None) -> "Synthesizer":
        """Restore config + weights from a training run dir
        (reference synthesizer.py:34-70).

        ``fused_rnn=True`` loads into the fused-GRU fast-inference path even
        if the checkpoint was trained with flax GRUCells — the params are
        converted exactly (models.modules.fuse_gru_params).

        ``inference_dropout`` overrides ``tacotron.dec_prenet_dropout_inference``
        (reference tacotron.py:41 keeps decoder-prenet dropout live in test
        mode); when enabled, decoding is seeded by ``synthesize(rng_seed=)``."""
        from ..train.tacotron_task import TacotronTask

        self.cfg = load_run_config(checkpoint_dir)
        if inference_dropout and \
                not self.cfg.tacotron.dec_prenet_dropout_inference:
            # The model gates prenet dropout on the config flag AND an rng
            # being supplied; forcing it ON for a run trained with the flag
            # off needs the flag flipped too, or the override is a no-op.
            import dataclasses as _dc
            self.cfg = _dc.replace(
                self.cfg, tacotron=_dc.replace(
                    self.cfg.tacotron, dec_prenet_dropout_inference=True))
        if num_speakers is not None and \
                num_speakers != self.cfg.tacotron.num_speakers:
            raise ValueError(
                f"checkpoint has {self.cfg.tacotron.num_speakers} speakers, "
                f"requested {num_speakers}")
        self.codec = TextCodec(self.cfg.tacotron.cleaners)
        self.model = Tacotron(cfg=self.cfg.tacotron, audio=self.cfg.audio,
                              vocab_size=self.codec.vocab_size)

        # Build an abstract state matching training to restore into.
        task = TacotronTask(self.cfg)
        import numpy as _np
        dummy_T = 32
        r = self.cfg.tacotron.reduction_factor

        class _B:
            inputs = _np.zeros((1, dummy_T), _np.int32)
            input_lengths = _np.full((1,), dummy_T, _np.int32)
            loss_coeff = _np.ones((1,), _np.float32)
            mel_targets = _np.zeros((1, 4 * r, self.cfg.audio.num_mels),
                                    _np.float32)
            linear_targets = _np.zeros((1, 4 * r, self.cfg.audio.num_freq),
                                       _np.float32)
            speaker_id = _np.zeros((1,), _np.int32)

        state = task.init_state(jax.random.PRNGKey(0), _B)
        mgr = CheckpointManager(checkpoint_dir)
        restored = mgr.restore(jax.tree.map(np.asarray, state), step=step)
        mgr.close()
        params = restored.params
        if fused_rnn and not self.cfg.tacotron.fused_rnn:
            from ..models.modules import fuse_gru_params
            import dataclasses as _dc
            params = fuse_gru_params(params)
            self.cfg = _dc.replace(
                self.cfg,
                tacotron=_dc.replace(self.cfg.tacotron, fused_rnn=True))
            self.model = Tacotron(cfg=self.cfg.tacotron, audio=self.cfg.audio,
                                  vocab_size=self.codec.vocab_size)
        from ..utils.misc import packed_device_put
        self.variables = packed_device_put(
            {"params": params, "batch_stats": restored.batch_stats})
        self.step = int(restored.step)
        self.inference_dropout = (
            self.cfg.tacotron.dec_prenet_dropout_inference
            if inference_dropout is None else inference_dropout)
        # _decode closes over self.model and self.inference_dropout; drop a
        # previously-cached decode so a re-load() with different settings
        # (e.g. the A/B in quality_eval) can't silently reuse the old one.
        self.__dict__.pop("_decode", None)
        return self

    # ------------------------------------------------------------------
    @functools.cached_property
    def _decode(self):
        """Jitted free-run decode; params passed as arguments (not baked-in
        constants), so reloads don't retrace."""
        model = self.model
        use_dropout = self.inference_dropout

        @functools.partial(jax.jit, static_argnames=("max_iters",))
        def decode(variables, inputs, input_lengths, speaker_id,
                   manual_alignments, is_manual, rng, max_iters):
            rngs = {"dropout": rng} if use_dropout else None
            out = model.apply(
                variables, inputs, input_lengths, speaker_id=speaker_id,
                manual_alignments=manual_alignments,
                is_manual_attention=is_manual,
                train=False, free_run=True, max_iters=max_iters,
                rngs=rngs)
            return out["linear_outputs"], out["alignments"], out["mel_outputs"]

        return decode

    def _prepare_inputs(self, texts: Sequence[str]):
        seqs = [self.codec.encode(t) for t in texts]
        max_len = round_up(max(len(s) for s in seqs), 16)
        inputs = np.zeros((len(seqs), max_len), np.int32)
        lengths = np.zeros(len(seqs), np.int32)
        for i, s in enumerate(seqs):
            inputs[i, :len(s)] = s
            lengths[i] = len(s)  # includes EOS (+1 fix, tacotron.py:11)
        return inputs, lengths

    # ------------------------------------------------------------------
    def synthesize_long(self, text: str, base_path: Optional[str] = None,
                        speaker_id: int = 0, silence_ms: float = 150.0,
                        **kwargs) -> dict:
        """Split long text at sentence boundaries, synthesize each piece, and
        concatenate with short silences (the practical capability behind the
        reference's short_concat path, synthesizer.py:289-330)."""
        import re
        pieces = [p.strip() for p in re.split(r"(?<=[.!?])\s+", text.strip())
                  if p.strip()]
        if not pieces:
            pieces = [text]
        results = self.synthesize(
            pieces, base_path=None,
            speaker_ids=[speaker_id] * len(pieces), **kwargs)
        sr = self.cfg.audio.sample_rate
        gap = np.zeros(int(sr * silence_ms / 1000.0), np.float32)
        wav_parts = []
        for r in results:
            wav_parts.extend([r["wav"].astype(np.float32), gap])
        wav = np.concatenate(wav_parts[:-1]) if wav_parts else np.zeros(0)
        mel = np.concatenate([r["mel"] for r in results], axis=0)
        out = {"wav": wav, "mel": mel, "text": text, "pieces": len(pieces)}
        if base_path:
            os.makedirs(base_path, exist_ok=True)
            out["wav_path"] = os.path.join(base_path, "long.wav")
            dsp.save_wav(wav, out["wav_path"], sr)
            out["mel_path"] = os.path.join(base_path, "long.mel.npy")
            np.save(out["mel_path"], mel, allow_pickle=False)
        return out

    # ------------------------------------------------------------------
    def synthesize(self, texts: Union[str, Sequence[str]],
                   base_path: Optional[str] = None,
                   speaker_ids: Optional[Sequence[int]] = None,
                   attention_trim: bool = True,
                   manual_attention_mode: int = 0,
                   max_iters: Optional[int] = None,
                   save_alignment: bool = True,
                   save_mel: bool = True,
                   rng_seed: int = 0) -> List[dict]:
        """Synthesize each text; returns a list of dicts with wav/mel/paths.

        ``manual_attention_mode``: 0 off, 1 argmax one-hot, 2 sharpen (square),
        3 prune (reference synthesizer.py:165-198).  ``rng_seed`` seeds the
        inference-time decoder-prenet dropout (no-op when
        ``inference_dropout`` is off) — same seed, same audio.
        """
        if isinstance(texts, str):
            texts = [texts]
        cfg = self.cfg
        r = cfg.tacotron.reduction_factor
        inputs, lengths = self._prepare_inputs(texts)
        B, T_in = inputs.shape
        if speaker_ids is None:
            speaker_ids = np.zeros(B, np.int32)
        speaker_ids = np.asarray(speaker_ids, np.int32)
        max_iters = max_iters or cfg.tacotron.max_iters

        rng = jax.random.PRNGKey(rng_seed)
        zero_manual = jnp.zeros((B, max_iters, T_in))
        linear, align, mel = self._decode(
            self.variables, jnp.asarray(inputs), jnp.asarray(lengths),
            jnp.asarray(speaker_ids), zero_manual, jnp.asarray(False),
            rng, max_iters)

        if manual_attention_mode > 0:
            a = np.asarray(align)                      # [B, T_in, T_dec]
            new_manual = np.transpose(a, (0, 2, 1)).copy()  # [B, T_dec, T_in]
            for idx in range(B):
                argmax = a[idx].argmax(0)              # per decoder step
                if manual_attention_mode == 1:         # argmax one-hot
                    new_manual[idx] = 0.0
                    new_manual[idx][range(len(argmax)), argmax] = 1.0
                elif manual_attention_mode == 2:       # sharpen
                    new_manual[idx] = new_manual[idx] ** 2
                elif manual_attention_mode == 3:       # prune
                    new_manual[idx][range(len(argmax)), argmax] = 1.0
            linear, align, mel = self._decode(
                self.variables, jnp.asarray(inputs), jnp.asarray(lengths),
                jnp.asarray(speaker_ids), jnp.asarray(new_manual),
                jnp.asarray(True), rng, max_iters)

        linear = np.asarray(linear)
        align = np.asarray(align)
        mel = np.asarray(mel)

        results = []
        for idx, text in enumerate(texts):
            lin_i, align_i, mel_i = linear[idx], align[idx], mel[idx]
            n_keep = lin_i.shape[0]
            if attention_trim:
                n_keep = min(n_keep, attention_trim_index(
                    align_i, int(lengths[idx]), r))
            lin_i, mel_i = lin_i[:n_keep], mel_i[:n_keep]

            # Pad the trimmed spectrogram to a coarse frame bucket before
            # Griffin-Lim so the jitted inversion compiles once per bucket
            # instead of once per utterance length (compiles over the
            # tunneled chip take minutes); silence-pad, then cut the wav.
            bucket = round_up(max(n_keep, 1), 100)      # 1.25 s buckets
            pad_val = (-cfg.audio.max_abs_value
                       if cfg.audio.symmetric_mels else 0.0)
            lin_pad = np.pad(lin_i, ((0, bucket - n_keep), (0, 0)),
                             constant_values=pad_val)
            wav = np.asarray(dsp.inv_linear_spectrogram(lin_pad.T, cfg.audio))
            wav = wav[:n_keep * cfg.audio.hop_size]
            entry = {"wav": wav, "mel": mel_i, "alignment": align_i,
                     "text": text}
            if base_path:
                os.makedirs(base_path, exist_ok=True)
                suffix = "_manual" if manual_attention_mode > 0 else ""
                wav_path = os.path.join(base_path, f"{idx}{suffix}.wav")
                dsp.save_wav(wav, wav_path, cfg.audio.sample_rate)
                entry["wav_path"] = wav_path
                if save_mel:
                    mel_path = os.path.join(base_path, f"{idx}{suffix}.mel.npy")
                    np.save(mel_path, mel_i, allow_pickle=False)
                    entry["mel_path"] = mel_path
                if save_alignment:
                    from ..text.hangul import jamo_char_to_hcj
                    png = os.path.join(base_path, f"{idx}{suffix}.png")
                    # compatibility-jamo forms: fonts carry glyphs for these
                    chars = [jamo_char_to_hcj(self.codec.decode([t]))
                             for t in inputs[idx][:int(lengths[idx])]]
                    plot.plot_alignment(
                        align_i[:int(lengths[idx])], png,
                        info=f"{len(text)} chars", text=chars)
                    entry["alignment_path"] = png
            results.append(entry)
        return results

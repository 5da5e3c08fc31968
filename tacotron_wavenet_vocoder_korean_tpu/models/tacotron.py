"""Tacotron-1 (multi-speaker, DeepVoice2-style conditioning) in flax.

Re-architecture of reference tacotron/tacotron.py:31-317 for TPU/XLA:

  * the TF ``dynamic_decode`` while-loop + 5-deep RNNCell wrapper stack
    becomes one ``nn.scan`` over a fused DecoderStep; teacher forcing,
    free-running inference, and manual-attention injection
    (synthesizer.py:165-198) are all the same compiled program, selected by a
    static flag / a traced boolean.
  * alignment history is a scan output (not a TensorArray).
  * attention memory projection (keys) is computed once, outside the loop.
  * static shapes everywhere: inference runs a fixed ``max_iters`` scan and
    trimming happens downstream off the alignments (synthesizer.py:235-256).

Decoder data path per step (tacotron.py:151-177):
  prev frame -> prenet [256,128] (+speaker concat in 'simple' mode)
  -> attention GRU(256) with input [prenet, prev_context]
  -> attention mechanism -> context
  -> concat(gru_out, context (+speaker)) -> Dense(256)
  -> 2x residual GRU(256)
  -> Dense(num_mels * r)
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import TacotronConfig, AudioConfig
from .attention import make_attention
from .modules import CBHG, FusedGRUCell, Prenet


class DecoderCarry(NamedTuple):
    attn_cell: jnp.ndarray      # attention GRU state      [B, attn_state]
    context: jnp.ndarray        # attention context        [B, enc_out]
    attn_state: jnp.ndarray     # mechanism state          [B, T_in] (or mixtures)
    dec_cells: Tuple[jnp.ndarray, ...]  # residual GRU states [B, dec_rnn]
    prev_frame: jnp.ndarray     # last emitted mel frame   [B, num_mels]


class Decoder(nn.Module):
    """Scan wrapper producing [B, T_dec*r, num_mels] + alignments."""

    cfg: TacotronConfig
    num_mels: int
    dtype: Any = None   # compute dtype; attention math stays f32

    @nn.compact
    def __call__(self, keys, values, mask, max_steps: int,
                 teacher_frames: Optional[jnp.ndarray],
                 manual_alignments: Optional[jnp.ndarray],
                 is_manual_attention: Optional[jnp.ndarray],
                 speaker_embed: Optional[jnp.ndarray],
                 init_states: Optional[Dict[str, Any]],
                 free_run: bool, deterministic: bool,
                 teacher_force_prob: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        B = values.shape[0]
        T_in = values.shape[1]
        dt = self.dtype or jnp.float32

        mechanism = make_attention(cfg.attention_type, cfg.attention_size)
        attn_state0 = mechanism.init_state(B, T_in)

        if init_states is not None:  # deepvoice speaker conditioning
            attn_cell0 = init_states["attention_rnn_init_state"].astype(dt)
            dec_cells0 = tuple(st.astype(dt)
                               for st in init_states["decoder_rnn_init_states"])
        else:
            attn_cell0 = jnp.zeros((B, cfg.attention_state_size), dt)
            dec_cells0 = tuple(jnp.zeros((B, cfg.dec_rnn_size), dt)
                               for _ in range(cfg.dec_layer_num))

        carry0 = DecoderCarry(
            attn_cell=attn_cell0,
            context=jnp.zeros((B, values.shape[-1]), dt),
            attn_state=attn_state0,
            dec_cells=dec_cells0,
            prev_frame=jnp.zeros((B, self.num_mels), dt),  # <GO> frame
        )

        if teacher_frames is None:
            teacher_frames = jnp.zeros((max_steps, B, self.num_mels), dt)
        else:
            teacher_frames = teacher_frames.astype(dt)
        if manual_alignments is None:
            manual_alignments = jnp.zeros((max_steps, B, T_in))
        if is_manual_attention is None:
            use_manual = jnp.zeros((max_steps, B), bool)
        else:
            use_manual = jnp.broadcast_to(
                jnp.asarray(is_manual_attention)[None, None], (max_steps, B))

        step = _ScanDecoderStep(cfg=cfg, num_mels=self.num_mels,
                                dtype=self.dtype, name="step")
        scan = nn.scan(
            lambda module, carry, xs: module(
                carry, xs, keys, values, mask, speaker_embed,
                free_run, deterministic, teacher_force_prob),
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True, "ss": True},
            in_axes=0, out_axes=0, length=max_steps,
            unroll=cfg.scan_unroll,
        )
        _, (frame_blocks, alignments) = scan(
            step, carry0, (teacher_frames, manual_alignments, use_manual))

        # [T_dec, B, r*M] -> [B, T_dec*r, M]
        frame_blocks = jnp.transpose(frame_blocks, (1, 0, 2))
        mel_outputs = frame_blocks.reshape(B, max_steps * cfg.reduction_factor,
                                           self.num_mels)
        # [T_dec, B, T_in] -> [B, T_in, T_dec] (reference tacotron.py:223)
        alignments = jnp.transpose(alignments, (1, 2, 0))
        return mel_outputs, alignments


class _ScanDecoderStep(nn.Module):
    """DecoderStep reshaped for nn.scan: (carry, xs) -> (carry, ys)."""

    cfg: TacotronConfig
    num_mels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, carry: DecoderCarry, xs, keys, values, mask,
                 speaker_embed, free_run, deterministic,
                 teacher_force_prob=None):
        cfg = self.cfg
        dt = self.dtype or jnp.float32
        teacher_frame, manual_alignment, use_manual = xs

        if teacher_force_prob is None or not self.has_rng("ss"):
            frame_in = jnp.where(free_run, carry.prev_frame, teacher_frame)
        else:
            # Scheduled sampling (Bengio et al. 2015): per example per step,
            # feed the teacher's r-th frame with prob p, the model's own
            # previous output otherwise.  Exposure-bias mitigation the
            # reference lacks (its helpers.py:36-47 always teacher-force);
            # p=1.0 reproduces the reference path exactly.
            use_teacher = jax.random.bernoulli(
                self.make_rng("ss"), teacher_force_prob,
                (teacher_frame.shape[0],))
            take_teacher = jnp.logical_and(
                jnp.logical_not(free_run), use_teacher)
            frame_in = jnp.where(take_teacher[:, None], teacher_frame,
                                 carry.prev_frame)

        x = Prenet(cfg.dec_prenet_sizes, cfg.dropout_prob, dtype=self.dtype,
                   name="decoder_prenet")(frame_in, deterministic)
        if speaker_embed is not None and cfg.model_type == "simple":
            x = jnp.concatenate([x, speaker_embed.astype(dt)], axis=-1)

        gru_in = jnp.concatenate([x, carry.context], axis=-1)
        cell_cls = FusedGRUCell if cfg.fused_rnn else nn.GRUCell
        attn_cell, gru_out = cell_cls(
            features=cfg.attention_state_size, dtype=self.dtype,
            name="attention_gru")(carry.attn_cell, gru_in)

        mechanism = make_attention(cfg.attention_type, cfg.attention_size)
        computed_alignments, next_attn_state = mechanism(
            gru_out, carry.attn_state, keys, values, mask)

        alignments = jnp.where(use_manual[:, None], manual_alignment,
                               computed_alignments)
        # attention math is f32; cast the context back to the compute dtype
        context = jnp.einsum("bt,btd->bd", alignments,
                             values.astype(jnp.float32)).astype(dt)

        cat = [gru_out, context]
        if speaker_embed is not None and cfg.model_type == "simple":
            cat.append(speaker_embed.astype(dt))
        h = nn.Dense(cfg.dec_rnn_size, dtype=self.dtype,
                     name="decoder_input_projection")(
            jnp.concatenate(cat, axis=-1))

        new_dec_cells = []
        for i in range(cfg.dec_layer_num):
            cell_state, out = cell_cls(
                features=cfg.dec_rnn_size, dtype=self.dtype,
                name=f"decoder_gru_{i + 1}")(carry.dec_cells[i], h)
            h = h + out
            new_dec_cells.append(cell_state)

        frames = nn.Dense(cfg.reduction_factor * self.num_mels,
                          dtype=self.dtype, name="frame_projection")(h)
        new_carry = DecoderCarry(
            attn_cell=attn_cell,
            context=context,
            attn_state=next_attn_state,
            dec_cells=tuple(new_dec_cells),
            prev_frame=frames[:, -self.num_mels:],  # last frame of the block
        )
        return new_carry, (frames, alignments)


class Tacotron(nn.Module):
    """Full text -> (mel, linear) model (reference tacotron/tacotron.py:31)."""

    cfg: TacotronConfig
    audio: AudioConfig
    vocab_size: int = 80

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, input_lengths: jnp.ndarray,
                 speaker_id: Optional[jnp.ndarray] = None,
                 mel_targets: Optional[jnp.ndarray] = None,
                 manual_alignments: Optional[jnp.ndarray] = None,
                 is_manual_attention: Optional[jnp.ndarray] = None,
                 train: bool = True, free_run: bool = False,
                 max_iters: Optional[int] = None,
                 teacher_force_prob: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        B, T_in = inputs.shape
        deterministic = not train
        # Decoder-prenet dropout stays live at inference when the config asks
        # for it AND the caller supplied a 'dropout' rng (reference
        # tacotron.py:41 semantics); without an rng we fall back to
        # deterministic so exactness tests and rng-less callers still work.
        dec_deterministic = deterministic and not (
            cfg.dec_prenet_dropout_inference and self.has_rng("dropout"))
        # Mixed precision (cfg.compute_dtype): modules compute in bf16 with
        # f32 params; attention math and returned outputs stay f32.
        dt = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None)

        # --- Character embedding with frozen-zero PAD row (tacotron.py:51-60)
        embed_table = self.param(
            "char_embedding",
            nn.initializers.truncated_normal(stddev=0.5),
            (self.vocab_size, cfg.embedding_size))
        embed_table = embed_table.at[0].set(0.0)
        char_embedded = embed_table[inputs]               # [B, T_in, E]

        # --- Speaker conditioning (tacotron.py:62-101)
        speaker_embed = None
        before_highway = None
        encoder_rnn_init_state = None
        decoder_init_states = None
        if cfg.num_speakers > 1:
            speaker_table = self.param(
                "speaker_embedding",
                nn.initializers.truncated_normal(stddev=0.5),
                (cfg.num_speakers, cfg.speaker_embedding_size))
            speaker_embed = speaker_table[speaker_id]     # [B, S]
            if cfg.model_type == "deepvoice":
                def deep_dense(dim, name):
                    return nn.soft_sign(nn.Dense(dim, name=name)(speaker_embed))
                before_highway = deep_dense(cfg.enc_prenet_sizes[-1],
                                            "sp_before_highway")
                encoder_rnn_init_state = deep_dense(cfg.enc_rnn_size * 2,
                                                    "sp_encoder_rnn_init")
                decoder_init_states = {
                    "attention_rnn_init_state": deep_dense(
                        cfg.attention_state_size, "sp_attention_rnn_init"),
                    "decoder_rnn_init_states": [
                        deep_dense(cfg.dec_rnn_size, f"sp_decoder_rnn_init_{i + 1}")
                        for i in range(cfg.dec_layer_num)],
                }
                speaker_embed = None  # deepvoice doesn't use it directly
            elif cfg.model_type == "simple":
                pass  # concat-style conditioning handled in decoder/postnet
            else:
                raise ValueError(f"bad model_type {cfg.model_type!r} for "
                                 f"multi-speaker")

        # --- Encoder: prenet + CBHG (tacotron.py:103-115)
        prenet_out = Prenet(cfg.enc_prenet_sizes, cfg.dropout_prob, dtype=dt,
                            name="encoder_prenet")(char_embedded, deterministic)
        encoder_outputs = CBHG(
            bank_size=cfg.enc_bank_size,
            bank_channel_size=cfg.enc_bank_channel_size,
            maxpool_width=cfg.enc_maxpool_width,
            highway_depth=cfg.enc_highway_depth,
            rnn_size=cfg.enc_rnn_size,
            proj_sizes=cfg.enc_proj_sizes,
            proj_width=cfg.enc_proj_width,
            dtype=dt,
            unroll=cfg.scan_unroll,
            fused_rnn=cfg.fused_rnn,
            name="encoder_cbhg")(
                prenet_out, input_lengths, train,
                before_highway=before_highway,
                rnn_init_state=encoder_rnn_init_state)

        # Memory mask + zeroed padded values (TF _prepare_memory).
        mask = jnp.arange(T_in)[None, :] < input_lengths[:, None]
        values = encoder_outputs * mask[..., None]
        keys = nn.Dense(cfg.attention_size, use_bias=False,
                        name="memory_layer")(values)

        # --- Decoder scan (tacotron.py:149-204)
        r = cfg.reduction_factor
        num_mels = self.audio.num_mels
        if mel_targets is not None:
            max_steps = mel_targets.shape[1] // r
            # Teacher forcing feeds every r-th target frame as the NEXT
            # step's input (helpers.py:36-47,55): step 0 gets the <GO> zero
            # frame and step t gets block t-1's last frame.  Feeding block
            # t's own last frame at step t would leak the current target
            # (the model learns to copy it; free-run then collapses).
            block_last = jnp.transpose(mel_targets[:, r - 1::r, :], (1, 0, 2))
            teacher = jnp.concatenate(
                [jnp.zeros_like(block_last[:1]), block_last[:-1]], axis=0)
        else:
            max_steps = max_iters or cfg.max_iters
            teacher = None

        manual_t = None
        if manual_alignments is not None:
            # [B, T_dec, T_in] -> time-major [T_dec, B, T_in]
            manual_t = jnp.transpose(manual_alignments, (1, 0, 2))

        mel_outputs, alignments = Decoder(
            cfg=cfg, num_mels=num_mels, dtype=dt, name="decoder")(
                keys, values, mask, max_steps, teacher, manual_t,
                is_manual_attention, speaker_embed, decoder_init_states,
                free_run, dec_deterministic,
                teacher_force_prob=teacher_force_prob)

        # --- Post-net CBHG -> linear spectrogram (tacotron.py:206-219)
        post_out = CBHG(
            bank_size=cfg.post_bank_size,
            bank_channel_size=cfg.post_bank_channel_size,
            maxpool_width=cfg.post_maxpool_width,
            highway_depth=cfg.post_highway_depth,
            rnn_size=cfg.post_rnn_size,
            proj_sizes=cfg.post_proj_sizes,
            proj_width=cfg.post_proj_width,
            dtype=dt,
            unroll=cfg.scan_unroll,
            fused_rnn=cfg.fused_rnn,
            name="post_cbhg")(mel_outputs, None, train)

        if speaker_embed is not None and cfg.model_type == "simple":
            tiled = jnp.broadcast_to(
                speaker_embed[:, None, :].astype(post_out.dtype),
                (B, post_out.shape[1], speaker_embed.shape[-1]))
            post_out = jnp.concatenate([tiled, post_out], axis=-1)

        linear_outputs = nn.Dense(self.audio.num_freq, dtype=dt,
                                  name="linear_projection")(post_out)

        return {
            "mel_outputs": mel_outputs.astype(jnp.float32),
            "linear_outputs": linear_outputs.astype(jnp.float32),
            "alignments": alignments.astype(jnp.float32),
        }


def tacotron_loss(outputs: Dict[str, jnp.ndarray],
                  mel_targets: jnp.ndarray, linear_targets: jnp.ndarray,
                  loss_coeff: jnp.ndarray, cfg: TacotronConfig,
                  audio: AudioConfig) -> Dict[str, jnp.ndarray]:
    """L1 mel + L1 linear with per-example loss_coeff and optional
    frequency-prioritized band (reference tacotron.py:258-282)."""
    mel_l1 = jnp.abs(mel_targets - outputs["mel_outputs"])
    lin_l1 = jnp.abs(linear_targets - outputs["linear_outputs"])
    coeff = loss_coeff[:, None, None]

    if cfg.prioritize_loss:
        upper = int(5000 / (audio.sample_rate * 0.5) * audio.num_freq)
        lower = int(165 / (audio.sample_rate * 0.5) * audio.num_freq)
        priority = lin_l1[:, :, lower:upper]
        loss = (jnp.mean(mel_l1 * coeff)
                + 0.5 * jnp.mean(lin_l1 * coeff)
                + 0.5 * jnp.mean(priority * coeff))
        linear_loss = 0.5 * (jnp.mean(lin_l1) + jnp.mean(priority))
    else:
        loss = jnp.mean(mel_l1 * coeff) + jnp.mean(lin_l1 * coeff)
        linear_loss = jnp.mean(lin_l1)

    mel_loss = jnp.mean(mel_l1)
    return {
        "loss": loss,
        "mel_loss": mel_loss,
        "linear_loss": linear_loss,
        "loss_without_coeff": mel_loss + linear_loss,
    }


def scheduled_sampling_prob(cfg: TacotronConfig, step) -> jnp.ndarray:
    """Teacher-forcing probability at ``step``: 1.0 until ``ss_start_step``,
    then linear to ``ss_final_prob`` over ``ss_ramp_steps``, constant after.
    Differentiable-free scalar; safe to trace (step may be a tracer)."""
    s = jnp.asarray(step, jnp.float32)
    frac = jnp.clip((s - cfg.ss_start_step) / max(cfg.ss_ramp_steps, 1),
                    0.0, 1.0)
    return 1.0 + frac * (cfg.ss_final_prob - 1.0)


def learning_rate_schedule(cfg: TacotronConfig,
                           is_randomly_initialized: bool = False):
    """Mode 0: Noam-style warmup; mode 1: exponential decay 0.95 per 3000
    steps (reference tacotron.py:294-303)."""
    warmup = 4000.0 if is_randomly_initialized else 40000.0

    def schedule(step):
        s = jnp.asarray(step, jnp.float32) + 1.0
        if cfg.decay_learning_rate_mode == 1:
            return cfg.initial_learning_rate * 0.95 ** (s / 3000.0)
        return (cfg.initial_learning_rate * warmup ** 0.5
                * jnp.minimum(s * warmup ** -1.5, s ** -0.5))

    return schedule

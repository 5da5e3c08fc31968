"""WaveNet vocoder: parallel training graph + on-device incremental sampler.

Re-architecture of reference wavenet/model.py for TPU/XLA:

  * Training (reference model.py:112-167,247-312): the 50-layer dilated stack
    is expressed with VALID lax convs exactly like the reference, but local
    conditioning is **input-aligned** — at every layer the upsampled mel is
    sliced so position j carries the mel of that position's current sample.
    (The reference slices the *first* L elements at every layer,
    model.py:79-80, silently shifting the conditioning by the accumulated
    receptive field; training and its queue-based generation disagree.  We
    keep train == generate alignment instead.)
  * Generation (reference model.py:49-64,116-146,215-245 + generate.py's
    1-sess.run-per-sample loop): the per-layer rolling queues become a
    ``lax.scan`` carry of ring buffers indexed by ``t mod dilation`` — the
    whole utterance is ONE device program, no host round-trips.

Supports the reference's three input modes: 'raw' (scalar, MoL output),
'mulaw' (scalar, MoL), 'mulaw-quantize' (one-hot 256, softmax CE output),
plus global (speaker) conditioning via an embedding (model.py:181-212).
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import WaveNetConfig
from .mixture import (
    discretized_mix_logistic_loss, sample_from_discretized_mix_logistic)


def wn_weight(v: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Weight normalization (arXiv 1602.07868): w = g * v / ||v||, the norm
    reduced over every axis but the last (output features)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(v),
                            axis=tuple(range(v.ndim - 1)),
                            keepdims=True) + 1e-12)
    return v * (g / norm)


def materialize_wn_params(cfg: WaveNetConfig, params) -> Any:
    """Convert a weight-normalized param tree to the standard layout.

    Generation consumers (the scan sampler, the Pallas pack, vocoder eval)
    read weights by their standard flat names; with
    ``cfg.weight_normalization`` the training tree stores ``<name>_v`` /
    ``<name>_g`` pairs (and flat ``post_N_kernel/bias`` instead of the Dense
    submodules).  This folds each pair into ``<name>`` and restores the
    nested ``post_N`` layout, so everything downstream is agnostic to how
    the model was trained.  No-op when the flag is off."""
    if not cfg.weight_normalization:
        return params
    out = {}
    for k, v in params.items():
        if isinstance(v, dict):
            out[k] = v
        elif k.endswith("_v"):
            out[k[:-2]] = wn_weight(v, params[k[:-2] + "_g"])
        elif not k.endswith("_g"):
            out[k] = v
    for p in ("post_1", "post_2"):
        if p + "_kernel" in out:
            sub = {"kernel": out.pop(p + "_kernel")}
            if p + "_bias" in out:
                sub["bias"] = out.pop(p + "_bias")
            out[p] = sub
    return out


def _causal_conv(x: jnp.ndarray, kernel: jnp.ndarray, dilation: int,
                 bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """VALID 1-D conv, NWC layout; kernel [W, Cin, Cout]."""
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    if bias is not None:
        out = out + bias
    return out


class Upsampler(nn.Module):
    """mel (frame rate) -> sample rate local condition via stacked
    conv2d_transpose (reference model.py:102-111)."""

    cfg: WaveNetConfig

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        x = mel[..., None]                       # [B, frames, num_mels, 1]
        for i, factor in enumerate(self.cfg.upsample_factor):
            x = nn.ConvTranspose(
                features=1,
                kernel_size=(factor, self.cfg.filter_width),
                strides=(factor, 1),
                padding="SAME", use_bias=False,
                name=f"upsample_{i}")(x)
        return jnp.squeeze(x, -1)                # [B, frames*hop, num_mels]


class WaveNet(nn.Module):
    """Training-graph WaveNet (one forward pass over a full crop)."""

    cfg: WaveNetConfig

    @nn.compact
    def __call__(self, audio: jnp.ndarray, mel: jnp.ndarray,
                 speaker_id: Optional[jnp.ndarray] = None
                 ) -> Dict[str, jnp.ndarray]:
        """audio [B, T, 1] in [-1,1]; mel [B, T//hop, num_mels].

        Returns raw_output [B, T-rf, out_channels] and target [B, T-rf, 1]
        (scalar modes) or class ids (quantized mode).
        """
        cfg = self.cfg
        rf = cfg.receptive_field
        # Mixed precision: compute in bf16, params/targets/loss in f32
        # (cfg.compute_dtype; exact when 'float32').
        dt = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
              else jnp.float32)

        lc_full = Upsampler(cfg, name="upsampler")(mel)   # [B, T, num_mels]

        gc = None
        if cfg.num_speakers > 1 and speaker_id is not None:
            gc_table = self.param(
                "gc_embedding", nn.initializers.glorot_normal(),
                (cfg.num_speakers, cfg.gc_channels))
            gc = gc_table[speaker_id]                      # [B, gc]

        if cfg.scalar_input:
            x = audio[:, :-1, :].astype(dt)
            target = audio[:, rf:, :]
        else:
            # Quantized mode: the corpus/feeder already stores mu-law CLASS
            # IDS (data/corpus.py:48-53, like the reference feeder) — one-hot
            # them directly (reference wavenet/model.py:221-229); re-encoding
            # here would double-compand.
            ids = jnp.round(audio[..., 0]).astype(jnp.int32)
            onehot = jax.nn.one_hot(ids, cfg.quantization_channels)
            x = onehot[:, :-1, :].astype(dt)
            target = ids[:, rf:]

        lc = lc_full[:, :-1, :].astype(dt)                 # aligned with x

        # Front causal conv (model.py:41-46).
        width = (cfg.initial_filter_width if cfg.scalar_input
                 else cfg.filter_width)
        front_kernel = self._weight(
            "causal_kernel", (width, x.shape[-1], cfg.residual_channels), dt)
        h = _causal_conv(x, front_kernel, 1)
        lc = lc[:, width - 1:, :]

        output_width = audio.shape[1] - rf
        skip_acc = None
        if gc is not None:
            gc = gc.astype(dt)
        for i, d in enumerate(cfg.dilations):
            h, lc, skip = self._dilation_layer(i, d, h, lc, gc, output_width,
                                               dt)
            skip_acc = skip if skip_acc is None else skip_acc + skip

        n_out = (cfg.out_channels if cfg.scalar_input
                 else cfg.quantization_channels)
        if cfg.weight_normalization:
            # flat params here; materialize_wn_params rebuilds the nested
            # post_N/{kernel,bias} layout generation consumers expect
            w1 = self._weight("post_1_kernel",
                              (cfg.skip_channels, cfg.skip_channels), dt)
            out = nn.relu(skip_acc) @ w1
            if cfg.use_biases:
                out = out + self.param("post_1_bias", nn.initializers.zeros,
                                       (cfg.skip_channels,)).astype(dt)
            w2 = self._weight("post_2_kernel", (cfg.skip_channels, n_out), dt)
            raw_output = nn.relu(out) @ w2
            if cfg.use_biases:
                raw_output = raw_output + self.param(
                    "post_2_bias", nn.initializers.zeros, (n_out,)).astype(dt)
        else:
            out = nn.Dense(cfg.skip_channels, use_bias=cfg.use_biases,
                           dtype=dt, name="post_1")(nn.relu(skip_acc))
            raw_output = nn.Dense(n_out, use_bias=cfg.use_biases,
                                  dtype=dt, name="post_2")(nn.relu(out))
        return {"raw_output": raw_output.astype(jnp.float32),
                "target": target,
                "local_condition": lc_full}

    def _weight(self, name: str, shape: Tuple[int, ...],
                dt=jnp.float32) -> jnp.ndarray:
        """Stack weight, optionally weight-normalized.

        With ``cfg.weight_normalization`` the param is stored as a direction
        ``<name>_v`` (glorot init, like the plain path) plus a per-output
        scale ``<name>_g`` initialized to the ANALYTIC expected glorot
        column norm — so the initial effective weights match the
        unnormalized parameterization's statistics (the r9y9 lineage gets
        this by data-dependent init; flax inits are independent)."""
        init = nn.initializers.glorot_normal()
        if not self.cfg.weight_normalization:
            return self.param(name, init, shape).astype(dt)
        v = self.param(name + "_v", init, shape)
        # flax glorot fans: receptive field = prod of non-feature dims
        rf = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
        std = float(np.sqrt(2.0 / (shape[-2] * rf + shape[-1] * rf)))
        g0 = std * float(np.sqrt(np.prod(shape[:-1])))  # E||v_col||
        g = self.param(name + "_g",
                       lambda rng, s: jnp.full(s, g0, jnp.float32),
                       (int(shape[-1]),))
        return wn_weight(v, g).astype(dt)

    def _dilation_layer(self, i: int, d: int, h, lc, gc, output_width,
                        dt=jnp.float32):
        cfg = self.cfg
        cast = lambda w: w.astype(dt)
        conv_filter = self._weight(
            f"layer_{i}_filter_kernel",
            (cfg.filter_width, cfg.residual_channels, cfg.dilation_channels),
            dt)
        conv_gate = self._weight(
            f"layer_{i}_gate_kernel",
            (cfg.filter_width, cfg.residual_channels, cfg.dilation_channels),
            dt)
        b_filter = b_gate = None
        if cfg.use_biases:
            b_filter = self.param(f"layer_{i}_filter_bias",
                                  nn.initializers.zeros,
                                  (cfg.dilation_channels,))
            b_gate = self.param(f"layer_{i}_gate_bias",
                                nn.initializers.zeros,
                                (cfg.dilation_channels,))

        filt = _causal_conv(h, conv_filter, d,
                            None if b_filter is None else cast(b_filter))
        gate = _causal_conv(h, conv_gate, d,
                            None if b_gate is None else cast(b_gate))
        lc = lc[:, d:, :]                                   # input-aligned

        w_lc_f = self._weight(f"layer_{i}_lc_filter",
                              (cfg.local_condition_channels,
                               cfg.dilation_channels), dt)
        w_lc_g = self._weight(f"layer_{i}_lc_gate",
                              (cfg.local_condition_channels,
                               cfg.dilation_channels), dt)
        filt = filt + lc @ w_lc_f
        gate = gate + lc @ w_lc_g

        if gc is not None:
            w_gc_f = self._weight(f"layer_{i}_gc_filter",
                                  (cfg.gc_channels, cfg.dilation_channels),
                                  dt)
            w_gc_g = self._weight(f"layer_{i}_gc_gate",
                                  (cfg.gc_channels, cfg.dilation_channels),
                                  dt)
            filt = filt + (gc @ w_gc_f)[:, None, :]
            gate = gate + (gc @ w_gc_g)[:, None, :]

        out = jnp.tanh(filt) * jax.nn.sigmoid(gate)

        w_res = self._weight(f"layer_{i}_res_kernel",
                             (cfg.dilation_channels, cfg.residual_channels),
                             dt)
        w_skip = self._weight(f"layer_{i}_skip_kernel",
                              (cfg.dilation_channels, cfg.skip_channels), dt)
        b_res = b_skip = 0.0
        if cfg.use_biases:
            b_res = self.param(f"layer_{i}_res_bias", nn.initializers.zeros,
                               (cfg.residual_channels,))
            b_skip = self.param(f"layer_{i}_skip_bias", nn.initializers.zeros,
                                (cfg.skip_channels,))

        skip = out[:, -output_width:, :] @ w_skip + (
            b_skip if isinstance(b_skip, float) else cast(b_skip))
        transformed = out @ w_res + (
            b_res if isinstance(b_res, float) else cast(b_res))
        h = h[:, d:, :] + transformed                       # residual
        return h, lc, skip


def wavenet_loss(cfg: WaveNetConfig, outputs: Dict[str, jnp.ndarray],
                 l2_params=None) -> Dict[str, jnp.ndarray]:
    """DML (scalar) or softmax CE (quantized) + optional L2
    (reference model.py:247-312)."""
    raw, target = outputs["raw_output"], outputs["target"]
    if cfg.scalar_input:
        nll = discretized_mix_logistic_loss(raw, target, num_class=2 ** 16,
                                            reduce=False)
        loss = jnp.mean(nll)
    else:
        loss = jnp.mean(
            optax_softmax_ce(raw, target, cfg.quantization_channels))
    metrics = {"loss": loss}
    if l2_params is not None and cfg.l2_regularization_strength > 0:
        l2 = sum(jnp.sum(p ** 2) / 2 for name, p in l2_params
                 if "bias" not in name)
        metrics["l2_loss"] = l2
        metrics["loss"] = loss + cfg.l2_regularization_strength * l2
    return metrics


def optax_softmax_ce(logits, labels, num_classes):
    onehot = jax.nn.one_hot(labels, num_classes)
    return -jnp.sum(onehot * jax.nn.log_softmax(logits), axis=-1)


# ---------------------------------------------------------------------------
# Incremental generation: ring-buffer scan (Fast WaveNet on-device)
# ---------------------------------------------------------------------------

class GenState(NamedTuple):
    causal_buf: jnp.ndarray            # [B, width, Cin]
    layer_bufs: Tuple[jnp.ndarray, ...]  # per layer [B, d, R]
    prev: jnp.ndarray                  # [B, Cin] previous sample (scalar/onehot)
    rng: jax.Array


def init_gen_state(cfg: WaveNetConfig, batch: int, rng: jax.Array,
                   seed_sample: Optional[jnp.ndarray] = None) -> GenState:
    cin = 1 if cfg.scalar_input else cfg.quantization_channels
    width = cfg.initial_filter_width if cfg.scalar_input else cfg.filter_width
    prev = (seed_sample if seed_sample is not None
            else jnp.zeros((batch, cin)))
    return GenState(
        causal_buf=jnp.zeros((batch, width, cin)),
        layer_bufs=tuple(jnp.zeros((batch, d, cfg.residual_channels))
                         for d in cfg.dilations),
        prev=prev,
        rng=rng,
    )


def _sweep_logits(cfg: WaveNetConfig, params: Dict[str, Any], state: GenState,
                  t: jnp.ndarray, lc_t: jnp.ndarray,
                  gc: Optional[jnp.ndarray]
                  ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Single-step stack sweep: push ``state.prev`` into the ring buffers,
    run every dilated layer at time ``t``, and return
    ``(new_causal_buf, new_layer_bufs, logits)``.  Mirrors the queue shifts
    of reference model.py:116-146 without any host round-trip.  Shared by
    the free-running sampler (:func:`_gen_step`) and the teacher-forced
    equivalence harness (:func:`teacher_forced_incremental`) so the
    incremental==parallel proof exercises the production sweep."""
    p = params

    causal_buf = jnp.concatenate(
        [state.causal_buf[:, 1:, :], state.prev[:, None, :]], axis=1)
    h = jnp.einsum("bwc,wcr->br", causal_buf, p["causal_kernel"])

    skip_acc = 0.0
    new_bufs: List[jnp.ndarray] = []
    for i, d in enumerate(cfg.dilations):
        buf = state.layer_bufs[i]
        slot = jnp.remainder(t, d)
        old = jax.lax.dynamic_index_in_dim(buf, slot, axis=1,
                                           keepdims=False)  # h[t-d]
        wf = p[f"layer_{i}_filter_kernel"]                   # [2, R, D]
        wg = p[f"layer_{i}_gate_kernel"]
        filt = old @ wf[0] + h @ wf[1] + lc_t @ p[f"layer_{i}_lc_filter"]
        gate = old @ wg[0] + h @ wg[1] + lc_t @ p[f"layer_{i}_lc_gate"]
        if cfg.use_biases:
            filt = filt + p[f"layer_{i}_filter_bias"]
            gate = gate + p[f"layer_{i}_gate_bias"]
        if gc is not None:
            filt = filt + gc @ p[f"layer_{i}_gc_filter"]
            gate = gate + gc @ p[f"layer_{i}_gc_gate"]
        out = jnp.tanh(filt) * jax.nn.sigmoid(gate)

        skip = out @ p[f"layer_{i}_skip_kernel"]
        res = out @ p[f"layer_{i}_res_kernel"]
        if cfg.use_biases:
            skip = skip + p[f"layer_{i}_skip_bias"]
            res = res + p[f"layer_{i}_res_bias"]
        skip_acc = skip_acc + skip

        new_bufs.append(jax.lax.dynamic_update_index_in_dim(
            buf, h, slot, axis=1))
        h = h + res

    out = nn.relu(skip_acc)
    out = out @ p["post_1"]["kernel"]
    if cfg.use_biases:
        out = out + p["post_1"]["bias"]
    out = nn.relu(out)
    logits = out @ p["post_2"]["kernel"]
    if cfg.use_biases:
        logits = logits + p["post_2"]["bias"]
    return causal_buf, tuple(new_bufs), logits


def _gen_step(cfg: WaveNetConfig, params: Dict[str, Any], state: GenState,
              t: jnp.ndarray, lc_t: jnp.ndarray,
              gc: Optional[jnp.ndarray], temperature: float = 1.0,
              deterministic: bool = False
              ) -> Tuple[GenState, jnp.ndarray]:
    """One sample: sweep the stack, then draw the next sample from the
    logits (reference generate.py:202-233's per-sample loop)."""
    causal_buf, new_bufs, logits = _sweep_logits(
        cfg, params, state, t, lc_t, gc)

    rng, step_rng = jax.random.split(state.rng)
    if cfg.scalar_input:
        if deterministic:
            nr = logits.shape[-1] // 3
            sel = jax.nn.one_hot(jnp.argmax(logits[:, :nr], -1), nr)
            sample = jnp.clip(
                jnp.sum(logits[:, nr:2 * nr] * sel, -1), -1.0, 1.0)
        else:
            sample = sample_from_discretized_mix_logistic(
                step_rng, logits[:, None, :])[:, 0]          # [B]
        nxt = sample[:, None]                                # [B, 1]
        emitted = sample
    else:
        scaled = jnp.log(jax.nn.softmax(logits, -1) + 1e-20) / temperature
        if deterministic:
            cls = jnp.argmax(scaled, axis=-1)
        else:
            cls = jax.random.categorical(step_rng, scaled, axis=-1)
        nxt = jax.nn.one_hot(cls, cfg.quantization_channels)
        emitted = cls.astype(jnp.float32)

    return GenState(causal_buf, new_bufs, nxt, rng), emitted


def incremental_generate(cfg: WaveNetConfig, params: Dict[str, Any],
                         lc: jnp.ndarray,
                         rng: jax.Array,
                         gc: Optional[jnp.ndarray] = None,
                         seed_audio: Optional[jnp.ndarray] = None,
                         temperature: float = 1.0,
                         deterministic: bool = False) -> jnp.ndarray:
    """Generate ``lc.shape[1]`` samples conditioned on upsampled mel
    ``lc [B, T, num_mels]``.  One XLA program for the whole utterance
    (the reference does one sess.run per sample, generate.py:202-233).

    ``seed_audio [B, T_seed, Cin]`` primes the buffers teacher-forced for the
    first T_seed steps (reference generate.py:168-182's wav_seed path), then
    the model free-runs.
    """
    B, T, _ = lc.shape
    state = init_gen_state(cfg, B, rng)

    if seed_audio is None:
        seed_len = 0
        cin = 1 if cfg.scalar_input else cfg.quantization_channels
        seed_padded = jnp.zeros((B, T, cin))
    else:
        seed_len = seed_audio.shape[1]
        seed_padded = jnp.pad(seed_audio,
                              ((0, 0), (0, T - seed_len), (0, 0)))

    def body(state, inputs):
        t, lc_t, seed_t = inputs
        use_seed = t < seed_len
        st = state._replace(
            prev=jnp.where(use_seed, seed_t, state.prev))
        return _gen_step(cfg, params, st, t, lc_t, gc, temperature,
                         deterministic)

    ts = jnp.arange(T)
    _, samples = jax.lax.scan(
        body, state,
        (ts, jnp.swapaxes(lc, 0, 1), jnp.swapaxes(seed_padded, 0, 1)))
    return jnp.swapaxes(samples, 0, 1)                        # [B, T]


def teacher_forced_incremental(cfg: WaveNetConfig, params: Dict[str, Any],
                               audio: jnp.ndarray, lc: jnp.ndarray,
                               gc: Optional[jnp.ndarray] = None
                               ) -> jnp.ndarray:
    """Run the incremental step over *given* inputs, returning raw logits per
    step — used to prove incremental == parallel training graph.  Shares
    :func:`_sweep_logits` with the production sampler so the equivalence
    proof cannot drift from the real generation path."""
    B, T, cin = audio.shape
    state = init_gen_state(cfg, B, jax.random.PRNGKey(0))

    def body(state, inputs):
        t, x_t, lc_t = inputs
        st = state._replace(prev=x_t)
        causal_buf, new_bufs, logits = _sweep_logits(
            cfg, params, st, t, lc_t, gc)
        return GenState(causal_buf, new_bufs, x_t, st.rng), logits

    ts = jnp.arange(T)
    _, logits = jax.lax.scan(
        body, state, (ts, jnp.swapaxes(audio, 0, 1), jnp.swapaxes(lc, 0, 1)))
    return jnp.swapaxes(logits, 0, 1)                          # [B, T, C]

"""Persistent Pallas TPU kernel for WaveNet autoregressive generation.

The lax.scan sampler (models/wavenet.py) keeps its loop state in HBM — every
sample pays ~50 ring-buffer HBM round-trips, capping throughput well below
realtime.  This kernel keeps EVERYTHING on-chip and minimizes per-sample
overhead:

  * all stack weights packed and resident in VMEM (bf16 by default)
  * compact per-dilation ring buffers: one dynamic row read/store per
    *unique* dilation (10, not 50) — the Fast WaveNet queues (reference
    wavenet/model.py:49-64) collapse into time-indexed windows because
    (t - d) mod d addresses every layer sharing dilation d
  * local-condition projections for every layer precomputed by one big
    MXU matmul (lc @ W_all + gc @ W_all + biases) and streamed per
    time-chunk through the pallas grid pipeline, flat [chunk, L*2D] layout
  * the 50-layer serial sweep is dependency-LATENCY-bound (measured ~5x
    faster with the layer->layer dependency ablated), so the residual
    chain is algebraically restructured until the only per-layer work on
    the critical path is gate -> narrow [B,D]@[D,2D] matmul -> add; the
    old-tap matmuls (history-only inputs), the residual/h accumulation,
    contributions to layers >= l+2, and the deferred one-matmul skip path
    all run in the chain's shadow (see pack_params)
  * multi-stream batching (B <= 8): per-stream history scratches and lc
    streams share the weight-resident kernel — aggregate throughput scales
    with B while the per-step latency barely moves
  * mixture-of-logistics sampling in-kernel via the TPU PRNG
  * measured on v5e: 83k samples/s single-stream (3.5x realtime at 24 kHz)
    vs 62k for the naive dependent-chain layout

Reference behavior being accelerated: wavenet/model.py:49-64,116-146,215-245
(queue-based fast generation) + generate.py:202-233 (the per-sample
sess.run loop, CPU-pinned in the reference).
"""
from __future__ import annotations

import functools
import math
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import WaveNetConfig

LOG_SCALE_MIN = float(math.log(1e-14))


def pack_params(cfg: WaveNetConfig, params: Dict[str, Any],
                weight_dtype=jnp.float32,
                fuse_block: int = 25) -> Dict[str, jnp.ndarray]:
    """Pack the flax param tree into kernel-layout arrays.

    The serial per-sample critical path is 50 dependent layer sweeps; to
    shorten it the residual chain is *algebraically fused* in blocks of
    ``fuse_block`` layers.  Writing h_m for layer m's input,

        h_m = h_bs + sum_{l<m in block} (gated_l @ w_res_l + b_res_l)

    so the current-tap term of layer m's pre-activation decomposes as

        h_m @ w_cur_m = h_bs @ w_cur_m                      (1 matmul / block)
                      + sum gated_l @ (w_res_l @ w_cur_m)   (folded into the
                                                             res matmul)
                      + sum b_res_l @ w_cur_m               (constant: folded
                                                             into lc_bias)

    Packed arrays:

      w_old     [L, R, 2D]      dilated tap at t-d -> [filter|gate]; these
                                read *history*, independent of the chain, so
                                the kernel hoists all L matmuls ahead of it
      w_cur_blk [nblk, R, K*2D] per-block h_bs current taps (zero-padded)
      m_next    [L, D, 2D]      w_res_l @ w_cur_{l+1} — the ONLY matmul on
                                the serial critical path (the kernel is
                                dependency-latency-bound: a narrow 2D-wide
                                result has the shortest MXU turnaround)
      m_rest    [L, D, R+(K-2)*2D]  [w_res_l | w_res_l@w_cur_{l+2} | ...] —
                                residual projection + contributions to
                                layers ≥ l+2; issued off the critical path
                                and absorbed in the shadow of the chain
      w_skip    [L*D, S]        all layers' skip kernels stacked (one matmul)
      b_res     [L, R]
      w_lc_all  [C_lc, L*2D], lc_bias [L*2D] (layer + fused b_res biases)
      w_gc_all  [G, L*2D]       (present when the model has speaker cond.)
      front [W, R], skip_bias [S], post1/b1/post2/b2
    """
    L = len(cfg.dilations)
    R, D, S = (cfg.residual_channels, cfg.dilation_channels,
               cfg.skip_channels)
    K = max(1, min(fuse_block, L))
    nblk = -(-L // K)
    w_old, w_cur, w_res, w_skip, b_res, w_lc, lc_bias = [], [], [], [], [], [], []
    for i in range(L):
        wf = params[f"layer_{i}_filter_kernel"]   # [2, R, D]
        wg = params[f"layer_{i}_gate_kernel"]
        w_old.append(jnp.concatenate([wf[0], wg[0]], axis=-1))   # [R, 2D]
        w_cur.append(jnp.concatenate([wf[1], wg[1]], axis=-1))   # [R, 2D]
        w_res.append(params[f"layer_{i}_res_kernel"])            # [D, R]
        w_skip.append(params[f"layer_{i}_skip_kernel"])          # [D, S]
        b_res.append(params.get(f"layer_{i}_res_bias", jnp.zeros(R)))
        w_lc.append(jnp.concatenate(
            [params[f"layer_{i}_lc_filter"],
             params[f"layer_{i}_lc_gate"]], axis=-1))            # [C_lc, 2D]
        bias = jnp.concatenate([
            params.get(f"layer_{i}_filter_bias", jnp.zeros(D)),
            params.get(f"layer_{i}_gate_bias", jnp.zeros(D))])
        lc_bias.append(bias)

    # Fold the intra-block residual-bias cross terms into the lc bias.
    for m in range(L):
        for l in range(K * (m // K), m):
            lc_bias[m] = lc_bias[m] + b_res[l] @ w_cur[m]

    # Per-block current-tap weights on the block-start hidden state.
    blk = []
    for b in range(nblk):
        cols = w_cur[b * K:(b + 1) * K]
        cols += [jnp.zeros((R, 2 * D))] * (K - len(cols))
        blk.append(jnp.concatenate(cols, axis=1))                # [R, K*2D]

    # Critical-path matmul: only the next in-block layer's contribution.
    m_next = []
    for l in range(L):
        if l + 1 < min(K * (l // K) + K, L):
            m_next.append(w_res[l] @ w_cur[l + 1])
        else:
            m_next.append(jnp.zeros((D, 2 * D)))

    # Off-path matmul: res projection + contributions to layers >= l+2.
    m_rest = []
    m_width = R + max(0, K - 2) * 2 * D
    for l in range(L):
        parts = [w_res[l]]
        for m in range(l + 2, min(K * (l // K) + K, L)):
            parts.append(w_res[l] @ w_cur[m])
        cat = jnp.concatenate(parts, axis=1)
        m_rest.append(jnp.pad(cat, ((0, 0), (0, m_width - cat.shape[1]))))

    skip_bias = sum(params.get(f"layer_{i}_skip_bias", jnp.zeros(S))
                    for i in range(L))
    w_gc_all = None
    if f"layer_0_gc_filter" in params:
        w_gc_all = jnp.concatenate([
            jnp.concatenate([params[f"layer_{i}_gc_filter"],
                             params[f"layer_{i}_gc_gate"]], axis=-1)
            for i in range(L)], axis=-1)                      # [G, L*2D]
    wd = weight_dtype
    out = {
        "w_old": jnp.stack(w_old).astype(wd),                 # [L, R, 2D]
        "w_cur_blk": jnp.stack(blk).astype(wd),               # [nblk, R, K*2D]
        "m_next": jnp.stack(m_next).astype(wd),               # [L, D, 2D]
        "m_rest": jnp.stack(m_rest).astype(wd),               # [L, D, m_width]
        "w_skip": jnp.concatenate(w_skip, axis=0).astype(wd),  # [L*D, S]
        "b_res": jnp.stack(b_res).astype(jnp.float32),        # [L, R]
        "w_lc_all": jnp.concatenate(w_lc, axis=-1),           # [C_lc, L*2D]
        "lc_bias": jnp.concatenate(lc_bias),                  # [L*2D]
        # Front causal conv: scalar input keeps the [W, R] tap matrix; the
        # quantized (softmax) path flattens [W, Q, R] -> [W*Q, R] so the
        # kernel applies it as one one-hot matmul (row w*Q+q = tap w, class q).
        "front": (params["causal_kernel"][:, 0, :]
                  if cfg.scalar_input
                  else params["causal_kernel"].reshape(
                      -1, params["causal_kernel"].shape[-1])).astype(wd),
        "skip_bias": skip_bias.astype(jnp.float32),           # [S]
        "post1": params["post_1"]["kernel"].astype(wd),
        "b1": params["post_1"].get("bias", jnp.zeros(S)).astype(jnp.float32),
        "post2": params["post_2"]["kernel"].astype(wd),
        "b2": params["post_2"].get(
            "bias",
            jnp.zeros(params["post_2"]["kernel"].shape[-1])).astype(jnp.float32),
    }
    if w_gc_all is not None:
        out["w_gc_all"] = w_gc_all
    return out


def precompute_lc_proj(packed: Dict[str, jnp.ndarray],
                       lc: jnp.ndarray,
                       gc: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[T, C_lc] -> [T, L*2D]: one MXU matmul outside the sampling loop.
    ``gc [G]`` (per-stream speaker embedding) folds in as a constant row."""
    proj = lc @ packed["w_lc_all"] + packed["lc_bias"][None, :]
    if gc is not None:
        proj = proj + (gc.reshape(1, -1) @ packed["w_gc_all"])
    return proj


def _uniform_from_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> (0,1) floats, clipped away from the endpoints.

    Mosaic has no uint32->f32 cast; the top 24 bits fit an int32, which does.
    """
    i = (bits >> jnp.uint32(8)).astype(jnp.int32)
    u = i.astype(jnp.float32) * (1.0 / (1 << 24))
    return jnp.clip(u, 1e-5, 1.0 - 1e-5)


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def _ablations() -> set:
    """Perf-diagnosis switches (scripts/bench_gen_kernel.py --ablate):
    TWVK_ABLATE=gates,hist_read,hist_store,old_taps,tail removes components
    from the generation kernel to locate the per-sample latency.  Output is
    garbage under any ablation — never set in production."""
    return set(filter(None, os.environ.get("TWVK_ABLATE", "").split(",")))


def make_generate_kernel(cfg: WaveNetConfig, chunk: int, batch: int = 1,
                         deterministic: bool = False, fuse_block: int = 25,
                         prime: bool = False):
    """Build the kernel body for a static (config, chunk, batch).

    History layout: per (stream, unique dilation d) a compact ring of d rows,
    each row holding the layer inputs of the layers that share that dilation
    (grouped lanes).  Total history = sum(d) * group * R floats per stream
    (~650 KB for the full model) instead of max_d * L * R (~3.3 MB) — this is
    what lets 8 streams fit VMEM together with the weights.

    Two sampling heads share the stack sweep:
      * scalar input (``cfg.scalar_input``): mixture-of-logistics head, the
        raw-sample window feeds a [W, R] front matmul.
      * quantized input: 256-way softmax head with ``temperature`` (reference
        generate.py:216-231); the window holds CLASS INDICES and the front
        causal conv is a one-hot [B, W*Q] @ [W*Q, R] matmul.

    ``prime=True`` adds a teacher-forcing stream (reference
    generate.py:168-192's wav_seed path): for t < prime_len the window tail
    is overwritten with the seed sample before the sweep — exactly the scan
    sampler's ``prev=seed[t]`` substitution — so histories warm up on real
    audio and generation continues from it.
    """
    L = len(cfg.dilations)
    R, D, S = (cfg.residual_channels, cfg.dilation_channels,
               cfg.skip_channels)
    scalar_mode = cfg.scalar_input
    C_out = cfg.out_channels
    nr_mix = C_out // 3
    Q = cfg.quantization_channels
    dilations = tuple(cfg.dilations)
    unique_d = sorted(set(dilations))
    # layers grouped by dilation; position of layer l within its group
    groups = {d: [l for l, dd in enumerate(dilations) if dd == d]
              for d in unique_d}
    group_pos = {}
    for d, ls in groups.items():
        for k, l in enumerate(ls):
            group_pos[l] = (d, k)
    B = batch
    assert B <= 8, "batched kernel supports up to 8 streams"
    n_hist = len(unique_d)
    K = max(1, min(fuse_block, L))
    ablate = _ablations()
    W = cfg.initial_filter_width if scalar_mode else cfg.filter_width

    def kernel(scal_ref, *refs):
        # refs: B lc streams, [prime stream], 12 weight refs, [temperature],
        # out_ref, then B*n_hist history scratches (stream-major) + window.
        idx = B
        lc_refs = refs[:B]
        prime_ref = None
        if prime:
            prime_ref = refs[idx]                   # [chunk, 8]
            idx += 1
        (w_old_ref, w_cur_blk_ref, m_next_ref, m_rest_ref, w_skip_ref,
         b_res_ref, front_ref, skip_bias_ref, post1_ref, b1_ref, post2_ref,
         b2_ref) = refs[idx:idx + 12]
        idx += 12
        temp_ref = None
        if not scalar_mode:
            temp_ref = refs[idx]                    # [1, 1] f32
            idx += 1
        out_ref = refs[idx]
        hists = refs[idx + 1:idx + 1 + B * n_hist]
        window = refs[idx + 1 + B * n_hist]         # [B, W]

        def hist(b, d):
            return hists[b * n_hist + unique_d.index(d)]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            for h_ref in hists:
                h_ref[...] = jnp.zeros_like(h_ref)
            # Quantized mode: -1 marks "no sample yet" so the one-hot front
            # conv contributes nothing (the scan sampler's zero-vector prev);
            # class 0 would wrongly select real taps.
            window[...] = (jnp.zeros_like(window) if scalar_mode
                           else jnp.full_like(window, -1.0))

        pltpu.prng_seed(scal_ref[0] + i)
        prime_len = scal_ref[1]

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        if not scalar_mode:
            # Mosaic only allows integer iota; cast to f32 after.
            q_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, Q), 1).astype(jnp.float32)

        def step(j, out_acc):
            t = i * chunk + j

            if prime:
                # Teacher-forced warm-up: replace the window tail (last
                # step's sample) with the seed value for this step.
                w_now = window[...]
                forced = jnp.transpose(
                    prime_ref[pl.ds(j, 1), :])[:B, :]          # [B, 1]
                tail = jnp.where(t < prime_len, forced, w_now[:, W - 1:W])
                window[...] = jnp.concatenate([w_now[:, :W - 1], tail],
                                              axis=-1)

            # One ring-row read per (stream, unique dilation): slot t mod d
            # holds the group's layer inputs from step t-d.
            rows = {}
            for d in unique_d:
                if "hist_read" in ablate:
                    rows[d] = jnp.zeros((B, len(groups[d]) * R), jnp.float32)
                    continue
                slot_d = jax.lax.rem(t, d) if d > 1 else 0
                rows[d] = jnp.concatenate(
                    [hist(b, d)[pl.ds(slot_d, 1), :] for b in range(B)],
                    axis=0)                                    # [B, G_d*R]

            # Front causal conv over the input window.
            if scalar_mode:
                h = jnp.dot(window[...].astype(front_ref.dtype),
                            front_ref[...],
                            preferred_element_type=jnp.float32)  # [B, R]
            else:
                # window holds class indices; one-hot against the flattened
                # [W*Q, R] tap matrix (row w*Q+q) in a single MXU matmul.
                oh = jnp.concatenate(
                    [(q_iota == window[:, w:w + 1]).astype(jnp.float32)
                     for w in range(W)], axis=-1)              # [B, W*Q]
                h = jnp.dot(oh.astype(front_ref.dtype), front_ref[...],
                            preferred_element_type=jnp.float32)  # [B, R]

            lc_rows = jnp.concatenate(
                [lc_refs[b][pl.ds(j, 1), :] for b in range(B)],
                axis=0).astype(jnp.float32)                    # [B, L*2D]

            # Old-tap matmuls read only *history* — no serial dependency —
            # so issue all L of them ahead of the chain (MXU pipelines
            # independent pushes back-to-back).
            old_con = []
            for l, d in enumerate(dilations):
                if "old_taps" in ablate:
                    old_con.append(jnp.zeros((B, 2 * D), jnp.float32))
                    continue
                _, k = group_pos[l]
                old = rows[d][:, k * R:(k + 1) * R]            # [B, R]
                old_con.append(
                    jnp.dot(old.astype(w_old_ref.dtype), w_old_ref[l],
                            preferred_element_type=jnp.float32))  # [B, 2D]

            # Fused residual chain, critical-path-minimal form.  The kernel
            # is dependency-LATENCY-bound (measured: the same ops run ~5x
            # faster with the layer->layer dependency ablated), so per layer
            # only three things sit on the serial path:
            #     gate nonlinearity -> narrow [B,D]@[D,2D] m_next matmul
            #     -> one add into the next layer's pre-activation.
            # Everything else — the residual/h accumulation, contributions
            # to layers >= l+2 (m_rest), history stores, the skip matmul —
            # is independent work the MXU/VPU absorb in the chain's shadow.
            h_parts = [None] * L
            gated_parts = []
            if "chain" in ablate:
                h_parts = [h] * L
                gated_parts = [h[:, :D] * 0.1] * L
            for blk_start in ([] if "chain" in ablate
                              else range(0, L, K)):
                kb = min(K, L - blk_start)
                cur = jnp.dot(h.astype(w_cur_blk_ref.dtype),
                              w_cur_blk_ref[blk_start // K],
                              preferred_element_type=jnp.float32)  # [B, K*2D]
                fgs = [lc_rows[:, (blk_start + k) * 2 * D:
                               (blk_start + k + 1) * 2 * D]
                       + old_con[blk_start + k]
                       + cur[:, k * 2 * D:(k + 1) * 2 * D]
                       for k in range(kb)]
                for k in range(kb):
                    l = blk_start + k
                    if "gates" in ablate:
                        gated = fgs[k][:, :D] * 0.25 + fgs[k][:, D:] * 0.125
                    else:
                        gated = jnp.tanh(fgs[k][:, :D]) * jax.nn.sigmoid(
                            fgs[k][:, D:])
                    h_parts[l] = h
                    gated_parts.append(gated)
                    nxt = None
                    if k + 1 < kb:
                        nxt = jnp.dot(gated.astype(m_next_ref.dtype),
                                      m_next_ref[l],
                                      preferred_element_type=jnp.float32)
                    rest = jnp.dot(gated.astype(m_rest_ref.dtype),
                                   m_rest_ref[l],
                                   preferred_element_type=jnp.float32)
                    if "indep" in ablate:
                        # keep every op but cut the layer->layer data
                        # dependency: distinguishes dependency-latency-bound
                        # from instruction-issue-bound
                        h = h + b_res_ref[l][None, :]
                        continue
                    if nxt is not None:
                        fgs[k + 1] = fgs[k + 1] + nxt
                    for m in range(k + 2, kb):
                        fgs[m] = fgs[m] + rest[:, R + (m - k - 2) * 2 * D:
                                               R + (m - k - 1) * 2 * D]
                    h = h + rest[:, :R] + b_res_ref[l][None, :]

            # One ring-row store per (stream, unique dilation).
            if "hist_store" not in ablate:
                for d in unique_d:
                    slot_d = jax.lax.rem(t, d) if d > 1 else 0
                    row = jnp.concatenate([h_parts[l] for l in groups[d]],
                                          axis=-1)             # [B, G_d*R]
                    for b in range(B):
                        hist(b, d)[pl.ds(slot_d, 1), :] = row[b:b + 1, :]

            if "tail" in ablate:
                x = jnp.clip(jnp.sum(gated_parts[-1], axis=-1) * 1e-3,
                             -1.0, 1.0)                        # [B]
                out_acc = jnp.where(lane == j, x[:, None], out_acc)
                window[...] = jnp.concatenate(
                    [window[:, 1:], x[:, None]], axis=-1)
                return out_acc

            # Deferred skip: one [B, L*D] @ [L*D, S] MXU matmul.
            gated_all = jnp.concatenate(gated_parts, axis=-1)
            skip_acc = jnp.dot(gated_all.astype(w_skip_ref.dtype),
                               w_skip_ref[...],
                               preferred_element_type=jnp.float32)

            z = jnp.maximum(skip_acc + skip_bias_ref[...], 0.0)
            z = jnp.dot(z.astype(post1_ref.dtype), post1_ref[...],
                        preferred_element_type=jnp.float32) + b1_ref[...]
            z = jnp.maximum(z, 0.0)
            logits = jnp.dot(z.astype(post2_ref.dtype), post2_ref[...],
                             preferred_element_type=jnp.float32) + b2_ref[...]

            if scalar_mode:
                # logits: [B, C_out] = [logit_probs | means | log_scales]
                if deterministic:
                    scores = logits[:, :nr_mix]
                else:
                    bits = pltpu.bitcast(
                        pltpu.prng_random_bits((16, 128)), jnp.uint32)
                    u_sel = _uniform_from_bits(bits[0:B, :nr_mix])  # [B, nr]
                    scores = logits[:, :nr_mix] - jnp.log(-jnp.log(u_sel))
                sel = (scores >= jnp.max(scores, axis=-1, keepdims=True))
                sel = sel.astype(jnp.float32)
                sel = sel / jnp.sum(sel, axis=-1, keepdims=True)  # ties safe
                mean = jnp.sum(logits[:, nr_mix:2 * nr_mix] * sel, axis=-1)
                if deterministic:
                    x = jnp.clip(mean, -1.0, 1.0)                 # [B]
                else:
                    log_scale = jnp.maximum(
                        jnp.sum(logits[:, 2 * nr_mix:] * sel, axis=-1),
                        LOG_SCALE_MIN)
                    u = _uniform_from_bits(bits[8:8 + B, 0:1])[:, 0]  # [B]
                    x = mean + jnp.exp(log_scale) * (jnp.log(u)
                                                     - jnp.log(1.0 - u))
                    x = jnp.clip(x, -1.0, 1.0)                    # [B]
            else:
                # 256-way softmax head with temperature (scan sampler /
                # reference generate.py:216-231: log(softmax+1e-20)/T, then
                # categorical = Gumbel-max).
                mx = jnp.max(logits, axis=-1, keepdims=True)
                logp = (logits - mx) - jnp.log(
                    jnp.sum(jnp.exp(logits - mx), axis=-1, keepdims=True))
                scores = jnp.log(jnp.exp(logp) + 1e-20) / temp_ref[0, 0]
                if not deterministic:
                    nrow = _next_pow2(max(B, 8))
                    bits = pltpu.bitcast(
                        pltpu.prng_random_bits((nrow, Q)), jnp.uint32)
                    u = _uniform_from_bits(bits[:B, :])           # [B, Q]
                    scores = scores - jnp.log(-jnp.log(u))
                sel = (scores >= jnp.max(scores, axis=-1, keepdims=True))
                # first max index (argmax semantics, ties -> lowest class)
                x = jnp.min(jnp.where(sel, q_iota, float(Q)), axis=-1)  # [B]

            # Mosaic can't do unaligned dynamic 1-D stores; accumulate the
            # chunk in registers and store once at the end.
            out_acc = jnp.where(lane == j, x[:, None], out_acc)  # [B, chunk]
            # Shift the raw-sample window and append the new sample.
            window[...] = jnp.concatenate(
                [window[:, 1:], x[:, None]], axis=-1)
            return out_acc

        out_acc = jax.lax.fori_loop(
            0, chunk, step, jnp.zeros((B, chunk), jnp.float32))
        if B < 8:
            out_acc = jnp.concatenate(
                [out_acc, jnp.zeros((8 - B, chunk), jnp.float32)], axis=0)
        out_ref[...] = out_acc[None]

    hist_shapes = [(max(d, 8), len(groups[d]) * R) for d in unique_d]
    return kernel, hist_shapes


@functools.partial(jax.jit,
                   static_argnames=("cfg", "chunk", "deterministic",
                                    "fuse_block"))
def pallas_generate(cfg: WaveNetConfig, packed: Dict[str, jnp.ndarray],
                    lc_projs, seed: jnp.ndarray,
                    chunk: int = 64, deterministic: bool = False,
                    fuse_block: int = 25,
                    primed: Optional[jnp.ndarray] = None,
                    temperature: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Generate T samples for B streams sharing weights.

    ``lc_projs``: tuple of B arrays [T, L*2D] (T padded to a multiple of
    ``chunk``).  ``seed``: [2] int32 = (prng_seed, prime_len).  ``primed``:
    optional [T, 8] teacher-forcing stream (column b = stream b; raw samples
    in scalar mode, class indices in quantized mode) consumed for
    t < prime_len.  ``temperature`` (scalar) shapes the softmax head only.
    Returns [B, T] float32 (raw samples, or class indices in quantized mode).
    """
    if not isinstance(lc_projs, (list, tuple)):
        lc_projs = (lc_projs,)
    B = len(lc_projs)
    T = lc_projs[0].shape[0]
    assert T % chunk == 0, f"T={T} must be a multiple of chunk={chunk}"
    L = len(cfg.dilations)
    D = cfg.dilation_channels
    W = cfg.initial_filter_width if cfg.scalar_input else cfg.filter_width
    S = cfg.skip_channels
    # Guard against packing/calling with inconsistent fuse blocks: the
    # kernel slices w_cur_blk/m_rest by K, so a mismatch silently produces
    # garbage.  K is recoverable from the packed shapes.
    K = max(1, min(fuse_block, L))
    K_packed = packed["w_cur_blk"].shape[2] // (2 * D)
    assert K_packed == K, (
        f"packed fuse_block={K_packed} != requested fuse_block={K}; "
        f"pack_params and pallas_generate must agree")
    prime = primed is not None

    kernel, hist_shapes = make_generate_kernel(cfg, chunk, batch=B,
                                               deterministic=deterministic,
                                               fuse_block=fuse_block,
                                               prime=prime)

    lc_specs = [pl.BlockSpec((chunk, lc_projs[0].shape[1]),
                             lambda i, *_: (i, 0)) for _ in range(B)]
    prime_specs, prime_ops = [], []
    if prime:
        prime_specs = [pl.BlockSpec((chunk, 8), lambda i, *_: (i, 0))]
        prime_ops = [primed]
    temp_specs, temp_ops = [], []
    if not cfg.scalar_input:
        if temperature is None:
            temperature = jnp.float32(1.0)
        temp_specs = [pl.BlockSpec((1, 1), lambda i, *_: (0, 0))]
        temp_ops = [jnp.reshape(temperature.astype(jnp.float32), (1, 1))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // chunk,),
        in_specs=lc_specs + prime_specs + [
            pl.BlockSpec(packed["w_old"].shape, lambda i, *_: (0, 0, 0)),
            pl.BlockSpec(packed["w_cur_blk"].shape, lambda i, *_: (0, 0, 0)),
            pl.BlockSpec(packed["m_next"].shape, lambda i, *_: (0, 0, 0)),
            pl.BlockSpec(packed["m_rest"].shape, lambda i, *_: (0, 0, 0)),
            pl.BlockSpec(packed["w_skip"].shape, lambda i, *_: (0, 0)),
            pl.BlockSpec(packed["b_res"].shape, lambda i, *_: (0, 0)),
            pl.BlockSpec(packed["front"].shape, lambda i, *_: (0, 0)),
            pl.BlockSpec((1, S), lambda i, *_: (0, 0)),
            pl.BlockSpec(packed["post1"].shape, lambda i, *_: (0, 0)),
            pl.BlockSpec((1, S), lambda i, *_: (0, 0)),
            pl.BlockSpec(packed["post2"].shape, lambda i, *_: (0, 0)),
            pl.BlockSpec((1, packed["b2"].shape[0]), lambda i, *_: (0, 0)),
        ] + temp_specs,
        out_specs=pl.BlockSpec((1, 8, chunk), lambda i, *_: (i, 0, 0)),
        scratch_shapes=(
            [pltpu.VMEM(shape, jnp.float32)
             for _ in range(B) for shape in hist_shapes]
            + [pltpu.VMEM((B, W), jnp.float32)]
        ),
    )

    out3d = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T // chunk, 8, chunk), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(seed,
      *lc_projs, *prime_ops,
      packed["w_old"], packed["w_cur_blk"], packed["m_next"],
      packed["m_rest"], packed["w_skip"], packed["b_res"], packed["front"],
      packed["skip_bias"][None, :],
      packed["post1"], packed["b1"][None, :],
      packed["post2"], packed["b2"][None, :],
      *temp_ops)
    # [n_chunks, 8, chunk] -> [B, T]
    return jnp.transpose(out3d[:, :B, :], (1, 0, 2)).reshape(B, T)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "chunk", "deterministic", "weight_dtype",
                     "fuse_block"))
def pallas_incremental_generate(cfg: WaveNetConfig, params: Dict[str, Any],
                                lc: jnp.ndarray, rng: jax.Array,
                                gc: Optional[jnp.ndarray] = None,
                                chunk: int = 64,
                                deterministic: bool = False,
                                weight_dtype=None,
                                fuse_block: Optional[int] = None,
                                seed_audio: Optional[jnp.ndarray] = None,
                                temperature: float = 1.0,
                                ) -> jnp.ndarray:
    """Drop-in for models.wavenet.incremental_generate:
    [B, T, C_lc] mel-rate-upsampled lc -> [B, T] samples, B <= 8 streams
    sharing the weight-resident kernel.  Supports both heads: scalar-input
    (mixture of logistics) and quantized (256-way softmax + ``temperature``,
    reference generate.py:216-231; quantized output is CLASS INDICES —
    mu-law decode downstream, exactly like the scan sampler).

    ``seed_audio [B, T_seed, Cin]`` (scan-sampler convention: raw samples in
    the last axis for scalar input, one-hot classes otherwise) teacher-forces
    the first T_seed steps — the reference generate.py:168-192 wav_seed path.

    Jitted end-to-end: weight packing + lc projection fuse into the same
    program as the kernel (eager packing cost ~0.9 s/call otherwise).
    """
    B = lc.shape[0]
    # bf16 weights by default: measured identical speed to f32 at equal
    # fuse_block, but they halve VMEM so the large fuse blocks (fewer
    # block-boundary stalls) fit.  Exactness tests pin float32 explicitly.
    if weight_dtype is None:
        weight_dtype = jnp.bfloat16
    # Large fuse blocks minimize block-boundary stalls but grow m_rest
    # (~R+(K-2)*2D lanes per layer); with many streams the lc buffers and
    # per-stream histories own the VMEM, so scale K down.
    if fuse_block is None:
        fuse_block = 25 if B <= 2 else 8
    if B > 4:
        # 8 double-buffered f32 lc streams at chunk 64 exceed VMEM
        chunk = min(chunk, 32)
    packed = pack_params(cfg, params, weight_dtype=weight_dtype,
                         fuse_block=fuse_block)
    T = lc.shape[1]
    T_pad = ((T + chunk - 1) // chunk) * chunk
    lc_projs = []
    for b in range(B):
        gc_b = gc[b] if gc is not None else None
        proj = precompute_lc_proj(packed, lc[b], gc_b)
        lc_projs.append(jnp.pad(proj, ((0, T_pad - T), (0, 0))))

    primed = None
    prime_len = 0
    if seed_audio is not None:
        prime_len = seed_audio.shape[1]
        vals = (seed_audio[:, :, 0] if cfg.scalar_input
                else jnp.argmax(seed_audio, axis=-1).astype(jnp.float32))
        primed = jnp.zeros((T_pad, 8), jnp.float32)
        primed = primed.at[:prime_len, :B].set(jnp.transpose(vals))
    seed = jnp.stack([jax.random.randint(rng, (), 0, 2 ** 31 - 1),
                      jnp.int32(prime_len)]).astype(jnp.int32)
    samples = pallas_generate(cfg, packed, tuple(lc_projs), seed,
                              chunk=chunk, deterministic=deterministic,
                              fuse_block=fuse_block, primed=primed,
                              temperature=jnp.float32(temperature))
    return samples[:, :T]

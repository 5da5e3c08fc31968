#!/usr/bin/env python
"""Train-step throughput benchmark for the perf config knobs.

Times one jitted train step (realistic shapes) for Tacotron and WaveNet under
the perf knobs — compute_dtype (bf16), fused_rnn, scan_unroll — and prints one
JSON line per variant.  Run on the real TPU chip with the chip otherwise idle
(CLAUDE.md: one process at a time; compile RPCs serialize).

Usage: python scripts/bench_train_step.py [--model tacotron|wavenet|both]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tacotron_wavenet_vocoder_korean_tpu.config import Config
from tacotron_wavenet_vocoder_korean_tpu.utils.misc import (
    enable_compilation_cache)


def _sync(x):
    # axon backend: block_until_ready returns early; host transfer syncs
    return float(jnp.sum(x[1]["loss"] if isinstance(x, tuple) else x))


def _time_step(step, state, batch, rng=None, iters=12):
    args = (state, batch) if rng is None else (state, batch, rng)
    state, metrics = step(*args)                      # compile
    _sync((state, metrics))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, metrics = step(*((state,) + args[1:]))
        _sync((state, metrics))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), state


def bench_tacotron(variants, B=32, T_in=128, T_out=400, iters=12):
    from tacotron_wavenet_vocoder_korean_tpu.train.tacotron_task import (
        TacotronTask, batch_to_dict)
    from tacotron_wavenet_vocoder_korean_tpu.data.loader import TacotronBatch

    rng = np.random.RandomState(0)
    batch = TacotronBatch(
        inputs=rng.randint(2, 70, size=(B, T_in)).astype(np.int32),
        input_lengths=np.full((B,), T_in, np.int32),
        loss_coeff=np.ones((B,), np.float32),
        mel_targets=(rng.randn(B, T_out, 80) * 0.1).astype(np.float32),
        linear_targets=(rng.randn(B, T_out, 1025) * 0.1).astype(np.float32),
        speaker_id=np.zeros((B,), np.int32))
    key = jax.random.PRNGKey(0)

    for name, kw in variants:
        cfg = Config(tacotron=dataclasses.replace(
            Config().tacotron, initial_phase_step=0, **kw))
        task = TacotronTask(cfg, is_randomly_initialized=True)
        state = task.init_state(key, batch)
        sec, _ = _time_step(task.jit_train_step(), state,
                            batch_to_dict(batch), key, iters)
        print(json.dumps({
            "bench": "tacotron_train_step", "variant": name,
            "batch_size": B, "t_in": T_in, "t_out_frames": T_out,
            "sec_per_step": round(sec, 4),
            "examples_per_sec": round(B / sec, 1)}), flush=True)


def bench_wavenet(variants, B=4, sample_size=9000, iters=12):
    from tacotron_wavenet_vocoder_korean_tpu.train.wavenet_task import (
        WaveNetTask, wavenet_batch_to_dict)
    from tacotron_wavenet_vocoder_korean_tpu.data.loader import WaveNetBatch

    rng = np.random.RandomState(0)
    base = Config()
    hop = base.audio.hop_size
    batch = WaveNetBatch(
        input_wav=(rng.randn(B, sample_size, 1) * 0.1).astype(np.float32),
        local_condition=rng.randn(
            B, sample_size // hop, base.audio.num_mels).astype(np.float32),
        speaker_id=np.zeros((B,), np.int32))
    key = jax.random.PRNGKey(0)

    for name, kw in variants:
        cfg = Config(wavenet=dataclasses.replace(Config().wavenet, **kw))
        task = WaveNetTask(cfg)
        state = task.init_state(key, batch)
        sec, _ = _time_step(task.jit_train_step(), state,
                            wavenet_batch_to_dict(batch), iters=iters)
        print(json.dumps({
            "bench": "wavenet_train_step", "variant": name,
            "batch_size": B, "sample_size": sample_size,
            "sec_per_step": round(sec, 4),
            "samples_per_sec": round(B * sample_size / sec, 1)}), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="both",
                   choices=["tacotron", "wavenet", "both"])
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--wavenet_batch", type=int, action="append", default=None,
                   help="wavenet batch size(s) to time (repeatable; default "
                        "4 — campaign sizing: compare 8 vs 16 at "
                        "sample_size 15000 to pick the highest samples/sec)")
    p.add_argument("--sample_size", type=int, default=9000)
    from tacotron_wavenet_vocoder_korean_tpu.utils.misc import (
        add_platform_arg, set_platform)
    add_platform_arg(p)
    args = p.parse_args()
    set_platform(args.platform)
    enable_compilation_cache()

    if args.model in ("tacotron", "both"):
        bench_tacotron([
            ("f32", {}),
            ("bf16", {"compute_dtype": "bfloat16"}),
            ("fused", {"fused_rnn": True}),
            ("unroll8", {"scan_unroll": 8}),
            ("fused_unroll8", {"fused_rnn": True, "scan_unroll": 8}),
            ("bf16_fused_unroll8", {"compute_dtype": "bfloat16",
                                    "fused_rnn": True, "scan_unroll": 8}),
        ], iters=args.iters)
    if args.model in ("wavenet", "both"):
        for B in (args.wavenet_batch or [4]):
            bench_wavenet([
                ("f32", {}),
                ("bf16", {"compute_dtype": "bfloat16"}),
            ], B=B, sample_size=args.sample_size, iters=args.iters)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Micro-benchmark for the WaveNet Pallas generation kernel.

Sweeps (fuse_block, weight_dtype, batch) on the real chip and prints
samples/s per variant.  Used to pick the production defaults in
ops/wavenet_pallas.py (single-stream latency is the metric that matters:
the serial layer sweep is the bottleneck, reference generate.py:202-233).

Usage: python scripts/bench_gen_kernel.py [--frames 80] [--repeats 3]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tacotron_wavenet_vocoder_korean_tpu.config import Config
from tacotron_wavenet_vocoder_korean_tpu.models.wavenet import (
    WaveNet, Upsampler)
from tacotron_wavenet_vocoder_korean_tpu.ops.wavenet_pallas import (
    pallas_incremental_generate)
from tacotron_wavenet_vocoder_korean_tpu.utils.misc import (
    enable_compilation_cache)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=80)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--batches", type=int, nargs="+", default=[1, 8])
    p.add_argument("--fuse", type=int, nargs="+", default=[1, 5, 8, 10])
    p.add_argument("--dtypes", nargs="+", default=["float32", "bfloat16"])
    p.add_argument("--ablate", default="",
                   help="comma list: gates,hist_read,hist_store,old_taps,tail"
                        " (perf diagnosis; output is garbage)")
    args = p.parse_args()
    if args.ablate:
        os.environ["TWVK_ABLATE"] = args.ablate
        print(f"ABLATED: {args.ablate}", flush=True)

    enable_compilation_cache()
    cfg = Config()
    w = cfg.wavenet
    hop = cfg.audio.hop_size
    rng = jax.random.PRNGKey(0)

    frames = args.frames
    audio = jnp.zeros((1, frames * hop, 1), jnp.float32)
    mel = jax.random.normal(rng, (1, frames, cfg.audio.num_mels))
    model = WaveNet(w)
    params = model.init(rng, audio, mel)["params"]
    lc1 = Upsampler(w).apply({"params": params["upsampler"]}, mel)

    def sync(x):  # axon block_until_ready returns early; host transfer syncs
        return float(jnp.sum(x))

    for B in args.batches:
        lc = jnp.concatenate([lc1] * B, axis=0)
        for dt_name in args.dtypes:
            dt = getattr(jnp, dt_name)
            for fb in args.fuse:
                try:
                    out = pallas_incremental_generate(
                        w, params, lc, rng, weight_dtype=dt, fuse_block=fb)
                    sync(out)
                    best = float("inf")
                    for _ in range(args.repeats):
                        t0 = time.perf_counter()
                        sync(pallas_incremental_generate(
                            w, params, lc, rng, weight_dtype=dt,
                            fuse_block=fb))
                        best = min(best, time.perf_counter() - t0)
                    sps = out.shape[0] * out.shape[1] / best
                    print(f"B={B} dtype={dt_name:9s} fuse={fb:3d}: "
                          f"{sps:10.0f} samples/s aggregate "
                          f"({sps / B / 24000:.2f}x realtime per stream)",
                          flush=True)
                except Exception as e:
                    print(f"B={B} dtype={dt_name:9s} fuse={fb:3d}: "
                          f"FAILED {type(e).__name__}: {str(e)[:200]}",
                          flush=True)


if __name__ == "__main__":
    main()

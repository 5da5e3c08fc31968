#!/usr/bin/env python
"""Benchmark: WaveNet on-device sampling rate + Tacotron decode RTF.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: WaveNet autoregressive sampling throughput per chip (the
reference's latency-critical path: 1 sess.run per sample, CPU-pinned,
reference generate.py:117,202-233 — far below realtime).  vs_baseline is the
realtime factor (value / 24000 samples-per-second); >1.0 beats realtime.
Extras report Tacotron mel-decode RTF (north star < 0.05).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def bench_wavenet(n_frames: int = 80, repeats: int = 3) -> dict:
    from tacotron_wavenet_vocoder_korean_tpu.config import Config
    from tacotron_wavenet_vocoder_korean_tpu.models.wavenet import (
        WaveNet, Upsampler, incremental_generate)
    from tacotron_wavenet_vocoder_korean_tpu.ops.wavenet_pallas import (
        pallas_incremental_generate)

    cfg = Config()
    w = cfg.wavenet
    hop = cfg.audio.hop_size
    rng = jax.random.PRNGKey(0)

    # Full-size model, random params (throughput is weight-independent).
    frames = n_frames
    audio = jnp.zeros((1, frames * hop, 1), jnp.float32)
    mel = jax.random.normal(rng, (1, frames, cfg.audio.num_mels))
    model = WaveNet(w)
    variables = model.init(rng, audio, mel)
    params = variables["params"]

    use_pallas = jax.default_backend() != "cpu"

    @jax.jit
    def gen(params, mel, rng):
        lc = Upsampler(w).apply({"params": params["upsampler"]}, mel)
        if use_pallas:
            return pallas_incremental_generate(w, params, lc, rng)
        return incremental_generate(w, params, lc, rng)

    # NOTE: on the axon tunnel block_until_ready returns early; a host
    # transfer of a scalar is the only reliable sync.
    def sync(x):
        return float(jnp.sum(x))

    out = gen(params, mel, rng)
    sync(out)                         # compile + settle
    n_samples = out.shape[1]

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(gen(params, mel, rng))
        best = min(best, time.perf_counter() - t0)
    sps = n_samples / best

    # Aggregate throughput: 8 streams share the weight-resident kernel.
    agg_sps = None
    if use_pallas:
        mel8 = jax.random.normal(rng, (8, frames, cfg.audio.num_mels))
        out8 = gen(params, mel8, rng)
        sync(out8)
        best8 = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            sync(gen(params, mel8, rng))
            best8 = min(best8, time.perf_counter() - t0)
        agg_sps = out8.shape[0] * out8.shape[1] / best8

    return {"samples_per_sec": sps, "gen_seconds": best,
            "n_samples": n_samples,
            "aggregate_samples_per_sec": agg_sps,
            "realtime_factor": sps / cfg.audio.sample_rate}


def bench_tacotron(repeats: int = 3) -> dict:
    import dataclasses
    from tacotron_wavenet_vocoder_korean_tpu.config import Config
    from tacotron_wavenet_vocoder_korean_tpu.models.tacotron import Tacotron

    cfg = Config()
    # fast-inference knobs: fused GRU kernels + unrolled decoder scan
    # (outputs identical to the defaults; checkpoints convert exactly via
    # models.modules.fuse_gru_params / Synthesizer.load(fused_rnn=True))
    taco_cfg = dataclasses.replace(cfg.tacotron, fused_rnn=True,
                                   scan_unroll=8)
    model = Tacotron(cfg=taco_cfg, audio=cfg.audio)
    B, T_in, max_iters = 1, 96, 200
    rng = jax.random.PRNGKey(0)
    inputs = jnp.ones((B, T_in), jnp.int32)
    lengths = jnp.full((B,), T_in, jnp.int32)
    variables = model.init(
        {"params": rng, "dropout": rng}, inputs, lengths,
        speaker_id=jnp.zeros((B,), jnp.int32),
        mel_targets=jnp.zeros((B, 5 * 4, 80)), train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    @jax.jit
    def decode(variables, inputs, lengths):
        out = model.apply(variables, inputs, lengths,
                          speaker_id=jnp.zeros((B,), jnp.int32),
                          train=False, free_run=True, max_iters=max_iters)
        return out["mel_outputs"]

    def sync(x):
        return float(jnp.sum(x))

    out = decode(variables, inputs, lengths)
    sync(out)
    n_frames = out.shape[1]

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(decode(variables, inputs, lengths))
        best = min(best, time.perf_counter() - t0)

    frame_shift_s = cfg.audio.hop_size / cfg.audio.sample_rate
    audio_seconds = n_frames * frame_shift_s
    return {"mel_frames_per_sec": n_frames / best,
            "decode_seconds": best,
            "rtf": best / audio_seconds}


def bench_wavenet_quantized(n_frames: int = 80, repeats: int = 3) -> dict:
    """Quantized (mulaw-quantize, 256-way softmax) generation at kernel
    speed — the reference treats this path as first-class
    (wavenet/model.py:225-244)."""
    import dataclasses
    from tacotron_wavenet_vocoder_korean_tpu.config import Config
    from tacotron_wavenet_vocoder_korean_tpu.models.wavenet import (
        WaveNet, Upsampler, incremental_generate)
    from tacotron_wavenet_vocoder_korean_tpu.ops.wavenet_pallas import (
        pallas_incremental_generate)

    cfg = Config()
    w = dataclasses.replace(cfg.wavenet, input_type="mulaw-quantize",
                            scalar_input=False, out_channels=256)
    hop = cfg.audio.hop_size
    rng = jax.random.PRNGKey(0)
    audio = jnp.zeros((1, n_frames * hop, 1), jnp.float32)
    mel = jax.random.normal(rng, (1, n_frames, cfg.audio.num_mels))
    params = WaveNet(w).init(rng, audio, mel)["params"]
    use_pallas = jax.default_backend() != "cpu"

    @jax.jit
    def gen(params, mel, rng):
        lc = Upsampler(w).apply({"params": params["upsampler"]}, mel)
        if use_pallas:
            return pallas_incremental_generate(w, params, lc, rng)
        return incremental_generate(w, params, lc, rng)

    def sync(x):
        return float(jnp.sum(x))

    out = gen(params, mel, rng)
    sync(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(gen(params, mel, rng))
        best = min(best, time.perf_counter() - t0)
    sps = out.shape[1] / best
    return {"samples_per_sec": sps,
            "realtime_factor": sps / cfg.audio.sample_rate}


def bench_train_steps(repeats: int = 5) -> dict:
    """Training throughput at the documented campaign shapes (same configs
    and shapes as scripts/bench_train_step.py, so compiles hit the
    persistent cache): Tacotron B=32/T_in=128/T_out=400 with the fast knobs
    (bf16 + fused_rnn + unroll8), WaveNet f32 B=4/sample_size=9000."""
    import dataclasses
    from tacotron_wavenet_vocoder_korean_tpu.config import Config
    from tacotron_wavenet_vocoder_korean_tpu.train.tacotron_task import (
        TacotronTask, batch_to_dict)
    from tacotron_wavenet_vocoder_korean_tpu.train.wavenet_task import (
        WaveNetTask, wavenet_batch_to_dict)
    from tacotron_wavenet_vocoder_korean_tpu.data.loader import (
        TacotronBatch, WaveNetBatch)

    def sync(state, metrics):
        return float(jnp.sum(metrics["loss"]))

    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)

    # Tacotron
    B, T_in, T_out = 32, 128, 400
    batch = TacotronBatch(
        inputs=rng.randint(2, 70, size=(B, T_in)).astype(np.int32),
        input_lengths=np.full((B,), T_in, np.int32),
        loss_coeff=np.ones((B,), np.float32),
        mel_targets=(rng.randn(B, T_out, 80) * 0.1).astype(np.float32),
        linear_targets=(rng.randn(B, T_out, 1025) * 0.1).astype(np.float32),
        speaker_id=np.zeros((B,), np.int32))
    cfg = Config(tacotron=dataclasses.replace(
        Config().tacotron, initial_phase_step=0, compute_dtype="bfloat16",
        fused_rnn=True, scan_unroll=8))
    task = TacotronTask(cfg, is_randomly_initialized=True)
    state = task.init_state(key, batch)
    step = task.jit_train_step()
    d = batch_to_dict(batch)
    state, metrics = step(state, d, key)
    sync(state, metrics)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, metrics = step(state, d, key)
        sync(state, metrics)
        times.append(time.perf_counter() - t0)
    taco_sec = float(np.median(times))

    # WaveNet
    Bw, sample_size = 4, 9000
    cfg = Config()
    hop = cfg.audio.hop_size
    wbatch = WaveNetBatch(
        input_wav=(rng.randn(Bw, sample_size, 1) * 0.1).astype(np.float32),
        local_condition=rng.randn(
            Bw, sample_size // hop, cfg.audio.num_mels).astype(np.float32),
        speaker_id=np.zeros((Bw,), np.int32))
    wtask = WaveNetTask(cfg)
    wstate = wtask.init_state(key, wbatch)
    wstep = wtask.jit_train_step()
    wd = wavenet_batch_to_dict(wbatch)
    wstate, wmetrics = wstep(wstate, wd)
    sync(wstate, wmetrics)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        wstate, wmetrics = wstep(wstate, wd)
        sync(wstate, wmetrics)
        times.append(time.perf_counter() - t0)
    wn_sec = float(np.median(times))

    return {
        "tacotron_sec_per_step": taco_sec,
        "tacotron_examples_per_sec": B / taco_sec,
        "wavenet_sec_per_step": wn_sec,
        "wavenet_train_samples_per_sec": Bw * sample_size / wn_sec,
    }


from tacotron_wavenet_vocoder_korean_tpu.utils.misc import (
    enable_compilation_cache)


def _arm_deadline(seconds: float):
    """Print an honest failure JSON line and exit if the bench can't finish.

    The tunneled chip can wedge (lost RPC blocks compute in native code
    indefinitely, see train/watchdog.py); without this the bench would hang
    its caller forever.  os._exit because the main thread may be stuck in
    native code."""
    import threading

    def fire():
        print(json.dumps({
            "metric": "wavenet_samples_per_sec_per_chip", "value": 0,
            "unit": "samples/s", "vs_baseline": 0.0,
            "error": f"bench exceeded {seconds:.0f}s deadline "
                     f"(device wedged or unavailable)"}), flush=True)
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    deadline = _arm_deadline(float(os.environ.get("BENCH_DEADLINE_S", 1800)))
    enable_compilation_cache()
    wn = bench_wavenet()
    taco = bench_tacotron()
    wnq = bench_wavenet_quantized()
    train = bench_train_steps()
    result = {
        "metric": "wavenet_samples_per_sec_per_chip",
        "value": round(wn["samples_per_sec"], 1),
        "unit": "samples/s",
        # realtime factor vs the 24 kHz realtime bar (the reference's CPU
        # per-sample loop is far below 1.0)
        "vs_baseline": round(wn["realtime_factor"], 4),
        "wavenet_gen_seconds": round(wn["gen_seconds"], 3),
        "wavenet_n_samples": wn["n_samples"],
        "wavenet_aggregate_samples_per_sec_8stream": (
            round(wn["aggregate_samples_per_sec"], 1)
            if wn["aggregate_samples_per_sec"] else None),
        "tacotron_mel_frames_per_sec": round(taco["mel_frames_per_sec"], 1),
        "tacotron_decode_rtf": round(taco["rtf"], 5),
        # quantized (mulaw-quantize/softmax) generation at kernel speed
        "wavenet_quantized_samples_per_sec": round(wnq["samples_per_sec"], 1),
        "wavenet_quantized_realtime_factor": round(
            wnq["realtime_factor"], 3),
        # training throughput at the documented campaign shapes
        "tacotron_train_sec_per_step_B32": round(
            train["tacotron_sec_per_step"], 4),
        "tacotron_train_examples_per_sec": round(
            train["tacotron_examples_per_sec"], 1),
        "wavenet_train_sec_per_step_B4_9k": round(
            train["wavenet_sec_per_step"], 4),
        "wavenet_train_samples_per_sec": round(
            train["wavenet_train_samples_per_sec"], 1),
    }
    # Cancel BEFORE printing: a near-deadline success must not race the
    # timer into emitting a second JSON line + exit 3 during teardown.
    deadline.cancel()
    print(json.dumps(result))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Tacotron training driver (reference: train_tacotron.py:110-306).

Example:
    python train_tacotron.py --data_paths workdir/moon/data --log_dir logs/moon
Multi-speaker:
    python train_tacotron.py --data_paths workdir/moon/data,workdir/son/data
"""
import argparse
import json
import os
import sys
import time
import traceback
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

from tacotron_wavenet_vocoder_korean_tpu.config import (
    Config, overlay, overlay_from_strings, split_overrides,
    debug_string)
from tacotron_wavenet_vocoder_korean_tpu.data import (
    TacotronBatcher, DevicePrefetcher)
from tacotron_wavenet_vocoder_korean_tpu.train import (
    TacotronTask, CheckpointManager, prepare_run_dir, load_run_config,
    restore_into_state, batch_to_dict)
from tacotron_wavenet_vocoder_korean_tpu.parallel import (
    make_mesh, shard_batch)
from tacotron_wavenet_vocoder_korean_tpu.utils.profiling import (
    maybe_trace_step)
from tacotron_wavenet_vocoder_korean_tpu.utils.compile_lock import (
    COMPILE_LOCK)
from tacotron_wavenet_vocoder_korean_tpu.train.watchdog import (
    HangWatchdog, SlowdownWatchdog, exec_restart, maybe_exec_restart)
from tacotron_wavenet_vocoder_korean_tpu.utils import (
    infolog_init, log, ValueWindow, plot)
from tacotron_wavenet_vocoder_korean_tpu import dsp
from tacotron_wavenet_vocoder_korean_tpu.text import sequence_to_text


class MetricsWriter:
    """JSONL scalar log (stands in for tf.summary; tail-able + plottable)."""

    def __init__(self, path: str):
        self._f = open(path, "a", encoding="utf-8")

    def write(self, step: int, metrics: dict):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()
                    if np.ndim(v) == 0})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()


def save_and_plot(log_dir: str, step: int, eval_out, batch, cfg):
    """Dump alignment PNG + Griffin-Lim wav for the first test example
    (reference train_tacotron.py:84-107,229-248)."""
    idx = 0
    linear = np.asarray(eval_out["linear_outputs"])[idx]
    align = np.asarray(eval_out["alignments"])[idx]
    tokens = np.asarray(batch["inputs"])[idx]
    length = int(np.asarray(batch["input_lengths"])[idx])

    # linear is [frames, num_freq]; the DSP expects [num_freq, frames]
    wav = np.asarray(dsp.inv_linear_spectrogram(linear.T, cfg.audio))
    wav_path = os.path.join(log_dir, f"step-{step}-audio.wav")
    dsp.save_wav(wav, wav_path, cfg.audio.sample_rate)

    chars = [sequence_to_text([t]) for t in tokens[:length]]
    png_path = os.path.join(log_dir, f"step-{step}-align.png")
    plot.plot_alignment(align[:length], png_path,
                        info=f"step={step}, loss={float(eval_out['loss']):.5f}",
                        text=chars)
    log(f"  saved {wav_path} and {png_path}")


def check_text_roundtrip(data_paths, cleaners: str, max_logged: int = 10):
    """Startup validation: re-decode every training text and log mismatches
    (reference train_tacotron.py:31-44 create_batch_inputs_from_texts).

    encode->decode should reproduce the jamo decomposition of the normalized
    text; a mismatch means the symbol table dropped characters (out-of-table
    symbols), which would silently train on corrupted transcripts."""
    from tacotron_wavenet_vocoder_korean_tpu.text import TextCodec, PAD, EOS
    from tacotron_wavenet_vocoder_korean_tpu.text.hangul import hangul_to_jamo
    from tacotron_wavenet_vocoder_korean_tpu.text.cleaners import get_cleaner

    codec = TextCodec(cleaners)
    clean_fns = [get_cleaner(n) for n in codec.cleaner_names]
    n_bad = total = 0
    for d in data_paths:
        train_txt = os.path.join(d, "train.txt")
        if not os.path.exists(train_txt):
            continue
        with open(train_txt, encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip("\n").split("|")
                if len(parts) < 4:
                    continue
                text = parts[3]
                total += 1
                cleaned = text
                for fn in clean_fns:
                    cleaned = fn(cleaned)
                # the cleaner emits jamo tokens incl. the trailing EOS '~';
                # decode(skip_eos_and_pad) drops EOS/PAD, so drop them here too
                expected = "".join(s for s in hangul_to_jamo(cleaned)
                                   if s not in (PAD, EOS))
                recovered = codec.decode(codec.encode(text),
                                         skip_eos_and_pad=True)
                if recovered != expected:
                    n_bad += 1
                    if n_bad <= max_logged:
                        log(f"  text round-trip mismatch [{d}]: {text!r}")
                        log(f"    recovered: {recovered!r}")
    log(f"text round-trip check: {total - n_bad}/{total} texts exact")
    return n_bad


def train(args):
    cfg = Config()
    if args.load_path:
        cfg = load_run_config(args.load_path)
    num_speakers = len(args.data_paths)
    cfg = overlay(cfg, tacotron={
        "num_speakers": num_speakers,
        "batch_size": args.batch_size or cfg.tacotron.batch_size,
        **({"model_type": args.model_type} if args.model_type else {}),
    })
    if args.max_host_rss_gb is not None:
        cfg = overlay(cfg, train={"max_host_rss_gb": args.max_host_rss_gb})
    # Persist the split-defining flag into the run config: resumes and
    # quality_eval reconstruct the held-out split from params.json, so a
    # flag that only lived in argv would let a resume silently train on
    # previously-held-out clips.  CLI can only turn it ON; a resumed run
    # keeps the recorded value.
    if args.skip_path_filter:
        cfg = overlay(cfg, train={"skip_path_filter": True})
    if args.hparams:
        cfg = overlay_from_strings(cfg, split_overrides(args.hparams))

    log_dir = args.log_dir or os.path.join(
        "logs", datetime.now().strftime("tacotron_%Y-%m-%d_%H-%M-%S"))
    prepare_run_dir(log_dir, cfg)
    stop_path = os.path.join(log_dir, "STOP")
    if os.path.exists(stop_path):   # stale stop request from a prior run
        os.remove(stop_path)
    infolog_init(os.path.join(log_dir, "train.log"),
                 os.path.basename(log_dir), args.slack_url)
    log(debug_string(cfg))
    # Armed BEFORE any device work: init-phase RPCs (store
    # upload, init_state, restore) can wedge exactly like a
    # train step and must also trigger recovery.
    hang_dog = HangWatchdog(cfg.train.hang_timeout_s, log_fn=log,
                            first_timeout_s=cfg.train.first_hang_timeout_s)

    mesh = make_mesh() if args.use_mesh else None
    if mesh is not None:
        log(f"mesh: {mesh.devices.shape} over {mesh.axis_names}")

    # The corpus store works under a mesh too: example dim sharded over the
    # data axis, batch gathers become ICI collectives (parity with the
    # single-chip fast path — no fallback to host transfers).
    use_store = cfg.train.device_resident_data
    # the filter choice was persisted into cfg above; the batcher derives
    # apply_filter from cfg.train.skip_path_filter
    train_batcher = TacotronBatcher(args.data_paths, cfg, "train",
                                    device_store=use_store, mesh=mesh)
    if use_store:
        log(f"device-resident corpus store: "
            f"{train_batcher.store_bytes / 1e6:.0f} MB on device"
            + (" (sharded over the data axis)" if mesh else ""))
    test_batcher = TacotronBatcher(args.data_paths, cfg, "test")

    # Startup transcript validation (reference train_tacotron.py:31-44):
    # any text whose encode->decode round-trip drops symbols is logged.
    check_text_roundtrip(args.data_paths, cfg.tacotron.cleaners)

    # Vocab size follows the cleaner-selected symbol table (Korean 80,
    # English 65) — the Synthesizer builds from codec.vocab_size, so the
    # trainer must too or English checkpoints would restore into a
    # mismatched embedding (reference keeps one mutable global table,
    # text/symbols.py:14-16).
    from tacotron_wavenet_vocoder_korean_tpu.text import TextCodec
    vocab_size = TextCodec(cfg.tacotron.cleaners).vocab_size
    task = TacotronTask(cfg, vocab_size=vocab_size,
                        is_randomly_initialized=not args.initialize_path)
    rng = jax.random.PRNGKey(cfg.train.random_seed)

    first_batch = next(iter(train_batcher))
    # resuming runs restore into an eval_shape skeleton — the eager
    # on-device init pays per-op tunnel round-trips and its values
    # would be discarded by the restore anyway
    if args.load_path or args.initialize_path:
        state = task.abstract_state(rng, first_batch)
    else:
        state = task.init_state(rng, first_batch)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(state.params))
    log(f"Initialized Tacotron: {n_params:,} params, "
        f"{num_speakers} speaker(s), model_type={cfg.tacotron.model_type}")

    state, start_step = restore_into_state(state, args.load_path,
                                           args.initialize_path)
    if start_step:
        log(f"Resuming from step {start_step}")
    train_batcher.step = start_step

    ckpt = CheckpointManager(log_dir, max_to_keep=cfg.train.max_checkpoints)
    metrics_writer = MetricsWriter(os.path.join(log_dir, "metrics.jsonl"))

    step_fn = task.jit_train_step(mesh)
    eval_fn = task.jit_eval_step()

    # Best-heldout checkpoint retention (cfg.train.best_eval_batches): the
    # reference keeps EVERY checkpoint so the best can be picked post-hoc
    # (max_to_keep=None, reference train_tacotron.py:165); we instead score
    # fixed heldout batches with the free-running eval model every
    # test_interval and keep the argmin under <log_dir>/best/ — a loadable
    # run dir (params.json + ckpt/<step>).  Survives resumes via best.json.
    best_mgr, fixed_eval_batches, best_json = None, [], None
    if cfg.train.best_eval_batches > 0:
        best_dir = os.path.join(log_dir, "best")
        prepare_run_dir(best_dir, cfg)
        best_mgr = CheckpointManager(best_dir, max_to_keep=1)
        best_json = os.path.join(best_dir, "best.json")
        fixed_iter = iter(TacotronBatcher(args.data_paths, cfg, "test"))
        fixed_eval_batches = [batch_to_dict(next(fixed_iter))
                              for _ in range(cfg.train.best_eval_batches)]
    best_eval_loss = float("inf")
    if best_json and os.path.exists(best_json):
        with open(best_json, encoding="utf-8") as f:
            prev = json.load(f)
        best_eval_loss = float(prev.get("eval_loss", float("inf")))
        log(f"best-checkpoint tracker resumed: step {prev.get('step')} "
            f"eval_loss {best_eval_loss:.5f}")

    tdt = cfg.train.transfer_dtype
    if use_store:
        put = lambda b: b          # batches are already device dicts
    elif mesh:
        put = lambda b: shard_batch(mesh, batch_to_dict(b, tdt))
    else:
        put = lambda b: batch_to_dict(b, tdt)
    feeder = DevicePrefetcher(train_batcher, put_fn=put)
    test_iter = iter(test_batcher)
    log("feeder started; entering train loop")

    time_window, loss_window = ValueWindow(100), ValueWindow(100)
    slow_dog = SlowdownWatchdog(cfg.train.restart_slowdown_ratio)
    step = start_step
    # Shape buckets already dispatched in THIS process.  With the
    # persistent compile cache disabled on axon, every bucket's first
    # dispatch after a restart first-compiles (~minutes on a slow-backend
    # day) — extend the watchdog's grace window around those so a
    # legitimate mid-run compile can't trip the steady-state timeout
    # (ADVICE r4; the first-beat-only grace left later buckets exposed).
    seen_buckets = set()

    def note_bucket(kind, b):
        key = (kind,) + tuple(
            (k, tuple(v.shape)) for k, v in sorted(b.items())
            if hasattr(v, "shape"))
        if key not in seen_buckets:
            seen_buckets.add(key)
            hang_dog.expect_compile()
    # Pipelined dispatch: fetching loss to host every step costs a full
    # RPC round trip on the tunneled chip (~100ms) and serializes
    # dispatch with compute.  Only sync at the log cadence; in between,
    # steps queue on the device and the host races ahead.
    sync_every = cfg.train.sync_every
    t_sync, steps_since_sync = time.time(), 0
    try:
        for batch in feeder:
            # opt-in device tracing (reference train_vocoder.py:158-167).
            # COMPILE_LOCK: a new (token,frame) bucket first-compiles here
            # while the DevicePrefetcher thread may first-compile a gather
            # for the NEXT bucket — concurrent first-jit deadlocks on this
            # backend, so both sides serialize on the shared lock (cheap
            # once compiled: uncontended acquire per dispatch).
            if steps_since_sync == 0 and step == start_step:
                # init-phase hang forensics: the three RPCs most likely to
                # wedge after a resume are (a) the feeder's first gather,
                # (b) the first train-step compile, (c) the first fetch.
                # One log line before each makes a HangWatchdog postmortem
                # attributable (observed: two 20-min wedges after
                # "Resuming from step 90000" with no further output).
                log("first batch received; dispatching first train step")
            note_bucket("train", batch)
            with maybe_trace_step(step, log_dir, cfg.train.store_metadata):
                with COMPILE_LOCK:
                    state, metrics = step_fn(state, batch, rng)
            if step == start_step:
                log("first train step dispatched; fetching loss")
                log(f"first loss fetched: {float(metrics['loss']):.5f}")
                hang_dog.beat()
            step += 1
            steps_since_sync += 1
            boundary = (step % sync_every == 0
                        or step % cfg.train.summary_interval == 0
                        or step % cfg.train.checkpoint_interval == 0
                        or step % cfg.train.test_interval == 0
                        or (args.num_steps and step >= args.num_steps))
            if not boundary:
                continue
            loss = float(metrics["loss"])   # drains the dispatch queue
            hang_dog.beat()
            now = time.time()
            sec_per_step = (now - t_sync) / steps_since_sync
            time_window.append(sec_per_step)
            slow_restart = slow_dog.update(sec_per_step)
            t_sync, steps_since_sync = now, 0
            loss_window.append(loss)

            if os.path.exists(os.path.join(log_dir, "STOP")):
                # graceful campaign stop: `touch LOG_DIR/STOP` saves a
                # checkpoint and exits 0 so the supervisor stops too
                # (no SIGTERM mid-RPC, which can wedge the chip).
                log(f"STOP file found; saving checkpoint at step {step} "
                    "and exiting cleanly")
                ckpt.save(step, state)
                break

            if step % sync_every == 0:
                log(f"Step {step:7d} [{time_window.average:.3f} sec/step, "
                    f"loss={loss:.5f}, avg_loss={loss_window.average:.5f}]")

            if loss > cfg.train.loss_explosion_threshold or np.isnan(loss):
                log(f"Loss exploded to {loss:.5f} at step {step}!", slack=True)
                raise RuntimeError(f"loss exploded at step {step}")

            if step % cfg.train.summary_interval == 0:
                metrics_writer.write(step, metrics)

            if step % cfg.train.checkpoint_interval == 0:
                log(f"Saving checkpoint at step {step}")
                ckpt.save(step, state)

            if (step % 50 == 0 and step % cfg.train.checkpoint_interval != 0
                    and not (args.num_steps and step >= args.num_steps)):
                # leaky-transfer watchdogs (see train/watchdog.py docstring).
                # Not at a checkpoint boundary: the save-before-exec must not
                # collide with the step ckpt.save just wrote.
                save_fn = lambda: (ckpt.save(step, state), ckpt.close(),
                                   feeder.stop())
                if slow_restart:
                    exec_restart(log_dir, save_fn, log, slow_dog.reason())
                maybe_exec_restart(
                    log_dir, cfg.train.max_host_rss_gb, save_fn, log_fn=log)

            if step % cfg.train.test_interval == 0:
                test_batch = batch_to_dict(next(test_iter))
                note_bucket("eval", test_batch)
                with COMPILE_LOCK:
                    eval_out = eval_fn(state, test_batch)
                log(f"  eval: loss={float(eval_out['loss']):.5f} "
                    f"(train-test gap={float(eval_out['loss']) - loss:+.5f})",
                    slack=True)
                metrics_writer.write(step, {
                    "test_loss": eval_out["loss"],
                    "test_mel_loss": eval_out["mel_loss"],
                    "test_linear_loss": eval_out["linear_loss"],
                    "gap_test_train": float(eval_out["loss"]) - loss,
                })
                save_and_plot(log_dir, step, eval_out, test_batch, cfg)
                if best_mgr is not None:
                    for b in fixed_eval_batches:
                        note_bucket("eval", b)
                    with COMPILE_LOCK:
                        scores = [float(eval_fn(state, b)["loss_without_coeff"])
                                  for b in fixed_eval_batches]
                    hang_dog.beat()
                    fixed_loss = float(np.mean(scores))
                    metrics_writer.write(step, {"best_eval_loss": fixed_loss})
                    if fixed_loss < best_eval_loss:
                        best_eval_loss = fixed_loss
                        log(f"  new best heldout eval loss {fixed_loss:.5f}; "
                            f"retaining checkpoint at step {step}")
                        best_mgr.save(step, state)
                        with open(best_json, "w", encoding="utf-8") as f:
                            json.dump({"step": step,
                                       "eval_loss": fixed_loss}, f)

            if args.num_steps and step >= args.num_steps:
                log(f"Reached num_steps={args.num_steps}; saving and exiting")
                ckpt.save(step, state)
                break
    except KeyboardInterrupt:
        log("Interrupted; saving checkpoint")
        ckpt.save(step, state)
    except Exception:
        traceback.print_exc()
        raise
    finally:
        feeder.stop()
        ckpt.close()
        if best_mgr is not None:
            best_mgr.close()
        hang_dog.stop()


from tacotron_wavenet_vocoder_korean_tpu.utils.misc import (
    enable_compilation_cache, add_platform_arg, set_platform)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_paths", type=lambda s: s.split(","), required=True)
    p.add_argument("--log_dir", default=None)
    p.add_argument("--load_path", default=None,
                   help="resume run dir (keeps global step)")
    p.add_argument("--initialize_path", default=None,
                   help="warm-start weights from run dir (step reset to 0)")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--num_steps", type=int, default=None)
    p.add_argument("--model_type", default=None,
                   choices=[None, "single", "simple", "deepvoice"])
    p.add_argument("--skip_path_filter", action="store_true")
    p.add_argument("--hparams", default=None,
                   help="comma-separated group.key=value config overrides "
                        "(e.g. tacotron.fused_rnn=True,"
                        "train.num_test_per_speaker=20)")
    p.add_argument("--use_mesh", action="store_true",
                   help="shard the batch over all visible devices")
    p.add_argument("--slack_url", default=None)
    add_platform_arg(p)
    p.add_argument("--max_host_rss_gb", type=float, default=None,
                   help="override train.max_host_rss_gb watchdog limit")
    args = p.parse_args()
    set_platform(args.platform)
    enable_compilation_cache()  # after set_platform: gate needs the real platform
    if args.load_path and args.initialize_path:
        p.error("--load_path and --initialize_path are mutually exclusive")
    train(args)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""WaveNet vocoder training driver (reference: train_vocoder.py:26-194).

Example:
    python train_vocoder.py --data_dir workdir/moon/data --log_dir logs/wavenet
Multi-speaker (global conditioning):
    python train_vocoder.py --data_dir workdir/moon/data,workdir/son/data
"""
import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

from tacotron_wavenet_vocoder_korean_tpu.config import (
    Config, overlay, overlay_from_strings, split_overrides,
    debug_string)
from tacotron_wavenet_vocoder_korean_tpu.data import (
    WaveNetBatcher, DevicePrefetcher)
from tacotron_wavenet_vocoder_korean_tpu.train.wavenet_task import (
    WaveNetTask, wavenet_batch_to_dict)
from tacotron_wavenet_vocoder_korean_tpu.train import (
    CheckpointManager, prepare_run_dir, load_run_config, restore_into_state)
from tacotron_wavenet_vocoder_korean_tpu.parallel import make_mesh, shard_batch
from tacotron_wavenet_vocoder_korean_tpu.utils.compile_lock import (
    COMPILE_LOCK)
from tacotron_wavenet_vocoder_korean_tpu.train.watchdog import (
    HangWatchdog, SlowdownWatchdog, exec_restart, maybe_exec_restart)
from tacotron_wavenet_vocoder_korean_tpu.utils.profiling import (
    maybe_trace_step)
from tacotron_wavenet_vocoder_korean_tpu.utils import (
    infolog_init, log, ValueWindow)


def train(args):
    cfg = Config()
    if args.load_path:
        cfg = load_run_config(args.load_path)
    gc_enable = len(args.data_dir) > 1
    overrides = {"num_speakers": len(args.data_dir)} if gc_enable else {}
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.num_steps:
        overrides["num_steps"] = args.num_steps
    if args.sample_size:
        overrides["sample_size"] = args.sample_size
    if overrides:
        cfg = overlay(cfg, wavenet=overrides)
    if args.max_host_rss_gb is not None:
        cfg = overlay(cfg, train={"max_host_rss_gb": args.max_host_rss_gb})
    if args.hparams:
        cfg = overlay_from_strings(cfg, split_overrides(args.hparams))

    log_dir = args.log_dir or os.path.join("logs", "wavenet")
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
    # device store works under a mesh (example dim sharded over data axis)
    use_store = cfg.train.device_resident_data
    batcher = WaveNetBatcher(args.data_dir, cfg, gc_enable=gc_enable,
                             device_store=use_store, mesh=mesh)
    if use_store:
        log(f"device-resident clip store: "
            f"{batcher.store_bytes / 1e6:.0f} MB on device"
            + (" (sharded over the data axis)" if mesh else ""))
    task = WaveNetTask(cfg, gc_enable=gc_enable)
    rng = jax.random.PRNGKey(cfg.train.random_seed)

    first = next(iter(batcher))
    # resuming runs restore into an eval_shape skeleton — the eager
    # on-device init costs ~5 min of per-op tunnel round-trips and its
    # values would be discarded by the restore anyway
    if args.load_path or args.initialize_path:
        state = task.abstract_state(rng, first)
    else:
        state = task.init_state(rng, first)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(state.params))
    log(f"Initialized WaveNet: {n_params:,} params, "
        f"receptive_field={cfg.wavenet.receptive_field} samples, "
        f"gc={'on' if gc_enable else 'off'}")

    state, start_step = restore_into_state(state, args.load_path,
                                           args.initialize_path)
    if start_step:
        log(f"Resuming from step {start_step}")

    ckpt = CheckpointManager(log_dir, max_to_keep=cfg.train.max_checkpoints)
    metrics_path = os.path.join(log_dir, "metrics.jsonl")
    metrics_f = open(metrics_path, "a", encoding="utf-8")

    # Held-out eval stream (teacher-forced loss on unseen clips, EMA params).
    test_batcher = WaveNetBatcher(
        args.data_dir, cfg, gc_enable=gc_enable, data_type="test",
        seed=cfg.train.random_seed + 1, batches_per_group=1)
    test_iter = iter(test_batcher)
    eval_fn = task.jit_eval_step()

    step_fn = task.jit_train_step(mesh)
    if use_store:
        put = lambda b: b          # batches are already device dicts
    elif mesh:
        put = lambda b: shard_batch(mesh, wavenet_batch_to_dict(b))
    else:
        put = lambda b: wavenet_batch_to_dict(b)
    feeder = DevicePrefetcher(batcher, put_fn=put)

    time_window, loss_window = ValueWindow(100), ValueWindow(100)
    slow_dog = SlowdownWatchdog(cfg.train.restart_slowdown_ratio)
    step = start_step
    checkpoint_interval = 1000  # reference train_vocoder.py:50
    # Pipelined dispatch: a per-step loss fetch costs a full RPC round
    # trip on the tunneled chip (~100ms) and serializes dispatch with
    # compute.  Sync only at the log cadence; between syncs the host
    # races ahead and steps queue on the device.
    sync_every = cfg.train.sync_every
    t_sync, steps_since_sync = time.time(), 0
    try:
        for batch in feeder:
            # opt-in device tracing (reference train_vocoder.py:158-167).
            # COMPILE_LOCK: serialize this step's possible first-jit against
            # the DevicePrefetcher thread's gather compiles (concurrent
            # first-jit deadlocks on this backend; uncontended once warm).
            if step == start_step and steps_since_sync == 0:
                # init-phase hang forensics (mirrors train_tacotron.py): one
                # line before the first gather/compile/fetch RPCs makes a
                # HangWatchdog postmortem attributable to a phase.
                log("first batch received; dispatching first train step")
            with maybe_trace_step(step, log_dir, cfg.train.store_metadata):
                with COMPILE_LOCK:
                    state, metrics = step_fn(state, batch)
            if step == start_step:
                log("first train step dispatched; fetching loss")
                log(f"first loss fetched: {float(metrics['loss']):.5f}")
                # end the first-beat grace at the first COMPLETED step, not
                # at the first sync boundary ~sync_every steps later
                hang_dog.beat()
            step += 1
            steps_since_sync += 1
            boundary = (step % sync_every == 0
                        or step % cfg.train.summary_interval == 0
                        or step % cfg.train.test_interval == 0
                        or step % checkpoint_interval == 0
                        or step >= cfg.wavenet.num_steps)
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

            if np.isnan(loss):
                log(f"NaN loss at step {step}; aborting", slack=True)
                raise RuntimeError("loss is NaN")

            if step % cfg.train.summary_interval == 0:
                metrics_f.write(json.dumps(
                    {"step": step,
                     **{k: float(v) for k, v in metrics.items()
                        if np.ndim(v) == 0}}) + "\n")
                metrics_f.flush()

            if step % cfg.train.test_interval == 0:
                with COMPILE_LOCK:
                    eval_out = eval_fn(
                        state, wavenet_batch_to_dict(next(test_iter)))
                test_loss = float(eval_out["loss"])
                log(f"  eval: test_loss={test_loss:.5f} "
                    f"(train-test gap={test_loss - loss:+.5f})")
                metrics_f.write(json.dumps(
                    {"step": step, "test_loss": test_loss,
                     "gap_test_train": test_loss - loss}) + "\n")
                metrics_f.flush()

            if step % checkpoint_interval == 0:
                log(f"Saving checkpoint at step {step}")
                ckpt.save(step, state)

            if (step % 50 == 0 and step % checkpoint_interval != 0
                    and step < cfg.wavenet.num_steps):
                # leaky-transfer watchdogs (see train/watchdog.py docstring).
                # Not at a checkpoint boundary: the save-before-exec must not
                # collide with the step ckpt.save just wrote.
                save_fn = lambda: (ckpt.save(step, state), ckpt.close(),
                                   feeder.stop())
                if slow_restart:
                    exec_restart(log_dir, save_fn, log, slow_dog.reason())
                maybe_exec_restart(
                    log_dir, cfg.train.max_host_rss_gb, save_fn, log_fn=log)

            if step >= cfg.wavenet.num_steps:
                log(f"Reached num_steps={cfg.wavenet.num_steps}; done")
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
        hang_dog.stop()


from tacotron_wavenet_vocoder_korean_tpu.utils.misc import (
    enable_compilation_cache, add_platform_arg, set_platform)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", type=lambda s: s.split(","), required=True)
    p.add_argument("--log_dir", default=None)
    p.add_argument("--load_path", default=None)
    p.add_argument("--initialize_path", default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--num_steps", type=int, default=None)
    p.add_argument("--sample_size", type=int, default=None)
    p.add_argument("--use_mesh", action="store_true")
    p.add_argument("--hparams", default=None,
                   help="comma-separated group.key=value config overrides "
                        "(e.g. wavenet.input_type=mulaw-quantize)")
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

"""Host-RSS watchdog: checkpoint + exec-restart when host memory runs away.

Why this exists: the tunneled TPU client used in this image retains a host
copy of EVERY host->device transfer (measured: exactly one batch-sized chunk
of anon RSS leaked per train step; ``delete()``/``gc`` do not release it).
A multi-hour training run therefore grows without bound and is eventually
OOM-killed by the kernel.  The framework-level recovery (beyond the
reference, which has none — SURVEY.md §5 failure detection): when RSS
crosses a threshold the driver checkpoints, then ``os.execv``s itself with
``--load_path`` so the run resumes at the same global step in a fresh
process.  The persistent XLA compile cache makes the restart cheap.
"""
from __future__ import annotations

import os
import statistics
import sys
import threading
import time
from collections import deque
from typing import Callable, List, Optional


_warned_no_psutil = False


def host_rss_gb() -> float:
    """Resident set size of this process in GB.  Prefers psutil; falls back
    to /proc/self/status VmRSS so the watchdog (which long runs depend on to
    dodge the leak-driven OOM kill) never silently disables itself."""
    try:
        import psutil
        return psutil.Process().memory_info().rss / 1e9
    except Exception:
        pass
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return float(line.split()[1]) * 1024 / 1e9  # kB -> GB
    except Exception:
        pass
    global _warned_no_psutil
    if not _warned_no_psutil:
        _warned_no_psutil = True
        print("WARNING: watchdog cannot read host RSS (no psutil, no "
              "/proc/self/status) — RSS watchdog is DISABLED", file=sys.stderr)
    return 0.0


def restart_argv(log_dir: str) -> List[str]:
    """argv to resume this run: current CLI with ``--load_path=<log_dir>``
    and ``--log_dir=<log_dir>`` pinned, any prior --load_path /
    --initialize_path dropped (warm-start must not repeat after resume)."""
    drop = ("--load_path", "--initialize_path", "--log_dir")
    out: List[str] = [sys.argv[0]]
    skip_next = False
    for a in sys.argv[1:]:
        if skip_next:
            skip_next = False
            continue
        if any(a == d or a.startswith(d + "=") for d in drop):
            skip_next = "=" not in a
            continue
        out.append(a)
    out += ["--log_dir", log_dir, "--load_path", log_dir]
    return [sys.executable] + out


class HangWatchdog:
    """Hard-exit the process when the train loop stops making progress.

    Why this exists: a lost RPC on the tunneled chip blocks the train loop
    (and any checkpoint save) in native code FOREVER — observed in the wild:
    a device->host fetch during a checkpoint save hung >20 min with every
    thread futex-parked, and even KeyboardInterrupt's save hung on the same
    wedged transfer.  The only recovery is for this client to DIE so its
    device lease expires (the chip self-recovers ~10-20 min later) and a
    supervisor restarts from the last checkpoint (<= checkpoint_interval
    steps lost).  The train loop calls :meth:`beat` at every sync boundary;
    a daemon thread calls ``os._exit(EXIT_CODE)`` if no beat arrives within
    ``timeout_s``.  ``os._exit`` is deliberate: the main thread is wedged in
    native code, so exceptions/sys.exit cannot run.  Wrap campaigns in e.g.
    ``until python train_vocoder.py ... --load_path D; do sleep 60; done``.
    """

    EXIT_CODE = 42

    def __init__(self, timeout_s: float,
                 log_fn: Callable[[str], None] = print,
                 first_timeout_s: Optional[float] = None):
        self.timeout_s = timeout_s
        # Grace period before the FIRST beat: a resume pays restore + the
        # full train-step compile + the first result fetch before the loop
        # can beat, and on slow-backend days that legitimately exceeds the
        # steady-state timeout (observed 2026-08-20: two consecutive
        # resumes killed at 1200s mid-compile, each hard-exit re-wedging
        # the chip for ~40 min — a kill loop that never reaches step 1).
        # Only a first_timeout_s larger than timeout_s is meaningful.
        if first_timeout_s and timeout_s and first_timeout_s <= timeout_s:
            log_fn(f"HangWatchdog: ignoring first_timeout_s="
                   f"{first_timeout_s:.0f}s <= steady-state timeout "
                   f"{timeout_s:.0f}s (a grace period only makes sense "
                   f"when it is longer)")
        self.first_timeout_s = (
            first_timeout_s
            if first_timeout_s and first_timeout_s > timeout_s else None)
        self._log = log_fn
        self._last = time.monotonic()
        self._beaten = False
        self._grace_until_beat = False
        self._stopped = False
        if timeout_s and timeout_s > 0:
            t = threading.Thread(target=self._watch, daemon=True,
                                 name="hang-watchdog")
            t.start()

    def beat(self) -> None:
        self._last = time.monotonic()
        self._beaten = True
        self._grace_until_beat = False

    def expect_compile(self) -> None:
        """Apply the first-beat grace window until the NEXT beat.

        Call before dispatching work known to first-compile: with the
        persistent compile cache disabled on axon, a NEW shape bucket's
        first compile after a trainer restart happens mid-run (long after
        the first beat) and can legitimately exceed the steady-state
        timeout on a slow-backend day — the same kill-loop failure mode the
        first-beat grace fixed, recurring mid-run (ADVICE r4).  No-op
        without a configured first_timeout_s."""
        if self.first_timeout_s:
            self._last = time.monotonic()
            self._grace_until_beat = True

    def stop(self) -> None:
        """Disarm (clean shutdown paths: num_steps reached, Ctrl-C save)."""
        self._stopped = True

    def _watch(self) -> None:
        while not self._stopped:
            time.sleep(min(30.0, self.timeout_s / 4))
            in_grace = self.first_timeout_s and (
                not self._beaten or self._grace_until_beat)
            limit = self.first_timeout_s if in_grace else self.timeout_s
            stalled = time.monotonic() - self._last
            if not self._stopped and stalled > limit:
                try:
                    phase = ("no first beat (restore/compile phase)"
                             if in_grace else "no train-loop progress")
                    self._log(
                        f"HangWatchdog: {phase} for "
                        f"{stalled:.0f}s (> {limit:.0f}s) — device "
                        f"RPC presumed wedged; hard-exiting {self.EXIT_CODE} "
                        f"so the lease expires and a supervisor can resume "
                        f"from the last checkpoint")
                    sys.stdout.flush()
                    sys.stderr.flush()
                except Exception:
                    pass
                os._exit(self.EXIT_CODE)


def exec_restart(log_dir: str, save_fn: Callable[[], None],
                 log_fn: Callable[[str], None], reason: str) -> None:
    """Save a checkpoint and replace this process with a fresh resume of the
    same command (``--load_path=<log_dir>``).  Never returns (``os.execv``
    replaces the process image; exec after jax init is safe — unlike fork,
    nothing survives into the new process)."""
    argv = restart_argv(log_dir)
    log_fn(f"{reason}; checkpointing and exec-restarting: "
           f"{' '.join(argv[1:])}")
    save_fn()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execv(argv[0], argv)


def maybe_exec_restart(log_dir: str, max_rss_gb: float,
                       save_fn: Callable[[], None],
                       log_fn: Callable[[str], None]) -> None:
    """If host RSS exceeds ``max_rss_gb``: :func:`exec_restart`.  No-op when
    ``max_rss_gb <= 0`` or RSS is under the limit."""
    if max_rss_gb <= 0:
        return
    rss = host_rss_gb()
    if rss < max_rss_gb:
        return
    exec_restart(
        log_dir, save_fn, log_fn,
        f"Host RSS {rss:.1f} GB > {max_rss_gb:.1f} GB watchdog limit")


class SlowdownWatchdog:
    """Detect leak-driven step-time degradation and request a restart.

    Why this exists: besides growing RSS, the tunneled client's per-transfer
    host leak progressively slows the whole RPC path — measured on a WaveNet
    campaign: a fresh process steps at ~0.12 s/step and degrades to
    ~0.18 s/step (+50%) within ~2 h, long before the RSS watchdog limit.
    Since the eval_shape-skeleton restore made resume cheap (~35 s), it pays
    to exec-restart as soon as steady-state step time has clearly degraded.

    The train loop feeds :meth:`update` one sec/step sample per sync
    boundary.  The detector compares the MEDIAN of the last ``window``
    samples against the best median seen in this process: the median is
    immune to the isolated spikes that checkpoint saves (~4 s) and eval
    steps inject into individual samples, which would false-trigger a mean.
    The first ``min_samples`` samples are ignored (first-jit compiles
    pollute process start).  ``ratio <= 1`` disables.

    A degraded median alone is NOT sufficient: Tacotron's sec/step varies
    legitimately with the shape-bucket mix, and the data curriculum
    (initial_phase_step) shifts that mix mid-run — a both_r2_ss campaign
    was spuriously exec-restarted at step 2800 (median 20 ms vs a
    short-bucket best of 13 ms), paying minutes of bucket recompiles (no
    persistent compile cache on axon).  The leak this watchdog exists for
    always grows host RSS alongside the slowdown (~GBs/hour), so a restart
    additionally requires RSS to have grown by ``rss_growth_gb`` since the
    best median was recorded; workload-mix variance leaves RSS flat.
    """

    def __init__(self, ratio: float, window: int = 30,
                 min_samples: int = 50, rss_growth_gb: float = 2.0,
                 rss_fn=host_rss_gb):
        self.ratio = ratio
        self.min_samples = min_samples
        self.rss_growth_gb = rss_growth_gb
        self._rss_fn = rss_fn
        self._samples: deque = deque(maxlen=window)
        self._seen = 0
        self.best_median: float = float("inf")
        self.rss_at_best: float = float("nan")
        self.last_median: float = float("nan")
        self.last_rss_growth: float = float("nan")

    def update(self, sec_per_step: float) -> bool:
        """Record one sample; True when a restart is warranted."""
        if self.ratio is None or self.ratio <= 1:
            return False
        self._seen += 1
        self._samples.append(sec_per_step)
        if (self._seen < self.min_samples
                or len(self._samples) < self._samples.maxlen):
            return False
        med = statistics.median(self._samples)
        self.last_median = med
        if med < self.best_median:
            self.best_median = med
            self.rss_at_best = self._rss_fn()
            return False
        if med <= self.best_median * self.ratio:
            return False
        self.last_rss_growth = self._rss_fn() - self.rss_at_best
        return self.last_rss_growth >= self.rss_growth_gb

    def reason(self) -> str:
        return (f"Median step time {self.last_median * 1e3:.0f} ms > "
                f"{self.ratio:.2f}x best {self.best_median * 1e3:.0f} ms "
                f"with host RSS +{self.last_rss_growth:.1f} GB since best "
                f"(leak-driven slowdown)")

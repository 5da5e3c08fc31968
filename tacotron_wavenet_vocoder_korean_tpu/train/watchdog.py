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
import sys
from typing import Callable, List


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


def maybe_exec_restart(log_dir: str, max_rss_gb: float,
                       save_fn: Callable[[], None],
                       log_fn: Callable[[str], None]) -> None:
    """If host RSS exceeds ``max_rss_gb``: save a checkpoint and replace this
    process with a fresh resume of the same command.  No-op when
    ``max_rss_gb <= 0`` or RSS is under the limit.  Never returns if the
    restart fires (``os.execv`` replaces the process image; exec after jax
    init is safe — unlike fork, nothing survives into the new process)."""
    if max_rss_gb <= 0:
        return
    rss = host_rss_gb()
    if rss < max_rss_gb:
        return
    argv = restart_argv(log_dir)
    log_fn(f"Host RSS {rss:.1f} GB > {max_rss_gb:.1f} GB watchdog limit; "
           f"checkpointing and exec-restarting: {' '.join(argv[1:])}")
    save_fn()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execv(argv[0], argv)

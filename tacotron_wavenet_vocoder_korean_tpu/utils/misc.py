"""Small utilities (reference: utils/__init__.py:197-243)."""
from __future__ import annotations

import argparse
import os
import subprocess
from concurrent.futures import ThreadPoolExecutor
from datetime import datetime
from typing import Callable, Iterable, List, Optional


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected")


def get_time() -> str:
    return datetime.now().strftime("%Y-%m-%d_%H-%M-%S")


def add_postfix(path: str, postfix) -> str:
    path_without_ext, ext = path.rsplit(".", 1)
    return f"{path_without_ext}.{postfix}.{ext}"


def get_git_revision() -> Optional[str]:
    """Current commit hash, for run provenance
    (reference train_tacotron.py get_git_commit)."""
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))),
            stderr=subprocess.DEVNULL).decode().strip()
    except Exception:
        return None


def parallel_map(fn: Callable, items: Iterable, num_workers: int = 8) -> List:
    """Threaded map (reference utils/__init__.py:212-226 used mp.Pool; threads
    cooperate with an initialized jax runtime)."""
    items = list(items)
    if num_workers <= 1 or len(items) <= 1:
        return [fn(x) for x in items]
    with ThreadPoolExecutor(max_workers=num_workers) as ex:
        return list(ex.map(fn, items))


def remove_file(path: str) -> None:
    try:
        os.remove(path)
    except OSError:
        pass


def enable_compilation_cache(path: str = None) -> None:
    """Persistent XLA compilation cache: restarts reuse compiled programs
    instead of paying the multi-minute recompile per shape bucket."""
    import jax
    path = path or os.path.expanduser("~/.cache/twvk_jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs

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
    instead of paying the multi-minute recompile per shape bucket.

    DISABLED on the axon backend (unless TWVK_FORCE_COMPILE_CACHE=1):
    EXECUTING a program deserialized from the persistent cache wedges that
    backend — dispatch returns in seconds, the first result fetch never
    completes — while a fresh compile of the same HLO runs fine.  Verified
    with a minimal two-process experiment (same jit scan, same scratch
    cache dir: process A compiles+runs in seconds, process B cache-hits
    and hangs >7 min until killed), and observed as back-to-back 20-min
    HangWatchdog kills on every campaign resume once the cache was warm.
    Call this AFTER set_platform() so the gate sees the real platform.
    TWVK_NO_COMPILE_CACHE=1 disables the cache everywhere.
    """
    import jax
    if os.environ.get("TWVK_NO_COMPILE_CACHE", "") == "1":
        return
    if (effective_platform() == "axon"
            and os.environ.get("TWVK_FORCE_COMPILE_CACHE", "") != "1"):
        return
    path = path or os.path.expanduser("~/.cache/twvk_jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs


def effective_platform() -> str:
    """The PRIMARY platform jax will actually use, lowercased.

    Single source of truth for platform-conditional behavior (the axon
    compile-cache gate): prefers jax.config (set_platform writes there, and
    sitecustomize pins the image default there), falls back to the
    JAX_PLATFORMS env var, then to the initialized backend.  Multi-platform
    strings like 'cpu,axon' resolve to their first (primary) entry, so a
    cpu-primary run is never mis-gated by a secondary platform's name
    appearing in the string (ADVICE r4)."""
    import jax
    p = str(getattr(jax.config, "jax_platforms", None)
            or os.environ.get("JAX_PLATFORMS", "") or "")
    p = p.split(",")[0].strip().lower()
    if not p:
        try:
            p = str(jax.default_backend()).lower()
        except Exception:
            p = ""
    return p


def add_platform_arg(parser) -> None:
    """Register the standard --platform override every CLI shares.

    The image pins JAX to the tunneled TPU via sitecustomize, so an env var
    cannot flip the platform — only jax.config.update before first device
    use can (CLAUDE.md).  'cpu' enables smoke runs without the chip."""
    parser.add_argument(
        "--platform", default=None,
        help="jax platform override (e.g. 'cpu' for smoke runs; the image "
             "pins the TPU via sitecustomize, so an env var is not enough)")


def set_platform(platform: str = None) -> None:
    """Apply a --platform override (no-op when None)."""
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)


def packed_device_put(tree):
    """Transfer a host pytree to device in O(#dtypes) bulk transfers instead
    of O(#leaves) individual ones.

    The tunneled TPU client pays ~1 s of round-trip latency per transfer, so
    moving a ~700-leaf train state leaf-by-leaf (what a naive device_put or
    first jit dispatch does) costs ~10 minutes.  Packing all same-dtype
    leaves into one flat buffer, transferring once, and slicing them apart
    in a single compiled program makes restore take seconds.  Shapes/dtypes
    are preserved exactly."""
    import jax
    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = [None] * len(leaves)
    groups = {}
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        groups.setdefault(arr.dtype.str, []).append((i, arr))

    for _, items in groups.items():
        flat = np.concatenate([a.ravel() for _, a in items]) \
            if len(items) > 1 else items[0][1].ravel()
        shapes = tuple(a.shape for _, a in items)
        sizes = tuple(int(a.size) for _, a in items)

        def unpack(buf, shapes=shapes, sizes=sizes):
            outs, off = [], 0
            for shp, sz in zip(shapes, sizes):
                outs.append(buf[off:off + sz].reshape(shp))
                off += sz
            return outs
        from .compile_lock import COMPILE_LOCK
        with COMPILE_LOCK:  # symmetric with packed_host_get: no concurrent
            parts = jax.jit(unpack)(jax.device_put(flat))  # first-jit races
        for (i, _), dev in zip(items, parts):
            out[i] = dev
    return jax.tree_util.tree_unflatten(treedef, out)


def _ravel_concat_impl(xs):
    import jax.numpy as jnp
    flats = [x.ravel() for x in xs]
    return jnp.concatenate(flats) if len(flats) > 1 else flats[0]


_ravel_concat_jitted = None


def _ravel_concat(xs):
    global _ravel_concat_jitted
    if _ravel_concat_jitted is None:
        import jax
        _ravel_concat_jitted = jax.jit(_ravel_concat_impl)
    # Serialize the (possibly first) jit dispatch against other threads'
    # compiles: checkpoint saves run on the main thread while the
    # DevicePrefetcher thread compiles gathers under COMPILE_LOCK
    # (data/loader.py:277), and concurrent first-jit from two threads
    # deadlocks this backend (CLAUDE.md).
    from .compile_lock import COMPILE_LOCK
    with COMPILE_LOCK:
        return _ravel_concat_jitted(xs)


def packed_host_get(tree):
    """Inverse of :func:`packed_device_put`: fetch a device pytree to host
    numpy in O(#dtypes) bulk transfers instead of O(#leaves) individual ones.

    ``jax.tree.map(np.asarray, state)`` pays the tunneled client's ~1 s
    round-trip per leaf, which made every checkpoint save stall the train
    loop for ~60 s.  Concatenating all same-dtype leaves on-device (one
    compiled program, cached on shapes) and pulling each flat buffer in a
    single transfer makes a save cost ~2 s.  Host-resident leaves are
    passed through ``np.asarray`` untouched (no transfer)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = [None] * len(leaves)
    groups = {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array):
            groups.setdefault(jnp.dtype(leaf.dtype).str, []).append((i, leaf))
        else:
            out[i] = np.asarray(leaf)

    for _, items in groups.items():
        arrs = [a for _, a in items]
        # the module-level jitted helper caches on the (structure, shapes)
        # signature, so repeated saves of the same train state reuse one
        # executable
        flat = np.asarray(_ravel_concat(arrs))
        off = 0
        for i, a in items:
            size = int(np.prod(a.shape)) if a.shape else 1
            out[i] = flat[off:off + size].reshape(a.shape)
            off += size
    return jax.tree_util.tree_unflatten(treedef, out)

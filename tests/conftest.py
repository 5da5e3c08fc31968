"""Test harness: force an 8-device virtual CPU platform so sharding tests run
anywhere (SURVEY.md §4 multi-chip strategy).

Note: this image pre-imports jax and pins JAX_PLATFORMS=axon (real TPU) via
sitecustomize, so the env-var route is not enough — we must also flip
jax.config before any backend is initialized.  The real chip is reserved for
bench.py.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

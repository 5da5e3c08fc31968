"""Process-wide jit-compile serialization.

Concurrent FIRST compilation of jitted programs from several threads
deadlocks on this jax build (observed on the tunneled axon backend; see
dsp/stft.py).  Any code that may first-jit off the main thread (the DSP
feature extractor's worker pool, the DevicePrefetcher's background gather)
must take this shared lock around the compiling call, then run lock-free.
"""
import threading

COMPILE_LOCK = threading.Lock()

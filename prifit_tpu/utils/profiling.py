"""Tracing / profiling / numerical-sanitizer harness (SURVEY.md §5).

The reference has no profiling beyond a print-timer
(``models/pointnet_util.py:7-9``) and no sanitizers beyond
``src/guard.py``.  TPU-native equivalents:

  - :func:`trace` — ``jax.profiler`` trace context writing a TensorBoard-
    compatible profile directory;
  - :class:`StepTimer` — wall-clock step timing that syncs through the
    device (``block_until_ready`` on a scalar; see the verify notes about
    remote-TPU tunnels: syncing via host transfer is the reliable way);
  - :func:`debug_nans` — context enabling jax's NaN checker
    (the equivalent of the reference's inf-check + ipdb at
    ``src/fitting_utils.py:24-25``).
"""

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a block: ``with trace('/tmp/prof'): step(...)``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Enable jax_debug_nans within a block."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def sync(x) -> float:
    """Force completion by pulling one scalar to the host.

    ``block_until_ready`` may return immediately through remote-device
    tunnels; a host transfer cannot.
    """
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jax.numpy.ravel(leaf)[0]))


class StepTimer:
    """Accumulates device-synced step times; reports mean/p50/p95."""

    def __init__(self, sync_overhead_s: float = 0.0):
        self.times = []
        self.overhead = sync_overhead_s

    @contextlib.contextmanager
    def step(self, result_getter=None):
        t0 = time.time()
        holder = {}

        def done(result):
            holder["r"] = result

        yield done
        if "r" in holder:
            sync(holder["r"])
        self.times.append(time.time() - t0 - self.overhead)

    def time_fn(self, fn, *args, warmup: int = 1, reps: int = 10):
        """Time a jitted fn returning a pytree; returns seconds/rep."""
        for _ in range(warmup):
            sync(fn(*args))
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        dt = (time.time() - t0 - self.overhead) / reps
        self.times.append(dt)
        return dt

    def summary(self) -> dict:
        t = np.asarray(self.times)
        if t.size == 0:
            return {}
        return {"mean_s": float(t.mean()), "p50_s": float(np.median(t)),
                "p95_s": float(np.percentile(t, 95)), "n": int(t.size)}

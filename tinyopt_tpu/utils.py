"""Timing and profiling utilities.

Counterpart of the reference's ``time.h`` (tic/toc, reference:
include/tinyopt/time.h:22-57) plus the TPU-native observability the
reference lacks (SURVEY.md §5.1): a ``jax.profiler`` trace context that
captures device timelines viewable in TensorBoard / Perfetto, and a
NaN-debugging toggle standing in for the reference's ASAN build type
(SURVEY.md §5.2).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator


def float_epsilon(dtype) -> float:
    """The reference's FloatEpsilon policy (math.h:297-301): 1e-7 for
    64-bit floats, 1e-4 for narrower — ONE definition shared by the
    Mahalanobis guards, numerical-differentiation default steps, and the
    accept/reject rel_derr zeroing in BOTH the XLA loop and the fused
    kernel (the two must stay bit-identical)."""
    import jax.numpy as jnp
    return 1e-7 if jnp.dtype(dtype).itemsize >= 8 else 1e-4


def tic() -> float:
    """Start time in seconds (reference: time.h:22)."""
    return time.perf_counter()


def toc_ms(t0: float) -> float:
    """Milliseconds since ``t0`` (reference: time.h:30-38)."""
    return (time.perf_counter() - t0) * 1e3


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace around a block.

    View with TensorBoard (``tensorboard --logdir <dir>``) or Perfetto.
    The block should end with ``jax.block_until_ready`` on its outputs so
    the device work is inside the trace.
    """
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """Raise on NaN production inside jitted code (jax_debug_nans).

    The development-time analogue of the reference's sanitizer build; the
    production path instead *routes* NaNs to
    ``StopReason.SYSTEM_HAS_NAN_OR_INF`` (optimizers/loop.py).
    """
    import jax

    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def block_ms(fn, *args, n: int = 5) -> float:
    """Best-of-n wall-clock milliseconds of ``fn(*args)`` incl. device sync.

    Each rep ends with a forced host read of the first output scalar
    (``block_until_ready`` alone is not a reliable completion barrier on
    remote backends).  CAVEAT for the axon TPU tunnel: repeats with
    IDENTICAL inputs are served from a persistent server-side execution
    cache, so this utility measures round-trip latency there — honest
    device timing needs fresh inputs per rep (see bench.py's protocol).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    def run():
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        # force a concrete transfer of one element
        float(np.asarray(jnp.ravel(jnp.asarray(leaf))[0]))
        return out

    run()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3

"""Tracing / profiling hooks (SURVEY.md section 5: absent in the reference;
first-class here).

``trace(logdir)`` wraps a code region in a jax.profiler trace (xplane dump
for xprof/tensorboard); ``debug_mode()`` enables the framework's "sanitizer"
analog - NaN checking on every jitted computation (the functional-JAX
equivalent of a race/memory sanitizer: the only failure class reachable in
pure data-parallel code is numeric poison).
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a region: ``with profiling.trace('/tmp/xplane'): render()``.

    View with xprof / tensorboard. (On interactive TPU tunnels the device
    trace may be host-only; wall-clock spans still record.)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = False):
    """NaN sanitizer + optional op-by-op execution for kernel debugging.

    Use with the XLA path (intersector='bruteforce'/'bvh') - it is the
    bit-exact semantic reference and what debugging should target. The
    megakernel deliberately produces transient NaNs (sqrt of a negative
    sphere discriminant encodes 'no root'; IEEE comparison discards
    them), so the NaN check false-positives on its interpret mode."""
    ctxs = []
    if nans:
        ctxs.append(jax.debug_nans(True))
    if disable_jit:
        ctxs.append(jax.disable_jit())
    with contextlib.ExitStack() as stack:
        for c in ctxs:
            stack.enter_context(c)
        yield


def annotate(name: str):
    """Named profiler span for driver-side phases."""
    return jax.profiler.TraceAnnotation(name)

"""Initialization helpers: run flax `init` on the host CPU backend.

Parameter initialization is a one-off O(params) computation; compiling an
init program for the accelerator wastes a full remote-compile round trip
per model (minutes over a tunneled chip). Running init under the CPU
backend and device_put-ting the result costs milliseconds.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def cpu_backend():
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        yield None
        return
    with jax.default_device(cpu):
        yield cpu


def init_on_cpu(init_fn, *args, **kwargs):
    """Run a flax init under the CPU backend; arrays transfer to the
    default device lazily on first use."""
    with cpu_backend():
        return init_fn(*args, **kwargs)

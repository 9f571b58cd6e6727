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


def to_default_device(tree):
    """Move a pytree committed to the CPU backend onto the default
    accelerator (one bulk transfer). Without this, CPU-committed params
    re-upload on EVERY jit call."""
    try:
        default = jax.devices()[0]
    except RuntimeError:
        return tree
    if default.platform == "cpu":
        return tree
    return jax.tree.map(lambda x: jax.device_put(x, default), tree)


def init_on_cpu(init_fn, *args, **kwargs):
    """Run a flax init under the CPU backend, then move the result to the
    default device once."""
    with cpu_backend():
        out = init_fn(*args, **kwargs)
    return to_default_device(out)

"""Stream position ops: delay, skip, head.

In the reference these are scheduler-level blocks (src/delay.rs, src/skip.rs,
src/head.rs); here they are static slices/pads on the stream arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def delay(x, n: int):
    """Delay by n samples, zero-filled (reference src/delay.rs)."""
    x = jnp.asarray(x)
    if n == 0:
        return x
    return jnp.pad(x, [(n, 0)] + [(0, 0)] * (x.ndim - 1))[: x.shape[0]]


def skip(x, n: int):
    """Drop the first n samples (reference src/skip.rs)."""
    return jnp.asarray(x)[n:]


def head(x, n: int):
    """Pass only the first n samples (reference src/head.rs)."""
    return jnp.asarray(x)[:n]

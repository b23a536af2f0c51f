"""Rate-changing and position blocks."""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from .base import Block

_take = jax.jit(lambda v, idx: jnp.take(v, idx, axis=0))


@functools.lru_cache(maxsize=None)
def _drop_first(n: int):
    return jax.jit(lambda v: v[n:])


@functools.lru_cache(maxsize=None)
def _keep_first(n: int):
    return jax.jit(lambda v: v[:n])


class RationalResampler(Block):
    """Gather resampler (reference src/rational_resampler.rs:154-206).

    Streaming: output position is a pure function of the global input
    offset (the reference's counter evolves linearly), so the chunk form
    just computes the global index window.
    """

    jit_chunk = False  # chunk logic depends on Python-int offsets

    def __init__(self, interp: int, deci: int):
        if interp <= 0 or deci <= 0:
            raise ValueError("RationalResampler interp/deci must be > 0")
        g = math.gcd(interp, deci)
        self.interp = interp // g
        self.deci = deci // g

    def apply(self, x):
        return ops.rational_resampler(x, self.interp, self.deci)

    def init_state(self):
        return {"in_off": 0, "out_off": 0}

    def apply_chunk(self, state, x):
        n = x.shape[0]
        in_off, out_off = state["in_off"], state["out_off"]
        # outputs k with floor(k*deci/interp) in [in_off, in_off+n)
        out_end = -(-(in_off + n) * self.interp // self.deci)  # ceil
        k = np.arange(out_off, out_end)
        idx = (k * self.deci) // self.interp - in_off
        # jitted gather: eager ops on complex device arrays are
        # unimplemented on some TPU transports
        y = _take(jnp.asarray(x), jnp.asarray(idx))
        return {"in_off": in_off + n, "out_off": out_end}, y


class Delay(Block):
    """Zero-filled delay (reference src/delay.rs)."""

    def __init__(self, n: int):
        self.n = n

    def apply(self, x):
        return ops.delay(x, self.n)

    def init_state(self):
        return None  # lazily typed tail

    def apply_chunk(self, state, x):
        x = jnp.asarray(x)
        if state is None:
            state = jnp.zeros(self.n, x.dtype)
        ext = jnp.concatenate([state, x])
        return ext[x.shape[0] :], ext[: x.shape[0]]


class Skip(Block):
    """Drop first n samples (reference src/skip.rs)."""

    jit_chunk = False  # variable-length outputs per chunk

    def __init__(self, n: int):
        self.n = n

    def apply(self, x):
        return ops.skip(x, self.n)

    def init_state(self):
        return {"left": self.n}

    def apply_chunk(self, state, x):
        left = state["left"]
        take = min(left, x.shape[0])
        return {"left": left - take}, _drop_first(take)(jnp.asarray(x))


class Head(Block):
    """Pass first n samples then end (reference src/head.rs)."""

    jit_chunk = False  # variable-length outputs per chunk

    def __init__(self, n: int):
        self.n = n

    def apply(self, x):
        return ops.head(x, self.n)

    def init_state(self):
        return {"left": self.n}

    def apply_chunk(self, state, x):
        take = min(state["left"], x.shape[0])
        return {"left": state["left"] - take}, _keep_first(take)(jnp.asarray(x))

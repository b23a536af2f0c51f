"""Demodulation / modulation blocks."""

from __future__ import annotations

import jax.numpy as jnp

from .. import ops
from .base import Block


class QuadratureDemod(Block):
    """FM discriminator (reference src/quadrature_demod.rs:46-113).

    Offline: N-1 outputs.  Streaming: carries one sample, so after the
    first chunk every chunk yields len(x) outputs.
    """

    # mesh execution: 1-sample halo; the stream-start output the halo
    # form emits but streaming never does (arg(conj(0)*x0)) is dropped
    shard_halo = 1
    shard_extra_drop = 1

    def __init__(self, gain: float = 1.0):
        self.gain = gain

    def apply(self, x):
        return ops.quadrature_demod(x, self.gain)

    def init_state(self):
        return jnp.zeros(0, jnp.complex64)

    def apply_chunk(self, state, x):
        ext = jnp.concatenate([jnp.asarray(state, jnp.complex64), jnp.asarray(x)])
        y = ops.quadrature_demod(ext, self.gain)
        return ext[-1:], y


class FastFM(Block):
    """Lyons fast FM (reference src/quadrature_demod.rs:144-165)."""

    shard_halo = 2  # zero-history 2-sample lookback

    def apply(self, x):
        return ops.fast_fm(x)

    def init_state(self):
        return jnp.zeros(2, jnp.complex64)

    def apply_chunk(self, state, x):
        ext = jnp.concatenate([state, jnp.asarray(x)])
        y = ops.fast_fm(ext)[2:]
        return ext[-2:], y


class Vco(Block):
    """FM modulator (reference src/vco.rs)."""

    def __init__(self, k: float):
        self.k = k

    def apply(self, x):
        out, _ = ops.vco(x, self.k)
        return out

    def init_state(self):
        return jnp.float32(0.0)

    def apply_chunk(self, state, x):
        out, phase = ops.vco(x, self.k, phase0=state)
        return phase, out

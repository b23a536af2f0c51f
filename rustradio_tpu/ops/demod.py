"""FM demodulation kernels.

* ``quadrature_demod`` — reference src/quadrature_demod.rs:46-113:
  y[n] = gain * atan2(im, re) of conj(x[n]) * x[n+1].  One-sample halo.
* ``fast_fm`` — reference src/quadrature_demod.rs:144-165 (Lyons p.760):
  y[n] = (x[n].im - x[n-2].im) * x[n-1].re - (x[n].re - x[n-2].re) * x[n-1].im
  with q1 = q2 = 0 at stream start.  Two-sample halo, no atan.

On TPU both are pure elementwise VPU math over shifted views; the
reference's 4x "fast-math atan2" advantage disappears because XLA's atan2
is already vectorized.
"""

from __future__ import annotations

import jax.numpy as jnp


def quadrature_demod(x, gain: float = 1.0):
    """y[n] = gain * arg(conj(x[n]) * x[n+1]); output length N-1."""
    x = jnp.asarray(x)
    d = jnp.conj(x[:-1]) * x[1:]
    return jnp.float32(gain) * jnp.arctan2(
        jnp.imag(d).astype(jnp.float32), jnp.real(d).astype(jnp.float32)
    )


def fast_fm(x):
    """FastFM discriminator; output length N, zero-initialized history.

    out[n] = (x[n].im - x[n-2].im) * x[n-1].re
           - (x[n].re - x[n-2].re) * x[n-1].im,  x[<0] = 0.
    """
    x = jnp.asarray(x)
    re = jnp.real(x).astype(jnp.float32)
    im = jnp.imag(x).astype(jnp.float32)
    re1 = jnp.pad(re, (1, 0))[:-1]  # x[n-1]
    im1 = jnp.pad(im, (1, 0))[:-1]
    re2 = jnp.pad(re, (2, 0))[:-2]  # x[n-2]
    im2 = jnp.pad(im, (2, 0))[:-2]
    return (im - im2) * re1 - (re - re2) * im1

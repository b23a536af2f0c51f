"""CMA blind equalizer (reference src/cma.rs — "WIP, completely untested"
there; here: a working scan implementation with the same update rule).

Per output sample (src/cma.rs:66-84):
    y[i]   = sum_k taps[k] * x[i + k]
    e      = R - |y|^2
    taps  += mu * e * y * conj(window)

An adaptive recurrence — sequential over samples via lax.scan, vmap-able
across channels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cma_equalize(x, ntaps: int, desired_modulus: float = 1.0,
                 step_size: float = 1e-3, taps=None):
    """Returns (y, final_taps); y has len(x) - ntaps + 1 samples."""
    if ntaps == 0:
        raise ValueError("ntaps must be nonzero")
    x = jnp.asarray(x, jnp.complex64)
    n = x.shape[0]
    if n < ntaps:
        raise ValueError(f"input {n} shorter than taps {ntaps}")
    if taps is None:
        t0 = jnp.zeros(ntaps, jnp.complex64).at[0].set(1.0)
    else:
        t0 = jnp.asarray(taps, jnp.complex64)
    r = jnp.float32(desired_modulus)
    mu = jnp.float32(step_size)
    # windows[i] = x[i : i+ntaps]; build via static shifts (ntaps is small)
    nwin = n - ntaps + 1
    windows = jnp.stack([x[k : k + nwin] for k in range(ntaps)], axis=1)

    def step(taps, w):
        y = jnp.sum(taps * w)
        e = r - (jnp.real(y) ** 2 + jnp.imag(y) ** 2)
        taps = taps + (mu * e) * y * jnp.conj(w)
        return taps, y

    final, y = jax.lax.scan(step, t0, windows)
    return y, final

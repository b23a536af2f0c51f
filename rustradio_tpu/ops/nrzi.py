"""NRZI-S encode/decode (reference src/nrzi.rs).

Decode (src/nrzi.rs:37-42): out[n] = 1 ^ x[n] ^ x[n-1], x[-1] = 0 —
pure feed-forward vector op with a 1-bit halo.

Encode (src/nrzi.rs:64-69): out toggles on input 0 — out[n] =
parity(count of zeros in x[0..n]) — an XOR prefix-sum, done with cumsum
(feed-forward on device, unlike the reference's sequential loop).
"""

from __future__ import annotations

import jax.numpy as jnp


def nrzi_decode(x, last=0):
    """out[n] = 1 ^ x[n] ^ x[n-1]; ``last`` is the carried previous bit."""
    x = jnp.asarray(x, jnp.uint8)
    prev = jnp.concatenate([jnp.asarray([last], jnp.uint8), x[:-1]])
    return jnp.uint8(1) ^ x ^ prev


def nrzi_encode(x, out0=0):
    """NRZI-S encode; ``out0`` is the carried current line state."""
    x = jnp.asarray(x, jnp.uint8)
    toggles = (x == 0).astype(jnp.int32)
    return ((jnp.cumsum(toggles) + jnp.int32(out0)) % 2).astype(jnp.uint8)

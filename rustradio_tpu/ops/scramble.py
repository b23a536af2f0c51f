"""G3RUH-style LFSR scrambling (reference src/descrambler.rs).

The reference clocks a shift register per bit.  Descrambling is
feed-forward:  with mask bits {j} and register length L, the register bit j
at time n holds x[n-1-(L-j)], so

    out[n] = x[n] ^ XOR_{j in mask} x[n - (L - j) - 1]

— a pure windowed XOR (vectorized on device; the seed contributes only to
the first L+1 outputs and is handled by the carried history).

Scrambling is a true feedback recurrence; over GF(2) the state advance is
linear, so we batch it: precompute the (L+1)x(L+1) advance matrix for a
block of B bits and apply with XOR-matmuls — here we provide the simple
lax.scan form (TX side, low rate) plus the feed-forward descramble.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _mask_delays(mask: int, length: int) -> list[int]:
    """Delays d such that out[n] ^= x[n-d]: d = L - j + 1 per mask bit j."""
    return [length - j + 1 for j in range(64) if (mask >> j) & 1]


def descramble(x, mask: int = 0x21, length: int = 16, history=None):
    """Feed-forward LFSR descramble; matches reference next_descramble
    (src/descrambler.rs:33-38) with seed 0.

    ``history``: the previous length+1 input bits (for streaming), oldest
    first; defaults to zeros (== seed 0).
    """
    x = jnp.asarray(x, jnp.uint8)
    h = length + 1
    if history is None:
        hist = jnp.zeros(h, jnp.uint8)
    else:
        hist = jnp.asarray(history, jnp.uint8)
    xp = jnp.concatenate([hist, x])
    out = x
    for d in _mask_delays(mask, length):
        out = out ^ xp[h - d : h - d + x.shape[0]]
    return out


def scramble(x, mask: int = 0x21, length: int = 16, seed: int = 0, state=None):
    """LFSR scramble (reference next_scramble, src/descrambler.rs:39-45).

    Returns (out, final_state).  Sequential scan (TX path).
    """
    x = jnp.asarray(x, jnp.uint8)
    mask_arr = jnp.asarray(
        [(mask >> j) & 1 for j in range(length + 1)], jnp.uint8
    )
    if state is None:
        s0 = jnp.asarray(
            [(seed >> j) & 1 for j in range(length + 1)], jnp.uint8
        )
    else:
        s0 = jnp.asarray(state, jnp.uint8)

    def step(s, xi):
        ret = s[0]
        tmp = (jnp.sum((s & mask_arr).astype(jnp.int32)) % 2).astype(jnp.uint8) ^ xi
        s = jnp.concatenate([s[1:], tmp[None]])
        return s, ret

    s, out = jax.lax.scan(step, s0, x)
    return out, s


def descramble_numpy(x: np.ndarray, mask: int = 0x21, length: int = 16) -> np.ndarray:
    """Host golden model: literal port of the reference LFSR semantics."""
    shift_reg = 0
    out = np.empty_like(x)
    for n, i in enumerate(x):
        ret = (bin(shift_reg & mask).count("1") & 1) ^ int(i)
        shift_reg = (shift_reg >> 1) | (int(i) << length)
        out[n] = ret
    return out

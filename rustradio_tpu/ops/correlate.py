"""Access-code correlation (reference src/correlate_access_code.rs).

out[n] = 1 if the last len(code) bits ending at n differ from code in at
most ``allowed_diffs`` positions (0 while the window is not yet full).
On device: one small integer convolution — the number of diffs is
len(code) - matches, and matches = correlation of +/-1-mapped streams.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .fir import _conv1d


def correlate_access_code(x, code, allowed_diffs: int = 0):
    """Bit stream (u8 0/1) -> u8 0/1 match indicator per position."""
    x = jnp.asarray(x)
    code = np.asarray(code, np.float32)
    ncode = len(code)
    xf = jnp.asarray(x, jnp.float32) * 2.0 - 1.0  # {0,1} -> {-1,+1}
    cf = code * 2.0 - 1.0
    # matches at window ending n = (ncode + sum_j cf[j]*xf[n-ncode+1+j]) / 2
    # _conv1d gives y[m] = sum_j cf[j] * xp[m + ncode-1 - j]; we want the
    # un-reversed correlation, so flip the code.
    corr = _conv1d(xf, cf[::-1], stride=1, pad_left=ncode - 1)[: x.shape[0]]
    matches = (jnp.float32(ncode) + corr) / 2.0
    diffs = jnp.float32(ncode) - matches
    # diffs is an exact small integer in f32; compare with half-ulp slack.
    ok = diffs <= jnp.float32(allowed_diffs) + 0.25
    # Window not full for the first ncode-1 samples.
    idx = jnp.arange(x.shape[0])
    return (ok & (idx >= ncode - 1)).astype(jnp.uint8)

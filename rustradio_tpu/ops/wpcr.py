"""Whole-packet clock recovery (Ossmann method) and burst midpointing.

Reference src/wpcr.rs.  This is the TPU-preferred clock recovery: one FFT
over the whole burst instead of a per-sample feedback loop.

``wpcr`` (src/wpcr.rs:130-197):
1. slice burst at 0, mark zero transitions: d[n] = (s[n]>0) - (s[n+1]>0), squared
2. FFT of d
3. best bin: first bin >= 2 whose magnitude is >80% of max and not rising
   (src/wpcr.rs:217-239)
4. sps = bin / len; clock_phase from bin phase; extract the sample wherever
   the phase accumulator wraps.

``midpoint`` (src/wpcr.rs:53-82): re-center a burst on the midpoint of the
median high/low levels.

Both are batchable across bursts via vmap once bursts are padded to a
common length; the scalar forms here take one burst.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def midpoint(v):
    """Re-center burst around midpoint of median high and median low.

    Mirrors reference Midpointer (src/wpcr.rs:53-82): partition by mean;
    high = sorted(above)[len/2], low = sorted(below)[len/2] (note the
    reference sorts "above mean" into ``a`` and takes a[len/2]).
    Returns None-equivalent (the input) if one side is empty; host-level
    code should drop such bursts like the reference does.
    """
    v = jnp.asarray(v, jnp.float32)
    mean = jnp.mean(v)
    above = v > mean
    n_above = jnp.sum(above)
    n_below = v.shape[0] - n_above
    big = jnp.float32(3.4e38)
    # median of each partition via sort with +/-inf padding
    sa = jnp.sort(jnp.where(above, v, big))  # above-values first ascending
    high = sa[(n_above // 2)]
    sb = jnp.sort(jnp.where(~above, v, big))
    low = sb[(n_below // 2)]
    offset = low + (high - low) / jnp.float32(2.0)
    return v - offset, (n_above > 0) & (n_below > 0)


def _find_best_bin(mag):
    """First bin >= 2 above 80% of max (excluding bins 0,1) and not rising.

    Returns (bin_index, found).  src/wpcr.rs:217-239.
    """
    n = mag.shape[0]
    idx = jnp.arange(n)
    eligible = idx >= 2
    thresh = jnp.max(jnp.where(eligible, mag, -jnp.inf)) * jnp.float32(0.8)
    nxt = jnp.concatenate([mag[1:], jnp.asarray([jnp.inf], mag.dtype)])
    ok = eligible & (mag > thresh) & (mag > nxt) & (idx < n - 1)
    found = jnp.any(ok)
    bin_ = jnp.argmax(ok)  # first True
    return bin_, found


def wpcr(samples, samp_rate: float | None = None):
    """Whole-packet clock recovery over one burst.

    Returns (syms, mask, info) where syms/mask are input-length with
    mask marking emitted symbols, and info is a dict with
    ``sps``, ``phase``, ``found``.  Matches reference process_one
    (src/wpcr.rs:130-197); bursts shorter than 4 samples or with no
    FFT peak yield mask=all-False.
    """
    samples = jnp.asarray(samples, jnp.float32)
    n = samples.shape[0]
    if n < 4:
        z = jnp.zeros_like(samples)
        return samples, jnp.zeros(n, bool), dict(
            sps=jnp.float32(0), phase=jnp.float32(0), found=jnp.asarray(False)
        )
    sliced = (samples > 0).astype(jnp.float32)
    d = sliced[:-1] - sliced[1:]
    d = d * d  # pulses at zero transitions
    # The reference FFTs the length n-1... no: d built from zip(s, s.skip(1))
    # has length n-1? It zips sliced (len n) with skip(1) (len n-1) -> n-1.
    # But then it FFTs d of len n-1 and computes sps = bin / samples.len().
    spec = jnp.fft.fft(d.astype(jnp.complex64))
    half = spec[: d.shape[0] // 2]
    mag = jnp.abs(half)
    bin_, found = _find_best_bin(mag)
    sps = bin_.astype(jnp.float32) / jnp.float32(n)
    arg = jnp.arctan2(jnp.imag(half[bin_]), jnp.real(half[bin_]))
    t = jnp.float32(0.5) + arg / jnp.float32(2.0 * np.pi)
    clock_phase0 = jnp.where(t > 0.5, t, t + jnp.float32(1.0))

    # Extract symbols: for each sample, if clock_phase >= 1: phase -= 1, emit;
    # phase += sps.   phase before sample k = clock_phase0 + k*sps - (#emitted)
    # Emission test uses the running (wrapped) phase; closed form:
    # emitted_before_k = floor(clock_phase0 + (k-1)*sps) ... derive directly:
    # phase_k (unwrapped) = clock_phase0 + k*sps; emit at k iff
    # floor(phase_unwrapped_before_increment) increments. Use cumulative form:
    # Closed form of the leaky accumulator: with u_k = phase0 + k*sps and
    # sps < 1, the cumulative emission count is floor(u_{k-1}); sample k
    # emits iff floor(u_k) > floor(u_{k-1}), except k=0 which emits iff
    # u_0 >= 1 (phase0 can reach 1.5, so the u_{-1} trick fails there).
    k = jnp.arange(n, dtype=jnp.float32)
    unwrapped = clock_phase0 + k * sps
    fl = jnp.floor(unwrapped)
    mask = jnp.concatenate([(unwrapped[:1] >= 1.0), fl[1:] > fl[:-1]])
    mask = mask & found
    info = dict(sps=sps, phase=clock_phase0, found=found)
    return samples, mask, info


def wpcr_numpy(samples: np.ndarray, samp_rate=None):
    """Host golden model: literal port of reference process_one."""
    samples = np.asarray(samples, np.float32)
    if len(samples) < 4:
        return None
    sliced = (samples > 0).astype(np.float32)
    d = (sliced[:-1] - sliced[1:]) ** 2
    spec = np.fft.fft(d.astype(np.complex64))
    half = spec[: len(d) // 2]
    mag = np.abs(half)
    skip = 2
    if len(mag) <= skip:
        return None
    thresh = mag[skip:].max() * 0.8
    bin_ = None
    for i in range(skip, len(mag) - 1):
        if mag[i] > thresh and mag[i] > mag[i + 1]:
            bin_ = i
            break
    if bin_ is None:
        return None
    sps = np.float32(bin_) / np.float32(len(samples))
    arg = np.angle(half[bin_])
    t = 0.5 + arg / (2 * np.pi)
    clock_phase = t if t > 0.5 else t + 1.0
    syms = []
    for s in samples:
        if clock_phase >= 1.0:
            clock_phase -= 1.0
            syms.append(s)
        clock_phase += sps
    return np.asarray(syms, np.float32), float(sps), float(clock_phase)

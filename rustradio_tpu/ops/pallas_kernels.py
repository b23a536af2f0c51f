"""Hand-written Pallas TPU kernels for the hot ops.

Two kernels:

* ``pallas_fir_decimate`` — polyphase decimating FIR as an MXU matmul.
  The input is viewed as frames of ``deci`` samples; the decimated FIR is
  then ``y = sum_p frames_shifted @ H_p`` — a dense (block, 128) x (128,
  taps-per-phase) contraction per tile, which is exactly what the MXU
  wants.  NOTE: this materializes the frame matrix (a ~wlen/deci-fold HBM
  expansion), so for long streams the overlap-save
  ``fft_filter_decimate`` path is faster and remains the default; this
  kernel wins for short bursts and large decimations where frames stay
  in VMEM.

* ``pallas_quad_demod`` — quadrature FM discriminator with a polynomial
  atan2 (the reference gets ~4x from `fast-math` atan2,
  src/quadrature_demod.rs:28-29; on TPU the win is smaller since XLA's
  atan2 is vectorized, but the fused conj-multiply + polynomial keeps
  everything in VMEM in one pass).

Both fall back to the XLA ops on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------- demod

_PI = np.float32(np.pi)


def _atan_poly(z):
    """Minimax-ish arctan approximation on [-1, 1] (|err| < 1e-4 rad),
    the classic 7th-order odd polynomial used by fast-math libraries."""
    z2 = z * z
    return z * (
        jnp.float32(0.9998660)
        + z2
        * (
            jnp.float32(-0.3302995)
            + z2 * (jnp.float32(0.1801410) + z2 * (jnp.float32(-0.0851330) + z2 * jnp.float32(0.0208351)))
        )
    )


def fast_atan2(y, x):
    """Branch-free atan2 via the octant reduction + odd polynomial."""
    abs_y = jnp.abs(y)
    abs_x = jnp.abs(x)
    # z in [0, 1]: ratio of smaller to larger magnitude
    mx = jnp.maximum(abs_x, abs_y)
    mn = jnp.minimum(abs_x, abs_y)
    z = mn / jnp.maximum(mx, jnp.float32(1e-37))
    a = _atan_poly(z)
    a = jnp.where(abs_y > abs_x, jnp.float32(np.pi / 2) - a, a)
    a = jnp.where(x < 0, _PI - a, a)
    return jnp.where(y < 0, -a, a)


def _quad_kernel(re_ref, im_ref, pre_ref, pim_ref, out_ref, *, gain):
    re = re_ref[:]
    im = im_ref[:]
    re_prev = pre_ref[:]
    im_prev = pim_ref[:]
    # conj(prev) * cur
    dr = re_prev * re + im_prev * im
    di = re_prev * im - im_prev * re
    out_ref[:] = jnp.float32(gain) * fast_atan2(di, dr)


def pallas_quad_demod(x, gain: float = 1.0, tile_rows: int = 1024):
    """Quadrature demod with fast polynomial atan2 (one fused VPU pass).

    Same stream semantics as ops.quadrature_demod: N-1 outputs,
    y[n] = gain * atan2(im, re) of conj(x[n]) x[n+1].  Accuracy ~1e-4 rad
    (the reference's fast-math atan2 trades the same).  Tiled over a 1-D
    grid with (tile_rows, 128) VMEM blocks.
    """
    x = jnp.asarray(x, jnp.complex64)
    if not _on_tpu():
        d = jnp.conj(x[:-1]) * x[1:]
        return jnp.float32(gain) * fast_atan2(
            jnp.imag(d).astype(jnp.float32), jnp.real(d).astype(jnp.float32)
        )
    n = x.shape[0]
    width = 128
    chunk = tile_rows * width
    rows_total = -(-n // width)
    pad = rows_total * width - n
    re = jnp.pad(jnp.real(x), (0, pad))
    im = jnp.pad(jnp.imag(x), (0, pad))
    # prev stream: x shifted right by one (XLA handles the shift; the
    # kernel then reads aligned tiles only).
    pre = jnp.pad(jnp.real(x), (1, pad))[:-1]
    pim = jnp.pad(jnp.imag(x), (1, pad))[:-1]
    grid_rows = -(-rows_total // tile_rows)
    rpad = grid_rows * tile_rows - rows_total

    def as2d(a):
        return jnp.pad(a.reshape(rows_total, width), ((0, rpad), (0, 0)))

    import functools as _ft

    out = pl.pallas_call(
        _ft.partial(_quad_kernel, gain=gain),
        out_shape=jax.ShapeDtypeStruct((grid_rows * tile_rows, width), jnp.float32),
        grid=(grid_rows,),
        in_specs=[
            pl.BlockSpec((tile_rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_specs=pl.BlockSpec(
            (tile_rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(as2d(re), as2d(im), as2d(pre), as2d(pim))
    del chunk
    return out.reshape(-1)[1 : n]


# ---------------------------------------------------------------- FIR

def _fir_deci_kernel(frames_ref, taps_ref, out_ref):
    # frames: (TILE, L*deci) window per output sample; taps: (L*deci, 1)
    out_ref[:] = jnp.dot(
        frames_ref[:], taps_ref[:], preferred_element_type=jnp.float32
    )


def pallas_fir_decimate(x, taps, deci: int, tile: int = 512):
    """Decimating real FIR on the MXU: y[m] = sum_j taps[j] x[m*deci - j].

    Full-conv alignment (zero history) like fir_filter_full.  Real f32
    path; complex inputs are filtered as two real streams.
    """
    taps = np.asarray(taps)
    if np.iscomplexobj(taps) or jnp.iscomplexobj(x):
        xr = jnp.real(x).astype(jnp.float32)
        xi = jnp.imag(x).astype(jnp.float32)
        tr, ti = np.real(taps).astype(np.float32), np.imag(taps).astype(np.float32)
        rr = pallas_fir_decimate(xr, tr, deci, tile)
        if not np.any(ti):
            ri = pallas_fir_decimate(xi, tr, deci, tile)
            return jax.lax.complex(rr, ri)
        ii = pallas_fir_decimate(xi, ti, deci, tile)
        ri = pallas_fir_decimate(xr, ti, deci, tile)
        ir = pallas_fir_decimate(xi, tr, deci, tile)
        return jax.lax.complex(rr - ii, ri + ir)

    x = jnp.asarray(x, jnp.float32)
    taps = taps.astype(np.float32)
    n = x.shape[0]
    ntaps = len(taps)
    m = -(-n // deci)  # outputs
    # window length per output, rounded up to a multiple of deci
    wlen = -(-ntaps // deci) * deci
    # frames[m] = xpad[m*deci : m*deci + wlen] reversed  -> y = frames @ taps_rev
    # Build frames via the same reshape trick as overlap-save: stride deci.
    left = wlen - 1  # zero history
    total = m * deci
    xp = jnp.pad(x, (left, total + wlen - 1 - n - left + 1))
    # frame m covers xp[m*deci : m*deci + wlen]; as (m, deci) rows plus
    # wlen/deci - 1 extra row-chunks: use overlapping reshape columns.
    ncols = wlen // deci
    rows = [
        jax.lax.dynamic_slice_in_dim(xp, c * deci, total).reshape(m, deci)
        for c in range(ncols)
    ]
    frames = jnp.concatenate(rows, axis=1)  # (m, wlen), frame m = xp[m*deci:...]
    # y[m] = sum_j taps[j] * xpad_global[m*deci - j]
    #      = sum_k tapsrev_padded[k] * xp[m*deci + k]  with
    # tapsrev_padded[k] = taps[wlen-1-k] (zero-padded to wlen)
    tr = np.zeros(wlen, np.float32)
    tr[wlen - ntaps :] = taps[::-1]
    if not _on_tpu():
        return frames @ jnp.asarray(tr)
    # Align the contraction dim to the 128-lane MXU tile.
    wpad = (-wlen) % 128
    if wpad:
        frames = jnp.pad(frames, ((0, 0), (0, wpad)))
        tr = np.pad(tr, (0, wpad))
    w2 = wlen + wpad
    mt = -(-m // tile) * tile
    frames = jnp.pad(frames, ((0, mt - m), (0, 0)))
    taps_mat = np.zeros((w2, 128), np.float32)
    taps_mat[:, 0] = tr
    out = pl.pallas_call(
        _fir_deci_kernel,
        out_shape=jax.ShapeDtypeStruct((mt, 128), jnp.float32),
        grid=(mt // tile,),
        in_specs=[
            pl.BlockSpec((tile, w2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(frames, jnp.asarray(taps_mat))
    return out[:m, 0]

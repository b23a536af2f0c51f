"""Hand-written Pallas TPU kernels for the hot ops.

Three kernels:

* ``pallas_fir_decimate`` — decimating FIR as a banded MXU matmul with
  in-kernel frame construction.  The stream is viewed as rows of 128
  samples; a tile of 128 consecutive outputs is ``sum_j S_j @ W_j`` where
  ``S_j`` is a deci-strided row slice of the tile's input rows (built in
  VMEM, never materialized in HBM) and ``W_j`` is a precomputed banded
  128x128 weight matrix holding the reversed taps on a ``deci``-pitch
  diagonal.  HBM traffic is just the input once + output once.  At
  stride 1 the band is nearly dense, so this also serves LONG filters
  (~3x the overlap-save FFT path at 1205 taps).

* ``pallas_fm_chain`` — the whole FM receive chain (banded FIR on both
  planar f32 I/Q streams + quadrature discriminator with polynomial
  atan2) in ONE memory pass: two plane reads + one audio write
  (~9 B/input sample at deci 4).  The headline bench.py kernel.

* ``pallas_quad_demod`` — standalone quadrature FM discriminator with a
  polynomial atan2 (the reference gets ~4x from `fast-math` atan2,
  src/quadrature_demod.rs:28-29; the fused conj-multiply + polynomial
  keeps everything in VMEM in one pass).

All fall back to the XLA ops on non-TPU backends.  doc/performance.md
records the measured rates, the precision rules, and the compile-time
hazard of mixing these with HIGHEST convs in one program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# When True, the TPU kernel paths run under Pallas interpret mode (pure
# CPU emulation) instead of falling back to the XLA forms — lets the CPU
# test suite cover the actual kernel bodies, tilings, and seam fixes
# (tests/test_pallas_interpret.py).  Never set outside tests.
_INTERPRET = False


def _on_tpu() -> bool:
    if _INTERPRET:
        return True
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


def _quad_kernel(re_ref, im_ref, out_ref, *, gain):
    re = re_ref[:]
    im = im_ref[:]
    # previous sample in row-major flat order, built from single-step
    # lane/sublane rotations (same trick as the fused FM chain) — no
    # shifted input copies ever touch HBM.  Each tile's first element
    # wraps garbage; the caller recomputes the g-1 seam outputs in XLA.
    lane = jax.lax.broadcasted_iota(jnp.int32, re.shape, 1)

    def prev_of(y):
        rot = pltpu.roll(y, 1, 1)
        return jnp.where(lane == 0, pltpu.roll(rot, 1, 0), rot)

    re_prev = prev_of(re)
    im_prev = prev_of(im)
    # conj(prev) * cur
    dr = re_prev * re + im_prev * im
    di = re_prev * im - im_prev * re
    out_ref[:] = jnp.float32(gain) * fast_atan2(di, dr)


def pallas_quad_demod(x, gain: float = 1.0, tile_rows: int = 1024):
    """Quadrature demod with fast polynomial atan2 (one fused VPU pass).

    Same stream semantics as ops.quadrature_demod: N-1 outputs,
    y[n] = gain * atan2(im, re) of conj(x[n]) x[n+1].  Accuracy ~1e-4 rad
    (the reference's fast-math atan2 trades the same).  Tiled over a 1-D
    grid with (tile_rows, 128) VMEM blocks; the previous-sample stream is
    built in VMEM from rotations (r3 — the r2 version materialized two
    extra shifted planes in HBM, ~16 B/sample of avoidable traffic).
    """
    x = jnp.asarray(x, jnp.complex64)
    if not _on_tpu():
        d = jnp.conj(x[:-1]) * x[1:]
        return jnp.float32(gain) * fast_atan2(
            jnp.imag(d).astype(jnp.float32), jnp.real(d).astype(jnp.float32)
        )
    n = x.shape[0]
    width = 128
    rows_total = -(-n // width)
    pad = rows_total * width - n
    re = jnp.pad(jnp.real(x), (0, pad))
    im = jnp.pad(jnp.imag(x), (0, pad))
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
            for _ in range(2)
        ],
        out_specs=pl.BlockSpec(
            (tile_rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=_INTERPRET,
    )(as2d(re), as2d(im))
    out = out.reshape(-1)
    if grid_rows > 1:
        # tile seams: output t0 = 128*tile_rows*k needs conj(x[t0-1])x[t0]
        seams = np.arange(1, grid_rows) * (tile_rows * width)
        seams = seams[seams < n]
        if seams.size:
            idx = jnp.asarray(seams)
            d = jnp.conj(x[idx - 1]) * x[idx]
            vals = jnp.float32(gain) * fast_atan2(
                jnp.imag(d).astype(jnp.float32), jnp.real(d).astype(jnp.float32)
            )
            out = out.at[idx].set(vals)
    return out[1:n]


# ---------------------------------------------------------------- FIR

def _shift_blocks(xm_ref, xh_ref, *, deci, nshift, nq, rows):
    """The tile's shift blocks: (A, w_row_start, k) triples, all plain
    lane-aligned slices of the deci-flattened view.

    Output row r, lane o (sample m = 128*(tile_row0 + r) + o) needs input
    positions p = deci*m .. deci*m + wlen-1, i.e. shift rows s =
    0..nshift-1 of the (rows+nq, deci*128) flattened view X2, where shift
    s lives at X2[r + s//deci, 128*(s%deci) : 128*(s%deci+1)].  Full
    groups of ``deci`` shifts collapse into ONE (rows, deci*128) row slice
    (q in range(nshift//deci)); the ragged tail shifts are 128-lane
    column slices.  This keeps K = nshift*128 = ceil((127*deci+wlen)/128)
    *128 — the banded formulation's minimum — instead of rounding the
    shift count up to a multiple of deci (r2 did, costing 1.6x MXU work
    at deci=4/49 taps).  NO concatenation: Mosaic cannot concat slices
    with different sublane offsets (measured INTERNAL error); each block
    feeds its own dot and the f32 accumulators add.
    """
    X = jnp.concatenate([xm_ref[:], xh_ref[: nq * deci]], axis=0)
    step = deci * 128
    X2 = X.reshape(rows + nq, step)
    out = []
    nfull = nshift // deci
    for q in range(nfull):
        out.append((X2[q : q + rows], q * step, step))
    for s in range(nfull * deci, nshift):
        q, d = divmod(s, deci)
        out.append((X2[q : q + rows, 128 * d : 128 * (d + 1)], s * 128, 128))
    return out


def _fir_band_kernel(xm_ref, xh_ref, w_ref, out_ref, *, deci, nshift, nq, rows):
    # One dot per shift block; HIGHEST = multi-pass bf16 (the MXU's default
    # single bf16 pass costs ~0.5% error, far over the framework's 1e-3
    # parity budget).
    acc = jnp.zeros((rows, 128), jnp.float32)
    for A, k0, k in _shift_blocks(xm_ref, xh_ref, deci=deci, nshift=nshift,
                                  nq=nq, rows=rows):
        acc = acc + jnp.dot(
            A,
            w_ref[k0 : k0 + k],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    out_ref[:] = acc


def _fir_band_weights(taps: np.ndarray, deci: int):
    """Banded weight stack (nshift*128, 128):
    W[128*s + l, o] = taps_rev[128*s + l - deci*o]."""
    ntaps = len(taps)
    wlen = -(-ntaps // deci) * deci
    trp = np.zeros(wlen, np.float32)
    trp[wlen - ntaps :] = taps[::-1]
    nshift = (deci * 127 + wlen - 1) // 128 + 1
    nq = -(-nshift // deci)  # halo rows still come in groups of deci
    w = np.zeros((nshift, 128, 128), np.float32)
    s, l, o = np.ogrid[:nshift, :128, :128]
    k = s * 128 + l - deci * o
    valid = (k >= 0) & (k < wlen)
    w[valid] = trp[k[valid]]
    return wlen, nshift, nq, w.reshape(nshift * 128, 128)


def pallas_fir_decimate(x, taps, deci: int, tile_rows: int | None = None):
    """Decimating real FIR on the MXU: y[m] = sum_j taps[j] x[m*deci - j].

    Full-conv alignment (zero history) like fir_filter_full.  Real f32
    path; complex inputs are filtered as two real streams — measured
    FASTER than a fused two-output two-plane kernel (18.9 vs 8.7 Gsps at
    601 taps: independent single-plane launches pipeline DMA/compute
    against each other, while one doubled-footprint kernel starves the
    grid pipeline; fusion pays only when it removes intermediate HBM
    round trips, as in pallas_fm_chain).  HBM traffic is input + output
    only — frames exist only as VMEM row slices.
    """
    taps = np.asarray(taps)
    if np.iscomplexobj(taps) or jnp.iscomplexobj(x):
        xr = jnp.real(x).astype(jnp.float32)
        xi = jnp.imag(x).astype(jnp.float32)
        tr, ti = np.real(taps).astype(np.float32), np.imag(taps).astype(np.float32)
        rr = pallas_fir_decimate(xr, tr, deci, tile_rows)
        if not np.any(ti):
            ri = pallas_fir_decimate(xi, tr, deci, tile_rows)
            return jax.lax.complex(rr, ri)
        ii = pallas_fir_decimate(xi, ti, deci, tile_rows)
        ri = pallas_fir_decimate(xr, ti, deci, tile_rows)
        ir = pallas_fir_decimate(xi, tr, deci, tile_rows)
        return jax.lax.complex(rr - ii, ri + ir)

    x = jnp.asarray(x, jnp.float32)
    taps = taps.astype(np.float32)
    n = x.shape[0]
    ntaps = len(taps)
    m = -(-n // deci)  # outputs
    wlen = -(-ntaps // deci) * deci
    left = wlen - 1  # zero history
    if not _on_tpu():
        # Host fallback: materialized frames (fine at test sizes).
        total = m * deci
        xp = jnp.pad(x, (left, total + wlen - n - left))
        cols = [
            jax.lax.dynamic_slice_in_dim(xp, c * deci, total).reshape(m, deci)
            for c in range(wlen // deci)
        ]
        frames = jnp.concatenate(cols, axis=1)
        trp = np.zeros(wlen, np.float32)
        trp[wlen - ntaps :] = taps[::-1]
        return frames @ jnp.asarray(trp)

    wlen, nshift, nq, w = _fir_band_weights(taps, deci)
    if tile_rows is None:
        tile_rows = _pick_tile_rows(deci, nshift, nq, w.nbytes)
    tile_rows = max(tile_rows, nq)
    tile_rows += (-tile_rows) % 16  # keep main/halo block rows 8-divisible
    return _banded_call(
        x, w, deci, nq, wlen, tile_rows,
        functools.partial(_fir_band_kernel, deci=deci, nshift=nshift, nq=nq,
                          rows=tile_rows),
    )


def _pick_tile_rows(deci: int, nshift: int, nq: int, w_bytes: int) -> int:
    """Default tile height for the banded kernels.

    1024 rows amortizes the grid pipeline best (measured), but two
    scoped-VMEM effects cap it for long filters:

    * each shift block lives as a (tile_rows, ...) operand, ~tile_rows *
      nshift * 512 B at f32 total, plus the double-buffered input/output
      blocks and the weight stack;
    * _banded_tiling's halo fallback: when (tile_rows*deci) % hrows != 0
      the halo block becomes a FULL extra input tile — a 2467-tap deci-1
      filter measured 17.4 MB that way (over the 16 MB limit, a latent
      OOM for any >~2000-tap banded filter until r3).

    So pick the largest tile <= 1024 that (a) keeps the halo aligned
    (tile_rows*deci divisible by hrows — the halo then stays nq*deci
    rows) and (b) fits a ~14 MB budget model calibrated on the measured
    OOM and known-good points.
    """
    import math

    hrows = nq * deci + (-(nq * deci)) % 8
    # scoped ~= 512*tile*(nshift + deci + 10) + w_bytes, calibrated on the
    # measured 16.28 MB @ (tile 960, nshift 21, deci 1) and the known-good
    # deci-4 points; 13 MB budget leaves margin under the 16 MB limit
    budget = 13 << 20
    cap = (budget - w_bytes) // (512 * (nshift + deci + 10))
    tile = min(1024, max(64, cap))
    # alignment: tile*deci % hrows == 0  <=>  tile % (hrows/gcd) == 0
    r = hrows // math.gcd(hrows, deci)
    L = 16 * r // math.gcd(16, r)  # lcm(16, r)
    if L <= tile:
        return (tile // L) * L
    return tile + (-tile) % 16  # accept the full-halo fallback (small tile)


def _banded_tiling(x, deci, nq, wlen, tile_rows, pad_value=0):
    """Shared tiling/padding for the banded kernels: returns
    (x2d, hrows, g, m) — the padded (in_rows, 128) input view, the halo
    block height, the grid size, and the output count.  ``pad_value`` is
    the encoding of sample 0 (e.g. -1 for the s8 wire-grid planes)."""
    n = x.shape[0]
    m = -(-n // deci)
    left = wlen - 1
    hrows = nq * deci + (-(nq * deci)) % 8
    mrows = -(-m // 128)
    g = -(-mrows // tile_rows)
    in_rows = g * tile_rows * deci + hrows
    if (tile_rows * deci) % hrows:
        hrows = tile_rows * deci
        in_rows = (g + 1) * tile_rows * deci
    xp = jnp.pad(x, (left, in_rows * 128 - n - left),
                 constant_values=pad_value)
    return xp.reshape(in_rows, 128), hrows, g, m


def _banded_call(x, w, deci, nq, wlen, tile_rows, kern):
    x2d, hrows, g, m = _banded_tiling(x, deci, nq, wlen, tile_rows)
    hblocks_per_tile = tile_rows * deci // hrows
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((g * tile_rows, 128), jnp.float32),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((tile_rows * deci, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (hrows, 128),
                lambda i: ((i + 1) * hblocks_per_tile, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(np.shape(w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=_INTERPRET,
    )(x2d, x2d, jnp.asarray(w))
    return out.reshape(-1)[:m]


# ----------------------------------------------------- fused FM chain


def _prev_demod(yr, yi, rows, gain):
    """Quadrature discriminator on filtered planes held in VMEM: the
    previous sample in row-major flat order is lane o-1 of the same row,
    or lane 127 of the previous row — built from single-step lane/sublane
    rotations (Mosaic has no narrow-column concat).  Each tile's first
    element wraps garbage; callers recompute those g-1 boundary outputs
    in XLA (two tiny dot products each)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)

    def prev_of(y):
        rot = pltpu.roll(y, 1, 1)
        return jnp.where(lane == 0, pltpu.roll(rot, 1, 0), rot)

    pr = prev_of(yr)
    pi = prev_of(yi)
    dr = pr * yr + pi * yi
    di = pr * yi - pi * yr
    return jnp.float32(gain) * fast_atan2(di, dr)


def _fm_chain_kernel(off_ref, xr_ref, xrh_ref, xi_ref, xih_ref, w_ref,
                     out_ref, *, deci, nshift, nq, rows, gain, precision,
                     tapsum):
    K = nshift * 128

    def fir(xm_ref, xh_ref):
        acc = jnp.zeros((rows, 128), jnp.float32)
        for A, k0, k in _shift_blocks(xm_ref, xh_ref, deci=deci,
                                      nshift=nshift, nq=nq, rows=rows):
            if precision in ("w2", "w3"):
                # bf16-EXACT input path (8-bit-sourced data is exactly
                # representable in bf16): the only rounding left is on the
                # static taps, pre-split into 2-3 exact bf16 terms — so
                # "w3" reaches f32-level accuracy in 3 single MXU passes
                # (vs HIGHEST's ~4) AND halves the HBM plane traffic.
                nterms = 2 if precision == "w2" else 3
                for t in range(nterms):
                    acc = acc + jnp.dot(
                        A, w_ref[t * K + k0 : t * K + k0 + k],
                        preferred_element_type=jnp.float32,
                    )
            elif precision == "split3":
                # manual hi/lo bf16 split of BOTH sides: 3 single-pass MXU
                # dots instead of HIGHEST's 4 — worst-case demod error
                # ~3e-3 rad (atan2 amplification at near-zero filtered
                # samples); fine for constant-modulus FM
                W = w_ref[k0 : k0 + k]
                Ah = A.astype(jnp.bfloat16)
                Al = (A - Ah.astype(jnp.float32)).astype(jnp.bfloat16)
                Wh = W.astype(jnp.bfloat16)
                Wl = (W - Wh.astype(jnp.float32)).astype(jnp.bfloat16)
                acc = acc + jnp.dot(Ah, Wh, preferred_element_type=jnp.float32)
                acc = acc + jnp.dot(Ah, Wl, preferred_element_type=jnp.float32)
                acc = acc + jnp.dot(Al, Wh, preferred_element_type=jnp.float32)
            else:
                acc = acc + jnp.dot(
                    A,
                    w_ref[k0 : k0 + k],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
        # input offset (SMEM scalar, normally 0): DC correction, and the
        # bench hook (varied per timing iteration so XLA can't hoist the
        # call).  The FIR is linear, so filter(x + c) = filter(x) +
        # c*sum(taps) — folding POST-dot replaces a full VPU pass over the
        # input with one scalar multiply-add, and keeps the bf16-exact
        # input path exact for non-bf16 DC offsets (e.g. rtl-sdr's 127.4).
        return acc + off_ref[0] * jnp.float32(tapsum)

    yr = fir(xr_ref, xrh_ref)
    yi = fir(xi_ref, xih_ref)
    out_ref[:] = _prev_demod(yr, yi, rows, gain)


def _fm_i8_kernel(off_ref, xr_ref, xrh_ref, xi_ref, xih_ref, w_ref,
                  out_ref, *, deci, nshift, nq, rows, gain, scales, tapsum):
    """int8-MXU variant: s8 planes x scaled-s8 tap terms, EXACT int32
    accumulation (|acc| <= K*128*127 < 2^24, so the s32->f32 cast is
    exact too).  int8 MXU passes run at 2x the bf16 rate and the planes
    are 1 B/sample of HBM.  The wire grid's +1 shift (si8 = x*128 - 1)
    folds post-dot with the DC offset, by linearity."""
    K = nshift * 128
    dc = (jnp.float32(1.0 / 128.0) + off_ref[0]) * jnp.float32(tapsum)

    def fir(xm_ref, xh_ref):
        blocks = _shift_blocks(xm_ref, xh_ref, deci=deci, nshift=nshift,
                               nq=nq, rows=rows)
        acc = jnp.zeros((rows, 128), jnp.float32)
        for t in range(len(scales)):
            ai = jnp.zeros((rows, 128), jnp.int32)
            for A, k0, k in blocks:
                ai = ai + jnp.dot(
                    A, w_ref[t * K + k0 : t * K + k0 + k],
                    preferred_element_type=jnp.int32,
                )
            acc = acc + jnp.float32(scales[t] / 128.0) * ai.astype(jnp.float32)
        return acc + dc

    yr = fir(xr_ref, xrh_ref)
    yi = fir(xi_ref, xih_ref)
    out_ref[:] = _prev_demod(yr, yi, rows, gain)


def _banded_acc(X2, w_ref, *, deci, nshift, nq, rows, precision, scales=()):
    """FIR accumulator over one plane held in VMEM ALREADY in the
    deci-flattened ``(rows + halo, deci*128)`` layout — the db pipeline
    DMAs straight into it (the HBM-side reshape is a bitcast), so no
    in-kernel relayout/concat pass ever touches the input.  The shift
    blocks are lane-aligned slices (see _shift_blocks), each feeding its
    own MXU dot per precision term."""
    K = nshift * 128
    step = deci * 128
    blocks = []
    nfull = nshift // deci
    for q in range(nfull):
        blocks.append((X2[q : q + rows], q * step, step))
    for s in range(nfull * deci, nshift):
        q, d = divmod(s, deci)
        blocks.append((X2[q : q + rows, 128 * d : 128 * (d + 1)], s * 128, 128))

    if precision == "i8":
        acc = jnp.zeros((rows, 128), jnp.float32)
        for t in range(len(scales)):
            ai = jnp.zeros((rows, 128), jnp.int32)
            for A, k0, k in blocks:
                ai = ai + jnp.dot(
                    A, w_ref[t * K + k0 : t * K + k0 + k],
                    preferred_element_type=jnp.int32,
                )
            acc = acc + jnp.float32(scales[t] / 128.0) * ai.astype(jnp.float32)
        return acc
    acc = jnp.zeros((rows, 128), jnp.float32)
    if precision in ("w2", "w3"):
        nterms = 2 if precision == "w2" else 3
        for A, k0, k in blocks:
            for t in range(nterms):
                acc = acc + jnp.dot(
                    A, w_ref[t * K + k0 : t * K + k0 + k],
                    preferred_element_type=jnp.float32,
                )
    elif precision == "split3":
        for A, k0, k in blocks:
            W = w_ref[k0 : k0 + k]
            Ah = A.astype(jnp.bfloat16)
            Al = (A - Ah.astype(jnp.float32)).astype(jnp.bfloat16)
            Wh = W.astype(jnp.bfloat16)
            Wl = (W - Wh.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = acc + jnp.dot(Ah, Wh, preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(Ah, Wl, preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(Al, Wh, preferred_element_type=jnp.float32)
    else:
        for A, k0, k in blocks:
            acc = acc + jnp.dot(
                A, w_ref[k0 : k0 + k],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
    return acc


def _prev_demod_carry(yr, yi, rows, gain, pr0, pi0):
    """_prev_demod with the cross-tile seam fixed IN-KERNEL: the tile's
    first element takes the previous tile's last filtered sample from the
    loop carry (pr0, pi0) instead of the roll wrap-around garbage."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)

    def prev_of(y, p0):
        rot = pltpu.roll(y, 1, 1)
        rot = jnp.where(lane == 0, pltpu.roll(rot, 1, 0), rot)
        return jnp.where((lane == 0) & (row == 0), p0, rot)

    pr = prev_of(yr, pr0)
    pi = prev_of(yi, pi0)
    dr = pr * yr + pi * yi
    di = pr * yi - pi * yr
    return jnp.float32(gain) * fast_atan2(di, dr)


def _fm_chain_db_kernel(off_ref, row0_ref, seed_ref, xr_hbm, xi_hbm, w_ref,
                        out_hbm,
                        in_s, out_s, in_sem, out_sem, *,
                        deci, nshift, nq, rows, g, hrows, gain,
                        precision, scales, tapsum):
    """Manually double-buffered FM chain: the planes stay in HBM and a
    fori_loop streams (tile + halo) windows through 2-slot VMEM scratch
    with explicit async copies.  The inputs arrive in HBM ALREADY in the
    deci-flattened (…, deci*128) layout (a free bitcast on the XLA
    side), so the kernel never pays the (N,128)→(N/deci, deci*128)
    Mosaic relayout or the tile+halo concat the grid-pipelined kernel
    does — the dots read the DMA'd buffer in place.  ``hrows`` here is
    the halo in FLATTENED rows (≥ nq, 8-aligned).

    ``row0_ref`` (SMEM int32) offsets every input window by that many
    packed rows: the windowed form (pallas_fm_chain_window) computes
    just a chunk of the output grid from a RESIDENT packed ring with no
    HBM slicing pass at all — the streaming Graph path's zero-copy
    ingest (r5).  ``seed_ref`` (SMEM (2,) f32) seeds the cross-tile
    demod carry (the previous chunk's last filtered sample, so chunked
    launches compose into one continuous stream), and the final carry
    is written to ``last_hbm`` for the next chunk.
    """
    rows_in = rows + hrows

    def in_dma(slot, i, plane, pref):
        # the dynamic window offset MUST carry an alignment hint:
        # without pl.multiple_of the Mosaic compile fails outright on
        # this toolchain (r5 bisected).  Callers keep row0 8-row aligned
        # (chunk grids are multiples of tile_rows >= 16).
        return pltpu.make_async_copy(
            pref.at[pl.ds(pl.multiple_of(row0_ref[0], 8) + i * rows,
                          rows_in)],
            in_s.at[slot, plane],
            in_sem.at[slot, plane],
        )

    def out_dma(slot, i):
        return pltpu.make_async_copy(
            out_s.at[slot],
            out_hbm.at[pl.ds(i * rows, rows)],
            out_sem.at[slot],
        )

    in_dma(0, 0, 0, xr_hbm).start()
    in_dma(0, 0, 1, xi_hbm).start()

    if precision == "i8":
        dc = (jnp.float32(1.0 / 128.0) + off_ref[0]) * jnp.float32(tapsum)
    else:
        dc = off_ref[0] * jnp.float32(tapsum)

    def body(i, carry):
        pr0, pi0 = carry
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < g)
        def _():
            in_dma(nxt, i + 1, 0, xr_hbm).start()
            in_dma(nxt, i + 1, 1, xi_hbm).start()

        in_dma(slot, i, 0, xr_hbm).wait()
        in_dma(slot, i, 1, xi_hbm).wait()

        @pl.when(i >= 2)
        def _():
            out_dma(slot, i - 2).wait()

        yr = _banded_acc(in_s[slot, 0], w_ref, deci=deci, nshift=nshift,
                         nq=nq, rows=rows, precision=precision,
                         scales=scales) + dc
        yi = _banded_acc(in_s[slot, 1], w_ref, deci=deci, nshift=nshift,
                         nq=nq, rows=rows, precision=precision,
                         scales=scales) + dc
        # cross-tile seam handled by the loop carry: no host-side
        # recompute/scatter pass over the output
        audio = _prev_demod_carry(yr, yi, rows, gain, pr0, pi0)

        @pl.when(slot == 0)
        def _():
            out_s[0] = audio

        @pl.when(slot == 1)
        def _():
            out_s[1] = audio

        out_dma(slot, i).start()
        return yr[rows - 1, 127], yi[rows - 1, 127]

    jax.lax.fori_loop(0, g, body, (seed_ref[0], seed_ref[1]))

    @pl.when(g >= 2)
    def _():
        out_dma(g % 2, g - 2).wait()

    out_dma((g - 1) % 2, g - 1).wait()


def _w_split_bf16(w: np.ndarray, terms: int) -> np.ndarray:
    """Static exact bf16 split of the weight matrix: w == sum(parts) to
    ~2^-27 relative (3 x 8 mantissa bits covers f32's 24).  numpy-only so
    it can run under a jit trace."""
    import ml_dtypes

    parts = []
    r = w.astype(np.float32)
    for _ in range(terms):
        h = r.astype(ml_dtypes.bfloat16)
        parts.append(h)
        r = r - h.astype(np.float32)
    return np.concatenate([p.reshape(w.shape) for p in parts], axis=0)


def _w_split_s8(w: np.ndarray, terms: int):
    """Scaled-s8 ladder of the static weight matrix: w ~= sum_k d_k s_k
    with s_k int8 and d_k f32 scalars.  Residual after 3 terms is
    ~(1/254)^3 of max|w| — below the f32 rounding of the taps themselves.
    Returns (concat of the s_k along axis 0, scales tuple)."""
    r = w.astype(np.float64)
    mats, scales = [], []
    for _ in range(terms):
        m = np.max(np.abs(r))
        if m == 0:
            m = 1.0
        d = np.float32(m / 127.0)
        s = np.clip(np.round(r / np.float64(d)), -127, 127).astype(np.int8)
        mats.append(s)
        scales.append(float(d))
        r = r - s.astype(np.float64) * np.float64(d)
    return np.concatenate(mats, axis=0), tuple(scales)


def _to_s8(x):
    """f32 wire-grid plane ((u8 - 127)/128 levels) -> its exact s8 image
    u8 - 128.  Off-grid values are clamped to the nearest level."""
    return (
        jnp.clip(jnp.round(jnp.asarray(x, jnp.float32) * 128.0), -127.0, 128.0)
        .astype(jnp.int32) - 1
    ).astype(jnp.int8)


def _fm_pack_geometry(n: int, taps, deci: int, tile_rows: int | None):
    """Shared geometry for the packed-plane format: returns
    (wlen, nshift, nq, nqp, tile_rows, g, m, step, total_samples)."""
    taps = np.asarray(taps)
    wlen, nshift, nq, _w = _fir_band_weights(np.real(taps).astype(np.float32),
                                             deci)
    if tile_rows is None:
        tile_rows = 1024
    tile_rows = max(tile_rows, nq)
    tile_rows += (-tile_rows) % 16
    m = -(-n // deci)
    g = -(-(-(-m // 128)) // tile_rows)
    nqp = nq + (-nq) % 8
    step = deci * 128
    total = (g * tile_rows + nqp) * step
    return wlen, nshift, nq, nqp, tile_rows, g, m, step, total


def fm_plane_pack(x, taps, deci: int, tile_rows: int | None = None,
                  precision: str = "w3"):
    """Pack one I/Q plane into the fused FM kernel's HBM-resident format.

    The double-buffered kernel streams (tile + halo) windows of a
    deci-flattened ``(rows, deci*128)`` array; materializing that tiled
    layout from a flat plane costs a full relayout pass (~20 Gsps worth
    at w3 — the dominant wrapper cost).  A receiver that WRITES this
    format at ingest (the u8 normalize pass touches every sample anyway)
    feeds the kernel at its native ~84 Gsps w3 / ~113 w2 rate.

    Pass the result as ``pallas_fm_chain(packed_r, packed_i, ..., n=n)``
    with the true sample count.  dtype follows ``precision``: bf16 for
    w2/w3 (exact for 8-bit-sourced wire grids), s8 for i8, f32 otherwise.
    """
    x = jnp.asarray(x)
    n = x.shape[0]
    wlen, _nsh, _nq, _nqp, tile_rows, _g, _m, step, total = _fm_pack_geometry(
        n, taps, deci, tile_rows
    )
    if precision == "i8":
        x = _to_s8(x)
        pad_value = -1
    elif precision in ("w2", "w3"):
        x = x.astype(jnp.bfloat16)
        pad_value = 0
    else:
        x = x.astype(jnp.float32)
        pad_value = 0
    xp = jnp.pad(x, (wlen - 1, total - n - (wlen - 1)),
                 constant_values=pad_value)
    return xp.reshape(-1, step)


def _fm_chain_weights(taps: np.ndarray, deci: int, precision: str):
    """Shared weight-stack builder for the fused FM kernels: returns
    (wlen, nshift, nq, wmat, scales) with the precision split applied."""
    wlen, nshift, nq, w = _fir_band_weights(taps, deci)
    scales = ()
    if precision == "i8":
        wcat, scales = _w_split_s8(w, 3)
        wmat = jnp.asarray(wcat)
    elif precision in ("w2", "w3"):
        wmat = jnp.asarray(_w_split_bf16(w, 2 if precision == "w2" else 3))
    else:
        wmat = jnp.asarray(w)
    return wlen, nshift, nq, wmat, scales


def pallas_fm_chain_window(xpr, xpi, taps, deci: int, gain: float = 1.0, *,
                           row0, g: int, tile_rows: int = 1024,
                           precision: str = "w3", offset=0.0,
                           seed=(0.0, 0.0)):
    """The db FM kernel over a WINDOW of resident packed planes.

    ``xpr``/``xpi`` — full packed planes (fm_plane_pack layout) living in
    HBM; ``row0`` — traced int32 packed-row offset (= output-row offset:
    one packed row is deci*128 inputs and 128 outputs), which MUST be a
    multiple of 8 (the DMA index carries a pl.multiple_of hint — an
    unhinted dynamic offset fails the Mosaic compile); ``g`` — static
    tile count.  Computes output rows [row0, row0 + g*tile_rows) with NO
    slicing/copy pass on the HBM side: the kernel's DMA reads the ring
    in place at the offset (the r5 zero-copy streaming ingest).

    Returns ``(audio, last)``: the flat (g*tile_rows*128,) demod stream
    where element j is demod(y[row0*128 + j - 1], y[row0*128 + j]) with
    the j=0 pair's left side taken from ``seed`` (pass the previous
    chunk's carried filtered sample so chunked launches compose into one
    continuous stream; at stream start the zero seed makes element 0
    meaningless — drop it), and ``last`` = (2,) f32, this window's final
    filtered sample for the next chunk's seed.  The window (incl. its
    trailing halo rows) must lie within the packed planes.
    """
    taps = np.asarray(taps)
    if np.iscomplexobj(taps):
        taps = np.real(taps)
    taps = taps.astype(np.float32)
    wlen, nshift, nq, wmat, scales = _fm_chain_weights(taps, deci, precision)
    nqp = nq + (-nq) % 8
    step = deci * 128
    tile_rows = max(tile_rows, nq)
    tile_rows += (-tile_rows) % 16
    tapsum = float(np.sum(taps, dtype=np.float64))
    kern_db = functools.partial(
        _fm_chain_db_kernel, deci=deci, nshift=nshift, nq=nq,
        rows=tile_rows, g=g, hrows=nqp, gain=gain,
        precision=precision, scales=scales, tapsum=tapsum,
    )
    off = jnp.asarray(offset, jnp.float32).reshape(1)
    r0 = jnp.asarray(row0, jnp.int32).reshape(1)
    audio = pl.pallas_call(
        kern_db,
        out_shape=jax.ShapeDtypeStruct((g * tile_rows, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 2, tile_rows + nqp, step), xpr.dtype),
            pltpu.VMEM((2, tile_rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_INTERPRET,
    )(off, r0, jnp.asarray(seed, jnp.float32).reshape(2), xpr, xpi, wmat)
    return audio.reshape(-1)


def pallas_fm_chain(xr, xi, taps, deci: int, gain: float = 1.0,
                    tile_rows: int | None = None, offset=0.0,
                    precision: str = "highest", pipeline: str | None = None,
                    n: int | None = None):
    """The whole FM receive chain in ONE memory pass: banded MXU FIR
    low-pass + decimate on both I/Q planes, then the quadrature
    discriminator with polynomial atan2 — all in VMEM per tile.

    HBM traffic is the two input planes read once and the f32 audio
    written once (~9 B/input sample at deci=4 for f32 planes, ~5 B for
    bf16), vs ~3x that for the separate-kernels path.

    Planar inputs (the natural SDR wire format; also what the axon tunnel
    requires).  Real taps only — callers with complex taps split them.
    Output: m-1 samples where m = ceil(n/deci), equal to
    ``quadrature_demod(fir_decimate(x), gain)``.

    ``precision``:

    * ``"highest"`` (default) — f32 planes, multi-pass bf16 dots; max
      demod error ~2e-5 rad vs float64.
    * ``"split3"`` — f32 planes, manual 3-pass hi/lo split; ~3e-3 rad
      worst case (near-zero filtered samples), fine for constant-modulus
      FM.
    * ``"w3"`` / ``"w2"`` — planes are cast to **bf16**; ONLY exact for
      8-bit-sourced data ((u8 - 127) grids are exactly representable in
      bf16 — the rtl-sdr wire format, reference src/rtlsdr_decode.rs).
      The static taps are pre-split into 3 (or 2) exact bf16 terms, so
      "w3" reaches ~1e-5 rad accuracy in 3 single MXU passes while
      halving plane HBM traffic: the measured sweet spot (~50 Gsps on
      v5e vs ~23 for "highest").  "w2" trades to ~2.4e-3 rad for ~59.
      Any DC offset (e.g. the 127.4 rtl-sdr convention) must ride the
      ``offset`` scalar — it folds in AFTER the dots, exactly.
    * ``"i8"`` — planes are mapped to **int8** (exact for the same 8-bit
      wire grid: si8 = x*128 - 1 = u8 - 128; off-grid values clamp), the
      taps into 3 scaled-s8 terms, and every dot accumulates EXACTLY in
      int32 (|acc| <= K*128*127 < 2^24).  ~3e-5 rad vs float64.  int8
      MXU passes run at 2x the bf16 rate and planes are 1 B/sample of
      HBM — quarter the "w3" plane traffic.
    """
    taps = np.asarray(taps)
    if np.iscomplexobj(taps):
        if np.any(np.imag(taps)):
            raise ValueError("pallas_fm_chain needs real taps")
        taps = np.real(taps)
    taps = taps.astype(np.float32)
    exact_input = precision in ("w2", "w3")
    int8_input = precision == "i8"
    packed = getattr(xr, "ndim", 1) == 2
    if packed:
        # planes arrive in the kernel-resident format (fm_plane_pack):
        # no per-call cast/pad/relayout passes at all
        if n is None:
            raise ValueError("packed planes need the true sample count n=")
        if not _on_tpu():
            raise ValueError("packed planes are a TPU-only format")
        if pipeline is None:
            pipeline = "db"
        if pipeline != "db":
            raise ValueError("packed planes require the db pipeline")
    else:
        if exact_input:
            xr = jnp.asarray(xr).astype(jnp.bfloat16)
            xi = jnp.asarray(xi).astype(jnp.bfloat16)
        else:
            xr = jnp.asarray(xr, jnp.float32)
            xi = jnp.asarray(xi, jnp.float32)
        n = xr.shape[0]
        if pipeline is None:
            # from flat planes the grid pipeline wins: the db form needs
            # the deci-flattened layout, whose per-call materialization
            # costs more than it saves (measured; see fm_plane_pack)
            pipeline = "grid"
    off = jnp.asarray(offset, jnp.float32).reshape(1)
    tapsum = float(np.sum(taps, dtype=np.float64))
    if not _on_tpu():
        y = jax.lax.complex(
            pallas_fir_decimate(xr.astype(jnp.float32), taps, deci)
            + off[0] * jnp.float32(tapsum),
            pallas_fir_decimate(xi.astype(jnp.float32), taps, deci)
            + off[0] * jnp.float32(tapsum),
        )
        d = jnp.conj(y[:-1]) * y[1:]
        return jnp.float32(gain) * fast_atan2(
            jnp.imag(d).astype(jnp.float32), jnp.real(d).astype(jnp.float32)
        )

    wlen, nshift, nq, wmat, scales = _fm_chain_weights(taps, deci, precision)
    if tile_rows is None:
        # largest tile that fits the 16 MB scoped-VMEM budget with double
        # buffering (measured: 1024 rows ~ 10 MB live, 2048 OOMs at f32;
        # bigger tiles amortize the grid pipeline ~1.6x over 512)
        tile_rows = 1024
    tile_rows = max(tile_rows, nq)
    tile_rows += (-tile_rows) % 16
    if pipeline == "db":
        # Manually double-buffered streaming (see _fm_chain_db_kernel):
        # planes stay HBM-resident in the deci-flattened packed layout;
        # explicit async copies overlap the next tile's DMA (incl. its
        # halo, contiguous in the window) with the current tile's dots.
        nqp = nq + (-nq) % 8  # flattened halo rows, 8-aligned for DMA
        step = deci * 128
        m = -(-n // deci)
        g = -(-(-(-m // 128)) // tile_rows)
        if packed:
            want = (g * tile_rows + nqp, step)
            if tuple(xr.shape) != want or tuple(xi.shape) != want:
                raise ValueError(
                    f"packed plane shape {tuple(xr.shape)} != {want} for "
                    f"n={n}, deci={deci}, tile_rows={tile_rows}"
                )
            xpr, xpi = xr, xi
        else:
            xpr = fm_plane_pack(xr, taps, deci, tile_rows, precision)
            xpi = fm_plane_pack(xi, taps, deci, tile_rows, precision)
        kern_db = functools.partial(
            _fm_chain_db_kernel, deci=deci, nshift=nshift, nq=nq,
            rows=tile_rows, g=g, hrows=nqp, gain=gain,
            precision=precision, scales=scales, tapsum=tapsum,
        )
        audio = pl.pallas_call(
            kern_db,
            out_shape=jax.ShapeDtypeStruct((g * tile_rows, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, 2, tile_rows + nqp, step), xpr.dtype),
                pltpu.VMEM((2, tile_rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=_INTERPRET,
        )(off, jnp.zeros(1, jnp.int32), jnp.zeros(2, jnp.float32),
          xpr, xpi, wmat)
        # cross-tile seams are fixed in-kernel (loop carry); the first
        # global output (zero history) is dropped below
        return audio.reshape(-1)[1:m]
    else:
        if int8_input:
            # kernel planes: exact s8 image, zero history = pad -1; the
            # f32 planes stay live for the seam windows below
            kr, ki = _to_s8(xr), _to_s8(xi)
            xr2d, hrows, g, m = _banded_tiling(kr, deci, nq, wlen, tile_rows,
                                               pad_value=-1)
            xi2d, _, _, _ = _banded_tiling(ki, deci, nq, wlen, tile_rows,
                                           pad_value=-1)
            kern = functools.partial(
                _fm_i8_kernel, deci=deci, nshift=nshift, nq=nq,
                rows=tile_rows, gain=gain, scales=scales, tapsum=tapsum,
            )
        else:
            xr2d, hrows, g, m = _banded_tiling(xr, deci, nq, wlen, tile_rows)
            xi2d, _, _, _ = _banded_tiling(xi, deci, nq, wlen, tile_rows)
            kern = functools.partial(
                _fm_chain_kernel, deci=deci, nshift=nshift, nq=nq,
                rows=tile_rows, gain=gain, precision=precision,
                tapsum=tapsum,
            )
        hblocks_per_tile = tile_rows * deci // hrows
        main_spec = pl.BlockSpec(
            (tile_rows * deci, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        halo_spec = pl.BlockSpec(
            (hrows, 128), lambda i: ((i + 1) * hblocks_per_tile, 0),
            memory_space=pltpu.VMEM,
        )
        audio = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((g * tile_rows, 128), jnp.float32),
            grid=(g,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                main_spec,
                halo_spec,
                main_spec,
                halo_spec,
                pl.BlockSpec(wmat.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile_rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            interpret=_INTERPRET,
        )(off, xr2d, xr2d, xi2d, xi2d, wmat)
    audio = audio.reshape(-1)
    if g > 1:
        # Cross-tile boundary outputs (one per tile seam): recompute the
        # two filtered samples y[t0-1], y[t0] straight from the input —
        # a (2(g-1), ntaps) @ (ntaps,) dot, negligible next to the kernel.
        ntaps = len(taps)
        trev = jnp.asarray(taps[::-1].copy())
        seams = np.arange(1, g) * (tile_rows * 128)
        starts = np.concatenate([(seams - 1) * deci, seams * deci]) - (ntaps - 1)
        # y[t] = dot(x[t*deci-ntaps+1 : t*deci+1], reversed taps).  Seam
        # windows are interior (no zero history needed) and read straight
        # from the unpadded planes — padding the full plane here would
        # materialize a second copy of the input just for these slices.
        win_r = jnp.stack(
            [jax.lax.dynamic_slice_in_dim(xr, int(s), ntaps) for s in starts]
        )
        win_i = jnp.stack(
            [jax.lax.dynamic_slice_in_dim(xi, int(s), ntaps) for s in starts]
        )
        yb_r = jnp.dot(win_r + off[0], trev, precision=jax.lax.Precision.HIGHEST)
        yb_i = jnp.dot(win_i + off[0], trev, precision=jax.lax.Precision.HIGHEST)
        k = len(seams)
        yrl, yil = yb_r[:k], yb_i[:k]      # y[t0-1] per seam
        yrf, yif = yb_r[k:], yb_i[k:]      # y[t0] per seam
        dr = yrl * yrf + yil * yif
        di = yrl * yif - yil * yrf
        vals = jnp.float32(gain) * fast_atan2(di, dr)
        audio = audio.at[jnp.asarray(seams)].set(vals)
    return audio[1:m]

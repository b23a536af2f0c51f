"""FM receive chains (the reference's rtl_fm.rs example path).

``fm_demod_chain`` is the framework's headline benchmark kernel: channel
low-pass (overlap-save FFT) + decimation + quadrature demod, fully fused
under jit — the per-chip Msamples/s metric in bench.py runs this.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import taps as tapgen
from .. import ops
from ..dtypes import stage_iq


@functools.partial(
    jax.jit, static_argnames=("samp_rate", "cutoff", "twidth", "deci", "gain")
)
def _fm_demod_chain(
    iq,
    samp_rate: float = 1_024_000.0,
    cutoff: float = 100_000.0,
    twidth: float = 50_000.0,
    deci: int = 4,
    gain: float = 1.0,
):
    """IQ -> FM audio: fused channel low-pass + decimation + quadrature
    demod.  On TPU the filter runs as the banded MXU FIR kernel
    (ops/pallas_kernels.py, memory-bound, ~3x the overlap-save FFT path);
    elsewhere as frequency-domain decimation (spectrum folding — strided
    slices would lower to gathers)."""
    from ..ops.fft_filter import fft_filter_decimate
    from ..ops.pallas_kernels import _on_tpu, pallas_fir_decimate

    lp = tapgen.low_pass_complex(samp_rate, cutoff, twidth, "hamming")
    x = jnp.asarray(iq, jnp.complex64)
    # The banded kernel's whole weight stack lives in VMEM, so it only fits
    # (and only wins) for short-to-medium filters; long tap sets (narrow
    # transition widths) go through the FFT path, which handles any count.
    if _on_tpu() and len(lp) <= 1024:
        y = pallas_fir_decimate(x, lp, deci)
    else:
        y = fft_filter_decimate(x, lp, deci)
    return ops.quadrature_demod(y, gain)


def fm_demod_chain(
    iq,
    samp_rate: float = 1_024_000.0,
    cutoff: float = 100_000.0,
    twidth: float = 50_000.0,
    deci: int = 4,
    gain: float = 1.0,
):
    """Public entry: stages host complex input as f32 pairs (some TPU
    transports cannot transfer complex64) and runs the jitted chain."""
    return _fm_demod_chain(stage_iq(iq), samp_rate, cutoff, twidth, deci, gain)


def fm_pack_planes(
    i,
    q,
    samp_rate: float = 1_024_000.0,
    cutoff: float = 100_000.0,
    twidth: float = 50_000.0,
    deci: int = 4,
    precision: str = "w3",
):
    """Ingest: flat I/Q planes -> the fused kernel's HBM-resident packed
    format (ops.fm_plane_pack) + the true sample count.

    A receiver writes this layout where it normalizes the SDR's u8 wire
    bytes (one pass that touches every sample anyway); the chain then
    runs at its kernel-native rate with no per-call relayout.  Feed the
    result to :func:`fm_demod_chain_planar` with ``n=``.
    """
    from .. import ops

    lp = np.asarray(tapgen.low_pass_complex(samp_rate, cutoff, twidth, "hamming"))
    n = jnp.asarray(i).shape[0]
    taps = np.real(lp)
    return (
        ops.fm_plane_pack(i, taps, deci, precision=precision),
        ops.fm_plane_pack(q, taps, deci, precision=precision),
        n,
    )


@functools.partial(
    jax.jit,
    static_argnames=("samp_rate", "cutoff", "twidth", "deci", "gain",
                     "precision", "n"),
)
def fm_demod_chain_planar(
    i,
    q,
    samp_rate: float = 1_024_000.0,
    cutoff: float = 100_000.0,
    twidth: float = 50_000.0,
    deci: int = 4,
    gain: float = 1.0,
    precision: str = "highest",
    dc_offset: float = 0.0,
    n: int | None = None,
):
    """Planar-input FM chain: the fastest TPU path.

    Takes separate I/Q streams (the SDR wire format, and what the axon
    tunnel transfers) and runs the WHOLE chain — banded MXU FIR low-pass
    + decimate + quadrature demod — as ONE fused Pallas kernel
    (ops.pallas_fm_chain): two planes read from HBM once, audio written
    once, nothing else touches HBM.  For 8-bit-sourced data on the
    (u8-127)/128 wire grid pass ``precision="w3"`` (bf16-exact planes,
    ~2.3x the f32 path) or ``"i8"`` (int8-MXU planes, exact s32
    accumulation, 2x pass rate + 1/4 the plane HBM), with any DC
    convention (e.g. (x-127.4)/128) riding ``dc_offset`` — it folds in
    post-dot, exactly.
    Falls back to the composed complex chain off-TPU or for long/complex
    tap sets.
    """
    from ..ops.pallas_kernels import _on_tpu, pallas_fm_chain

    lp = np.asarray(tapgen.low_pass_complex(samp_rate, cutoff, twidth, "hamming"))
    if getattr(i, "ndim", 1) == 2:
        # packed planes from fm_pack_planes: kernel-native fast path
        return pallas_fm_chain(i, q, np.real(lp), deci, gain,
                               offset=dc_offset, precision=precision, n=n)
    if _on_tpu() and len(lp) <= 1024 and not np.any(np.imag(lp)):
        return pallas_fm_chain(i, q, np.real(lp), deci, gain,
                               offset=dc_offset, precision=precision)
    # Composed fallback with the SAME numerical contract as the fused
    # kernel: w-precisions quantize the planes to bf16 (exact for 8-bit-
    # sourced data, the documented domain), and the DC offset folds in
    # AFTER the filter (filter(x + c) = filter(x) + c*sum(taps), with the
    # zero-padded history offset too — matching the kernel's fold).
    from ..ops.fft_filter import fft_filter_decimate

    i32 = jnp.asarray(i).astype(jnp.float32)
    q32 = jnp.asarray(q).astype(jnp.float32)
    if precision in ("w2", "w3"):
        i32 = i32.astype(jnp.bfloat16).astype(jnp.float32)
        q32 = q32.astype(jnp.bfloat16).astype(jnp.float32)
    elif precision == "i8":
        # the s8 wire grid: clip(round(x*128), -127, 128)/128 — identity
        # for 8-bit-sourced data, matching the kernel's _to_s8 mapping
        i32 = jnp.clip(jnp.round(i32 * 128), -127, 128) * jnp.float32(1 / 128)
        q32 = jnp.clip(jnp.round(q32 * 128), -127, 128) * jnp.float32(1 / 128)
    y = fft_filter_decimate(jax.lax.complex(i32, q32), lp, deci)
    y = y + jnp.asarray(dc_offset, jnp.float32) * jnp.complex64(
        complex(np.sum(lp)) * (1 + 1j)
    )
    return ops.quadrature_demod(y, gain)


@functools.partial(jax.jit, static_argnames=("samp_rate", "audio_rate", "volume"))
def _am_rx(iq, samp_rate, audio_rate, volume):
    lp = tapgen.low_pass_complex(samp_rate, 12_500.0, 10_000.0, "hamming")
    x = ops.filter_complex(iq, lp)
    env = jnp.abs(x)
    lp2 = tapgen.low_pass(samp_rate, audio_rate, 500.0, "hamming")
    audio = ops.filter_float(env, lp2)
    audio = ops.rational_resampler(audio, int(audio_rate), int(samp_rate))
    return audio * jnp.float32(volume)


def am_rx(
    iq,
    samp_rate: float,
    audio_rate: float = 48_000.0,
    volume: float = 1.0,
):
    """AM receiver (reference examples/airspy_am_decode.rs:48-83):
    12.5 kHz channel filter -> envelope (|x|) -> audio low-pass ->
    resample to audio rate -> volume.  One jit; staged complex input."""
    return _am_rx(stage_iq(iq), float(samp_rate), float(audio_rate), float(volume))


def wbfm_rx(
    iq,
    samp_rate: float,
    audio_rate: float = 48_000.0,
    channel_width: float = 100_000.0,
):
    """Broadcast WBFM: channelize, demod, resample to audio, deemphasize.
    One jit; staged complex input."""
    return _wbfm_rx(stage_iq(iq), float(samp_rate), float(audio_rate), float(channel_width))


@functools.partial(
    jax.jit, static_argnames=("samp_rate", "audio_rate", "channel_width")
)
def _wbfm_rx(iq, samp_rate, audio_rate, channel_width):
    lp = tapgen.low_pass_complex(samp_rate, channel_width, channel_width / 4, "hamming")
    x = ops.filter_complex(iq, lp)
    quad_rate = samp_rate
    demod = ops.quadrature_demod(x, float(quad_rate / (2 * np.pi * 75_000.0)))
    audio = ops.rational_resampler(demod, int(audio_rate), int(samp_rate))
    # 75 us deemphasis single-pole IIR
    dt = 1.0 / audio_rate
    alpha = float(dt / (75e-6 + dt))
    return ops.single_pole_iir(audio, alpha)

"""Pallas kernels: numerical equivalence (CPU fallback paths; the TPU
compiled paths were verified on hardware — see commit log)."""

import numpy as np

from rustradio_tpu import ops
from rustradio_tpu.ops.pallas_kernels import (
    fast_atan2,
    pallas_fir_decimate,
    pallas_quad_demod,
)


def test_fast_atan2_accuracy():
    rng = np.random.RandomState(0)
    y = rng.randn(10000).astype(np.float32)
    x = rng.randn(10000).astype(np.float32)
    got = np.asarray(fast_atan2(y, x))
    want = np.arctan2(y, x)
    assert np.abs(got - want).max() < 2e-4


def test_fast_atan2_axes():
    # exact axes and quadrant boundaries
    pts = [(0.0, 1.0, 0.0), (1.0, 0.0, np.pi / 2), (0.0, -1.0, np.pi),
           (-1.0, 0.0, -np.pi / 2), (1.0, 1.0, np.pi / 4)]
    for y, x, want in pts:
        got = float(np.asarray(fast_atan2(np.float32(y), np.float32(x))))
        assert abs(got - want) < 2e-4, (y, x, got, want)


def test_pallas_quad_demod_matches():
    rng = np.random.RandomState(1)
    x = (rng.randn(4096) + 1j * rng.randn(4096)).astype(np.complex64)
    got = np.asarray(pallas_quad_demod(x, 0.7))
    want = np.asarray(ops.quadrature_demod(x, 0.7))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_pallas_fir_decimate_matches():
    from rustradio_tpu import taps as tg

    rng = np.random.RandomState(2)
    lp = tg.low_pass_complex(1_024_000.0, 100_000.0, 50_000.0)
    x = (rng.randn(4096) + 1j * rng.randn(4096)).astype(np.complex64)
    got = np.asarray(pallas_fir_decimate(x, lp, 4))
    want = np.asarray(ops.fir_filter_full(x, lp, deci=4))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_fir_decimate_real():
    rng = np.random.RandomState(3)
    x = rng.randn(1000).astype(np.float32)
    taps = rng.randn(21).astype(np.float32)
    got = np.asarray(pallas_fir_decimate(x, taps, 3))
    want = np.asarray(ops.fir_filter_full(x, taps, deci=3))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_fir_decimate_tail_shifts():
    # deci/ntaps combos whose shift count is NOT a multiple of deci
    # exercise the ragged 128-lane tail blocks of the banded layout
    rng = np.random.RandomState(4)
    for deci, ntaps in [(2, 33), (3, 49), (4, 49), (5, 128), (7, 300)]:
        x = rng.randn(5000).astype(np.float32)
        taps = (rng.randn(ntaps) / ntaps).astype(np.float32)
        got = np.asarray(pallas_fir_decimate(x, taps, deci))
        want = np.asarray(ops.fir_filter_full(x, taps, deci=deci))
        np.testing.assert_allclose(got, want, atol=1e-4, err_msg=f"{deci}/{ntaps}")


def test_fm_chain_w3_parity_budget():
    """precision="w3" must stay within the framework's 1e-3 rad parity
    budget vs float64 on its contract domain: 8-bit-grid input (exact in
    bf16).  Measured on v5e hardware: max 1.25e-5 rad at 50.3 Gsps (the
    r3 headline); this CPU test exercises the same quantize-and-split
    semantics through the fallback path."""
    from rustradio_tpu import taps as tg
    from rustradio_tpu.ops.pallas_kernels import pallas_fm_chain

    rng = np.random.RandomState(5)
    n = 1 << 15
    deci = 4
    lp = np.real(np.asarray(
        tg.low_pass_complex(1_024_000.0, 100_000.0, 50_000.0, "hamming"))
    ).astype(np.float32)
    xr = np.clip(np.round(0.3 * rng.randn(n) * 128), -128, 127).astype(np.float32) / 128
    xi = np.clip(np.round(0.3 * rng.randn(n) * 128), -128, 127).astype(np.float32) / 128
    got = np.asarray(pallas_fm_chain(xr, xi, lp, deci, 1.0, precision="w3"))
    x64 = xr.astype(np.float64) + 1j * xi.astype(np.float64)
    yd = np.convolve(x64, lp.astype(np.float64))[np.arange(-(-n // deci)) * deci]
    d = np.conj(yd[:-1]) * yd[1:]
    want = np.arctan2(d.imag, d.real)
    L = min(len(got), len(want))
    err = np.abs(got[8:L - 8] - want[8:L - 8]).max()
    assert err < 1e-3, err


def test_fm_chain_offset_folds_exactly():
    # filter(x + c) == filter(x) + c*sum(taps): the offset scalar rides
    # POST-dot (one multiply-add per output, not a VPU pass over input).
    # Compared against float64 ground truth of the offset signal with a
    # DC-passing low-pass, so the filtered samples sit well away from the
    # atan2 singularity.
    from rustradio_tpu import taps as tg
    from rustradio_tpu.ops.pallas_kernels import pallas_fm_chain

    rng = np.random.RandomState(6)
    n = 1 << 13
    deci = 4
    lp = np.real(np.asarray(
        tg.low_pass_complex(1_024_000.0, 100_000.0, 50_000.0, "hamming"))
    ).astype(np.float32)
    xr = (0.2 * rng.randn(n)).astype(np.float32)
    xi = (0.2 * rng.randn(n)).astype(np.float32)
    c = 0.37
    got = np.asarray(pallas_fm_chain(xr, xi, lp, deci, 1.0, offset=c))
    x64 = (xr + c).astype(np.float64) + 1j * (xi + c).astype(np.float64)
    yd = np.convolve(x64, lp.astype(np.float64))[np.arange(-(-n // deci)) * deci]
    d = np.conj(yd[:-1]) * yd[1:]
    want = np.arctan2(d.imag, d.real)
    # skip the zero-history warm-up: the kernel's DC fold offsets the
    # synthetic history too (c*sum(taps) uniformly), while np.convolve's
    # implied history stays zero — they agree only once the filter fills
    warm = len(lp) // deci + 2
    L = min(len(got), len(want))
    np.testing.assert_allclose(got[warm:L - 8], want[warm:L - 8], atol=3e-4)

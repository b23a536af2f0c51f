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

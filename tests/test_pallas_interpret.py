"""Run the REAL Pallas kernel bodies under interpret mode on CPU.

The CPU suite otherwise never executes the TPU kernel code (``_on_tpu()``
routes to XLA fallbacks), so tilings, banded weight layouts, shift-block
slicing, roll-based prev-sample construction, and the cross-tile seam
fixes had no CI coverage.  ``pallas_kernels._INTERPRET`` forces the
kernel paths through ``pl.pallas_call(interpret=True)`` — pure CPU
emulation, compared here against float64 ground truth.
"""

import numpy as np
import pytest

import rustradio_tpu.ops.pallas_kernels as pk


@pytest.fixture
def interpret_kernels(monkeypatch):
    monkeypatch.setattr(pk, "_INTERPRET", True)


def _fir_deci_f64(x, taps, deci):
    """y[m] = sum_j taps[j] x[m*deci - j], zero history, f64."""
    x = np.asarray(x, np.float64)
    t = np.asarray(taps, np.float64)
    m = -(-len(x) // deci)
    xp = np.concatenate([np.zeros(len(t), np.float64), x,
                         np.zeros(deci * m, np.float64)])
    return np.stack(
        [np.dot(t, xp[len(t) + k * deci : len(t) + k * deci - len(t) : -1])
         for k in range(m)]
    )


def test_fir_decimate_interpret_multi_tile(interpret_kernels):
    rng = np.random.RandomState(0)
    taps = rng.randn(49).astype(np.float32)
    # 3 tiles of tile_rows=128 at deci=4 plus a ragged tail: covers the
    # grid loop, the halo block, and the full-group + column-slice shifts
    n = 3 * 128 * 128 * 4 + 777
    x = rng.randn(n).astype(np.float32)
    got = np.asarray(pk.pallas_fir_decimate(x, taps, 4, tile_rows=128))
    want = _fir_deci_f64(x, taps, 4)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5 * np.abs(want).max())


def test_fir_decimate_interpret_deci1_long_taps(interpret_kernels):
    rng = np.random.RandomState(1)
    taps = rng.randn(130).astype(np.float32)  # nshift 2 at deci 1
    n = 2 * 128 * 128 + 55
    x = rng.randn(n).astype(np.float32)
    got = np.asarray(pk.pallas_fir_decimate(x, taps, 1, tile_rows=128))
    want = _fir_deci_f64(x, taps, 1)
    np.testing.assert_allclose(got, want, atol=2e-5 * np.abs(want).max())


def test_quad_demod_interpret_seams(interpret_kernels):
    rng = np.random.RandomState(2)
    n = 2 * 128 * 128 + 100
    x = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64)
    got = np.asarray(pk.pallas_quad_demod(x, 0.7, tile_rows=128))
    d = np.conj(x[:-1].astype(np.complex128)) * x[1:].astype(np.complex128)
    want = 0.7 * np.arctan2(d.imag, d.real)
    assert got.shape == want.shape
    # fast_atan2 polynomial: |err| < ~1e-4 rad
    np.testing.assert_allclose(got, want, atol=2e-4)


def _fm_chain_f64(xr, xi, taps, deci, gain):
    yr = _fir_deci_f64(xr, taps, deci)
    yi = _fir_deci_f64(xi, taps, deci)
    y = yr + 1j * yi
    d = np.conj(y[:-1]) * y[1:]
    return gain * np.arctan2(d.imag, d.real)


@pytest.mark.parametrize(
    "precision,atol",
    [("highest", 2e-4), ("w3", 3e-4), ("w2", 8e-3), ("split3", 8e-3),
     ("i8", 3e-4)],
)
def test_fm_chain_interpret_all_precisions(interpret_kernels, precision, atol):
    rng = np.random.RandomState(3)
    n = 2 * 128 * 128 * 4 + 123  # 2 full tiles at tile_rows=128 + tail
    # 8-bit wire grid: exact in bf16 — required by the w3/w2 modes
    a = (rng.randint(0, 256, n).astype(np.float32) - 127.0) / 128.0
    b = (rng.randint(0, 256, n).astype(np.float32) - 127.0) / 128.0
    taps = np.asarray(
        np.hamming(49) * np.sinc(0.2 * (np.arange(49) - 24)), np.float32
    )
    got = np.asarray(
        pk.pallas_fm_chain(a, b, taps, 4, 0.9, tile_rows=128,
                           precision=precision)
    )
    want = _fm_chain_f64(a, b, taps, 4, 0.9)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=atol)


@pytest.mark.parametrize("deci,ntaps", [(1, 31), (1, 128), (4, 128)])
def test_fm_chain_interpret_i8_deci_taps_matrix(interpret_kernels, deci,
                                                ntaps):
    # the i8 ladder must stay exact-int32 across decimations and tap
    # counts (|acc| bound scales with K = nshift*128)
    rng = np.random.RandomState(6)
    n = 128 * 128 * deci + 57
    a = (rng.randint(0, 256, n).astype(np.float32) - 127.0) / 128.0
    b = (rng.randint(0, 256, n).astype(np.float32) - 127.0) / 128.0
    taps = np.asarray(
        np.hamming(ntaps) * np.sinc(0.18 * (np.arange(ntaps) - ntaps // 2)),
        np.float32,
    )
    got = np.asarray(
        pk.pallas_fm_chain(a, b, taps, deci, 0.8, tile_rows=128,
                           precision="i8")
    )
    want = _fm_chain_f64(a, b, taps, deci, 0.8)
    np.testing.assert_allclose(got, want, atol=1e-3)
    assert float(np.max(np.abs(got - want))) < 5e-4


@pytest.mark.parametrize("precision", ["w3", "i8"])
def test_fm_chain_interpret_offset_fold(interpret_kernels, precision):
    # DC offset folds in post-dot: filter(x + c) = filter(x) + c*sum(taps)
    rng = np.random.RandomState(4)
    n = 128 * 128 * 4
    a = (rng.randint(0, 256, n).astype(np.float32) - 127.0) / 128.0
    b = (rng.randint(0, 256, n).astype(np.float32) - 127.0) / 128.0
    taps = np.asarray(np.hamming(33), np.float32)
    c = 0.3125  # exact bf16 so the f64 model sees the same value
    got = np.asarray(
        pk.pallas_fm_chain(a, b, taps, 4, 1.0, tile_rows=128, offset=c,
                           precision=precision)
    )
    want = _fm_chain_f64(a.astype(np.float64) + c, b.astype(np.float64) + c,
                         taps, 4, 1.0)
    # skip the zero-history warm-up: the kernel's DC fold applies c under
    # the pad region too (documented; same skip as tests/test_pallas.py)
    warm = -(-len(taps) // 4)
    np.testing.assert_allclose(got[warm:], want[warm:], atol=3e-4)


@pytest.mark.parametrize(
    "precision,atol",
    [("highest", 2e-4), ("w3", 3e-4), ("w2", 8e-3), ("split3", 8e-3),
     ("i8", 3e-4)],
)
def test_fm_chain_db_packed_interpret(interpret_kernels, precision, atol):
    # the double-buffered pipeline fed pre-packed planes (fm_plane_pack):
    # in-kernel seam carry + manual DMA loop, all precisions
    rng = np.random.RandomState(4)
    n = 3 * 128 * 128 * 4 + 57  # 3 tiles at tile_rows=128 + ragged tail
    a = (rng.randint(0, 256, n).astype(np.float32) - 127.0) / 128.0
    b = (rng.randint(0, 256, n).astype(np.float32) - 127.0) / 128.0
    taps = np.asarray(
        np.hamming(49) * np.sinc(0.2 * (np.arange(49) - 24)), np.float32
    )
    pa = pk.fm_plane_pack(a, taps, 4, tile_rows=128, precision=precision)
    pb = pk.fm_plane_pack(b, taps, 4, tile_rows=128, precision=precision)
    got = np.asarray(
        pk.pallas_fm_chain(pa, pb, taps, 4, 0.9, tile_rows=128,
                           precision=precision, n=n)
    )
    want = _fm_chain_f64(a, b, taps, 4, 0.9)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=atol)
    # and the db pipeline from FLAT planes matches too (slow path)
    got2 = np.asarray(
        pk.pallas_fm_chain(a, b, taps, 4, 0.9, tile_rows=128,
                           precision=precision, pipeline="db")
    )
    np.testing.assert_allclose(got2, want, atol=atol)

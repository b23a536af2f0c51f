"""Filter-design math vs the reference's golden values.

Golden low-pass table from reference src/fir.rs:947-980; Hamming window
3-tap example from src/window.rs:25; tolerance 1e-3 mirrors the reference's
assert_almost_equal (src/lib.rs:824-856) but we hold taps to much tighter
bounds since the math is bit-for-bit float32.
"""

import numpy as np

from rustradio_tpu import taps, windows

GOLDEN_LOW_PASS_10K_1K_1K = np.array(
    [
        0.002010403, 0.0016210203, 7.851862e-10, -0.0044467063, -0.011685465,
        -0.018134259, -0.016773716, -3.6538055e-9, 0.0358771, 0.08697697,
        0.14148787, 0.18345332, 0.19922684, 0.1834533, 0.14148785,
        0.08697697, 0.035877097, -3.6538053e-9, -0.016773716, -0.018134257,
        -0.011685458, -0.0044467044, 7.851859e-10, 0.0016210207, 0.002010403,
    ],
    dtype=np.float32,
)


def test_hamming_window_3():
    w = windows.hamming(3)
    np.testing.assert_allclose(w, [0.0869565, 1.0, 0.0869565], atol=1e-6)


def test_one_tap_windows_are_unity():
    for name in ("hamming", "blackman", "blackman_harris"):
        np.testing.assert_array_equal(windows.make_window(name, 1), [1.0])


def test_window_lengths():
    for name in ("hamming", "blackman", "blackman_harris"):
        for n in (0, 1, 2, 5, 64):
            assert len(windows.make_window(name, n)) == n


def test_compute_ntaps():
    # 53 * 10000 / (22 * 1000) = 24.09 -> 24 -> 25 (forced odd)
    assert taps.compute_ntaps(10000.0, 1000.0, "hamming") == 25


def test_low_pass_golden():
    # The reference's golden table (src/fir.rs:947-980) was generated with
    # Hamming a0=0.54, while its current code uses 25/46; its own test passes
    # only because assert_almost_equal tolerance is 1e-3 (src/lib.rs:824-856).
    # We match the *code* (25/46) and use the same 1e-3 tolerance here.
    got = taps.low_pass(10000.0, 1000.0, 1000.0, "hamming")
    assert got.dtype == np.float32
    assert len(got) == 25
    np.testing.assert_allclose(got, GOLDEN_LOW_PASS_10K_1K_1K, atol=1e-3)
    # And bit-for-bit against the 0.54-parameterized variant.
    from rustradio_tpu.windows import hamming

    win = hamming(25, 0.54)
    ref = _low_pass_with_window(10000.0, 1000.0, win)
    np.testing.assert_allclose(ref, GOLDEN_LOW_PASS_10K_1K_1K, rtol=1e-5, atol=1e-9)


def _low_pass_with_window(samp_rate, cutoff, win):
    ntaps = len(win)
    m = (ntaps - 1) // 2
    fwt0 = np.float32(2 * np.float32(np.pi) * np.float32(cutoff) / np.float32(samp_rate))
    n = np.arange(ntaps) - m
    nf = n.astype(np.float32)
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(
            n == 0, fwt0 / np.float32(np.pi) * win,
            np.sin(nf * fwt0) / (nf * np.float32(np.pi)) * win,
        ).astype(np.float32)
    fmax = t[m]
    for k in range(1, m + 1):
        fmax += np.float32(2) * t[k + m]
    return t / fmax


def test_low_pass_complex_matches_float():
    f = taps.low_pass(44100.0, 1100.0, 100.0)
    c = taps.low_pass_complex(44100.0, 1100.0, 100.0)
    assert c.dtype == np.complex64
    np.testing.assert_array_equal(c.real, f)
    np.testing.assert_array_equal(c.imag, np.zeros_like(f))


def test_low_pass_dc_gain_unity():
    t = taps.low_pass(48000.0, 4000.0, 500.0)
    # DC gain = sum of taps should be ~1 after normalization
    assert abs(t.sum() - 1.0) < 1e-4


def test_hilbert_taps_antisymmetric():
    h = taps.hilbert(65, "hamming")
    assert len(h) == 65
    mid = 32
    assert h[mid] == 0.0
    np.testing.assert_allclose(h[mid + 1 :], -h[:mid][::-1], atol=1e-7)
    # Even offsets are zero
    for i in range(2, mid + 1, 2):
        assert h[mid + i] == 0.0 and h[mid - i] == 0.0


def test_hilbert_gain_normalization():
    # Gain definition: alternating sum over odd taps normalized to 1/2
    h = taps.hilbert(65, "hamming")
    mid = 32
    g = 0.0
    for i in range(1, mid + 1):
        if i % 2 == 1:
            g = h[mid + i] - g
    assert abs(abs(g) - 0.5) < 1e-6


def test_hilbert_response_is_90deg_shift():
    # A hilbert filter applied to cos should give sin (mid-band), i.e. the
    # analytic combination should suppress negative frequencies.
    h = taps.hilbert(65, "hamming").astype(np.float64)
    n = 2048
    f = 0.1  # normalized frequency
    t = np.arange(n)
    x = np.cos(2 * np.pi * f * t)
    y = np.convolve(x, h, mode="valid")
    mid_delay = 32
    ref = np.sin(2 * np.pi * f * (t[: len(y)] + mid_delay))
    err = np.abs(y - ref)[100:-100].max()
    assert err < 0.01


def test_multiband_rejects_invalid():
    import pytest

    with pytest.raises(ValueError):
        taps.multiband([(0.0, 1.0)], 0, np.zeros(0, np.float32))
    with pytest.raises(ValueError):
        taps.multiband([(0.0, 3.0)], 8, np.ones(8, np.float32))


def test_multiband_low_band_passes_dc():
    w = windows.hamming(64)
    t = taps.multiband([(0.0, 0.2)], 64, w)
    assert t.dtype == np.complex64
    # Frequency response at DC should be much larger than in the stop band.
    H = np.fft.fft(t, 1024)
    dc = abs(H[0])
    stop = abs(H[300])
    assert dc > 10 * stop

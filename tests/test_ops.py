"""Ops vs the reference's own unit-test vectors and numpy golden models."""

import numpy as np
import pytest

from rustradio_tpu import ops


def c64(*vals):
    return np.asarray(vals, np.complex64)


# ---------------------------------------------------------------- FIR

FIR_INPUT = c64(1 + 0j, 2 + 0j, 3 + 0.2j, 4.1 + 0j, 5 + 0j, 6 + 0.2j)
FIR_TAPS = c64(0.1 + 0j, 1 + 0j, 0.2j)


def test_fir_complex_golden():
    # reference src/fir.rs:915-944
    got = np.asarray(ops.fir_filter(FIR_INPUT, FIR_TAPS, 1))
    want = c64(2.3 + 0.22j, 3.41 + 0.6j, 4.56 + 0.6j, 5.6 + 0.84j)
    np.testing.assert_allclose(got, want, atol=1e-3)
    got2 = np.asarray(ops.fir_filter(FIR_INPUT, FIR_TAPS, 2))
    np.testing.assert_allclose(got2, c64(2.3 + 0.22j, 4.56 + 0.6j), atol=1e-3)


def test_fir_identity_all_deci():
    # reference src/fir.rs:686-735 (identity taps, all decimations)
    x = np.asarray(np.random.RandomState(0).randn(64), np.float32)
    for deci in range(1, 9):
        got = np.asarray(ops.fir_filter(x, np.ones(1, np.float32), deci))
        np.testing.assert_allclose(got, x[::deci], rtol=1e-6)


def test_fir_valid_semantics_vs_numpy():
    rng = np.random.RandomState(1)
    x = rng.randn(300).astype(np.float32)
    taps = rng.randn(31).astype(np.float32)
    for deci in (1, 2, 3, 7):
        got = np.asarray(ops.fir_filter(x, taps, deci))
        want = np.convolve(x, taps, mode="valid")[::deci]
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fir_full_semantics():
    rng = np.random.RandomState(2)
    x = rng.randn(100).astype(np.float32)
    taps = rng.randn(9).astype(np.float32)
    got = np.asarray(ops.fir_filter_full(x, taps))
    want = np.convolve(x, taps, mode="full")[: len(x)]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fir_translating_matches_explicit_mix():
    rng = np.random.RandomState(3)
    n = 512
    x = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64)
    from rustradio_tpu import taps as tg

    taps = tg.low_pass_complex(48000.0, 8000.0, 4000.0)
    freq, fs, deci = 6000.0, 48000.0, 2
    got = np.asarray(ops.fir_filter_translating(x, taps, fs, freq, deci))
    # Explicit: mix input by -freq, then filter.
    mixer = np.exp(-2j * np.pi * freq / fs * np.arange(n)).astype(np.complex64)
    want = np.asarray(ops.fir_filter(x * mixer, taps, deci))
    np.testing.assert_allclose(got, want, atol=2e-3)


# ---------------------------------------------------------------- FFT filter


def test_fft_filter_matches_full_conv():
    rng = np.random.RandomState(4)
    x = (rng.randn(5000) + 1j * rng.randn(5000)).astype(np.complex64)
    taps = (rng.randn(57) + 1j * rng.randn(57)).astype(np.complex64)
    got = np.asarray(ops.fft_filter(x, taps))
    want = np.convolve(x, taps, mode="full")[: len(x)]
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_fft_filter_float():
    rng = np.random.RandomState(5)
    x = rng.randn(3000).astype(np.float32)
    taps = rng.randn(33).astype(np.float32)
    got = np.asarray(ops.fft_filter_float(x, taps))
    want = np.convolve(x, taps, mode="full")[: len(x)]
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_fft_filter_suppresses_stopband():
    # reference src/fft_filter.rs:503-549 (3 kHz tone through 1 kHz LP)
    from rustradio_tpu import taps as tg

    fs = 8000.0
    taps = tg.low_pass_complex(fs, 1000.0, 100.0)
    x = np.asarray(ops.signal_source_c(8000, fs, 3000.0, 1.0))
    y = np.asarray(ops.fft_filter(x, taps))
    m = np.abs(y[len(taps) :]).max()
    assert m < 0.0002, m


# ---------------------------------------------------------------- resampler


def _counter_resample(x, interp, deci):
    # literal port of reference src/rational_resampler.rs:154-206
    import math

    g = math.gcd(interp, deci)
    interp //= g
    deci //= g
    counter = 0
    out = []
    for s in x:
        counter += interp
        while counter > 0:
            out.append(s)
            counter -= deci
    return np.asarray(out)


@pytest.mark.parametrize("interp,deci", [(1, 1), (1, 2), (1, 5), (2, 1), (3, 2), (2, 3), (7, 3), (50000, 44100), (44100, 50000), (64, 1), (1, 7)])
def test_resampler_matches_counter(interp, deci):
    x = np.arange(100, dtype=np.float32)
    got = np.asarray(ops.rational_resampler(x, interp, deci))
    want = _counter_resample(x, interp, deci)
    np.testing.assert_array_equal(got, want)


def test_resampler_deci_table():
    # reference src/rational_resampler.rs:224-247
    x = c64(1, 2, 3 + 0.2j, 4.1, 5, 6 + 0.2j)
    for deci in range(1, 8):
        got = np.asarray(ops.rational_resampler(x, 1, deci))
        np.testing.assert_array_equal(got, x[::deci])


# ---------------------------------------------------------------- demod


def test_quad_demod_golden():
    # reference src/quadrature_demod.rs:222-264
    cw = c64(1, 0.707 - 0.707j, -1j, -1)
    got = np.asarray(ops.quadrature_demod(cw, 1.0))
    np.testing.assert_allclose(
        got, [-np.pi / 4, -np.pi / 4, -np.pi / 2], atol=1e-3
    )
    ccw = c64(1, 0.707 + 0.707j, 1j, -1)
    got = np.asarray(ops.quadrature_demod(ccw, 1.0))
    np.testing.assert_allclose(got, [np.pi / 4, np.pi / 4, np.pi / 2], atol=1e-3)
    nulls = np.zeros(4, np.complex64)
    np.testing.assert_array_equal(np.asarray(ops.quadrature_demod(nulls, 1.0)), np.zeros(3))


def test_fast_fm_matches_reference_recurrence():
    rng = np.random.RandomState(6)
    x = (rng.randn(50) + 1j * rng.randn(50)).astype(np.complex64)
    got = np.asarray(ops.fast_fm(x))
    # literal recurrence (src/quadrature_demod.rs:157-165)
    q1 = q2 = 0j
    want = []
    for s in x:
        top = (s.imag - q2.imag) * q1.real
        bottom = (s.real - q2.real) * q1.imag
        q2, q1 = q1, s
        want.append(top - bottom)
    np.testing.assert_allclose(got, np.asarray(want, np.float32), atol=1e-5)


# ---------------------------------------------------------------- hilbert


def test_hilbert_matches_reference_model():
    from rustradio_tpu import taps as tg

    rng = np.random.RandomState(7)
    x = rng.randn(500).astype(np.float32)
    ntaps = 65
    got = np.asarray(ops.hilbert_transform(x, ntaps))
    h = tg.hilbert(ntaps)
    xp = np.concatenate([np.zeros(ntaps, np.float32), x])
    want_im = np.asarray(
        [np.dot(h[::-1], xp[i : i + ntaps]) for i in range(len(x))], np.float32
    )
    want_re = np.asarray([xp[i + ntaps // 2] for i in range(len(x))], np.float32)
    np.testing.assert_allclose(got.real, want_re, atol=1e-5)
    np.testing.assert_allclose(got.imag, want_im, atol=1e-4)


# ---------------------------------------------------------------- IIR


def test_single_pole_iir_golden():
    # reference src/iir_filter.rs:151-155: taps [0.9, 0.1] == alpha 0.9
    got = np.asarray(ops.single_pole_iir(np.full(4, 100.0, np.float32), 0.9))
    np.testing.assert_allclose(got, [90.0, 99.0, 99.9, 99.99], rtol=1e-5)


def test_single_pole_iir_streaming_continuation():
    x = np.random.RandomState(8).randn(100).astype(np.float32)
    full = np.asarray(ops.single_pole_iir(x, 0.3))
    a = np.asarray(ops.single_pole_iir(x[:50], 0.3))
    b = np.asarray(ops.single_pole_iir(x[50:], 0.3, y0=a[-1]))
    np.testing.assert_allclose(np.concatenate([a, b]), full, atol=1e-4)


def test_iir_filter_golden():
    # reference src/iir_filter.rs:171-194
    got = np.asarray(ops.iir_filter(np.full(4, 100.0, np.float32), [1.0, 0.9, 0.1]))
    np.testing.assert_allclose(got, [100.0, 190.0, 281.0, 371.9], rtol=1e-5)
    got = np.asarray(
        ops.iir_filter(np.asarray([100.0, 100.0, 200.0], np.float32), [1.0, 0.9, 0.1], history=[100.0, 100.0])
    )
    np.testing.assert_allclose(got, [200.0, 290.0, 481.0], rtol=1e-5)


# ---------------------------------------------------------------- bits


def test_nrzi_decode_golden():
    # reference src/nrzi.rs:80-88
    got = np.asarray(ops.nrzi_decode(np.asarray([0, 0, 0, 0, 1, 1, 1, 1], np.uint8)))
    np.testing.assert_array_equal(got, [1, 1, 1, 1, 0, 1, 1, 1])


def test_nrzi_encode_golden():
    # reference src/nrzi.rs:91-98
    got = np.asarray(ops.nrzi_encode(np.asarray([1, 1, 1, 1, 0, 1, 1, 1], np.uint8)))
    np.testing.assert_array_equal(got, [0, 0, 0, 0, 1, 1, 1, 1])


def test_nrzi_roundtrip():
    rng = np.random.RandomState(9)
    data = rng.randint(0, 2, 1000).astype(np.uint8)
    enc = np.asarray(ops.nrzi_encode(data))
    dec = np.asarray(ops.nrzi_decode(enc))
    np.testing.assert_array_equal(dec, data)


def test_descramble_matches_lfsr():
    from rustradio_tpu.ops.scramble import descramble_numpy

    rng = np.random.RandomState(10)
    x = rng.randint(0, 2, 2000).astype(np.uint8)
    got = np.asarray(ops.descramble(x))
    want = descramble_numpy(x)
    np.testing.assert_array_equal(got, want)


def test_scramble_descramble_golden():
    # reference src/descrambler.rs tests: known_good_test1
    inp = np.asarray([1, 1, 1, 1, 0, 1, 0, 1, 1, 1, 0, 1, 0, 1, 1, 0], np.uint8)
    padded = np.concatenate([inp, np.zeros(17, np.uint8)])
    scrambled, _ = ops.scramble(padded)
    got = np.asarray(scrambled)[17:]
    np.testing.assert_array_equal(
        got, [1, 1, 1, 1, 0, 1, 0, 1, 1, 1, 0, 1, 1, 0, 0, 1]
    )
    # descramble round trip
    dsc = np.asarray(ops.descramble(np.concatenate([got, np.zeros(16, np.uint8)])))
    np.testing.assert_array_equal(dsc[:16][17 - 17 :], dsc[:16])


def test_scramble_blocked_matches_scan():
    # The GF(2) block-parallel TX scrambler must be BIT-identical to the
    # per-bit scan, including the final register state, for any length
    # (tail handling) / mask / seed / resumed state.
    rng = np.random.RandomState(11)
    for n, mask, length, seed in [
        (1024, 0x21, 16, 0),
        (1500, 0x21, 16, 0x1FFFF),
        (4096 + 37, 0x21, 16, 12345),
        (2048, 0x9, 8, 3),
    ]:
        x = rng.randint(0, 2, n).astype(np.uint8)
        fast, sf = ops.scramble(x, mask, length, seed)
        slow, ss = ops.scramble(x, mask, length, seed, block=None)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))
        np.testing.assert_array_equal(np.asarray(sf), np.asarray(ss))
    # chunked streaming (state resume) == one-shot, crossing block sizes
    x = rng.randint(0, 2, 3000).astype(np.uint8)
    one, s1 = ops.scramble(x)
    outs, st = [], None
    for lo in range(0, 3000, 700):
        y, st = ops.scramble(x[lo : lo + 700], state=st, seed=0)
        outs.append(np.asarray(y))
    np.testing.assert_array_equal(np.concatenate(outs), np.asarray(one))
    np.testing.assert_array_equal(np.asarray(st), np.asarray(s1))


def test_scramble_ones_golden():
    inp = np.ones(24, np.uint8)
    padded = np.concatenate([inp, np.zeros(17, np.uint8)])
    scrambled, _ = ops.scramble(padded)
    got = np.asarray(scrambled)[17:]
    np.testing.assert_array_equal(
        got, [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1]
    )


def test_scramble_descramble_roundtrip():
    rng = np.random.RandomState(11)
    x = rng.randint(0, 2, 500).astype(np.uint8)
    sc, _ = ops.scramble(np.concatenate([x, np.zeros(17, np.uint8)]))
    dsc = np.asarray(ops.descramble(np.asarray(sc)))
    np.testing.assert_array_equal(dsc[17:], x)


def test_binary_slicer():
    got = np.asarray(ops.binary_slicer(np.asarray([-1.0, 0.0, 0.5, 2.0], np.float32)))
    np.testing.assert_array_equal(got, [0, 0, 1, 1])
    assert got.dtype == np.uint8


# ---------------------------------------------------------------- HDLC


def bits(s):
    return np.asarray([int(c) for c in s], np.uint8)


def test_hdlc_simple_frames():
    # reference src/hdlc_deframer.rs:332-373
    for s in [
        "01111110010101011110000001111110",
        "0101011111100101010111100000011111100101",
        "01111110011111100101011111100101010111100000011111100101",
    ]:
        pkts, _ = ops.hdlc_deframe(bits(s), 1, 10, keep_checksum=True)
        assert len(pkts) == 1
        np.testing.assert_array_equal(pkts[0][0], [0xAA, 0x07])

    two = "01111110010101011110000001111110010101011010101001111110"
    pkts, _ = ops.hdlc_deframe(bits(two), 1, 10, keep_checksum=True)
    assert len(pkts) == 2
    np.testing.assert_array_equal(pkts[0][0], [0xAA, 0x07])
    np.testing.assert_array_equal(pkts[1][0], [0xAA, 0x55])


def test_hdlc_bitstuffed():
    pkts, _ = ops.hdlc_deframe(
        bits("01111110111110111110111110101111110"), 1, 10, keep_checksum=True
    )
    assert len(pkts) == 1
    np.testing.assert_array_equal(pkts[0][0], [0xFF, 0xFF])


def test_hdlc_size_limits():
    b = bits("01111110111110111110111110101111110")
    assert not ops.hdlc_deframe(b, 3, 10, keep_checksum=True)[0]
    assert not ops.hdlc_deframe(b, 1, 1, keep_checksum=True)[0]


def test_hdlc_crc_check():
    # reference check_crc test: payload 0x55 with valid CRC
    pkts, stats = ops.hdlc_deframe(bits("0111111010101010000010101010111101111110"), 1, 10)
    assert len(pkts) == 1
    np.testing.assert_array_equal(pkts[0][0], [0x55])
    assert stats["decoded"] == 1


def test_crc_bitfix():
    data = np.asarray([0x55], np.uint8)
    good = ops.calc_crc(data)
    from rustradio_tpu.ops.hdlc import _find_right_crc

    nd, crc, fixed = _find_right_crc(data, good ^ 0x0001, True)
    assert fixed and nd is None and crc == good


def test_hdlc_frame_roundtrip():
    rng = np.random.RandomState(12)
    payload = rng.randint(0, 256, 30).astype(np.uint8)
    framed = ops.hdlc_frame(ops.fcs_add(payload))
    pkts, stats = ops.hdlc_deframe(framed, 1, 100)
    assert len(pkts) >= 1
    np.testing.assert_array_equal(pkts[-1][0], payload)


def test_crc_batch_matches_scalar():
    rng = np.random.RandomState(13)
    batch = rng.randint(0, 256, (20, 7)).astype(np.uint8)
    got = ops.hdlc.calc_crc_batch(batch) if hasattr(ops, "hdlc") else None
    from rustradio_tpu.ops.hdlc import calc_crc_batch

    got = calc_crc_batch(batch)
    want = [ops.calc_crc(row) for row in batch]
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------- misc


def test_correlate_access_code():
    x = np.asarray([0, 1, 0, 1, 1, 0, 1, 1, 0], np.uint8)
    code = [1, 1, 0]
    got = np.asarray(ops.correlate_access_code(x, code, 0))
    # matches end at positions where last 3 bits == code
    want = np.zeros(9, np.uint8)
    for i in range(2, 9):
        want[i] = int(list(x[i - 2 : i + 1]) == code)
    np.testing.assert_array_equal(got, want)
    # single-sample ref test: waits for full code
    got = np.asarray(ops.correlate_access_code(np.asarray([1], np.uint8), [0, 1], 0))
    np.testing.assert_array_equal(got, [0])


def test_delay_skip_head():
    x = np.arange(10, dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(ops.delay(x, 3))[:5], [0, 0, 0, 0, 1])
    np.testing.assert_array_equal(np.asarray(ops.skip(x, 4)), x[4:])
    np.testing.assert_array_equal(np.asarray(ops.head(x, 4)), x[:4])


def test_vco():
    x = np.full(100, 0.5, np.float32)
    out, ph = ops.vco(x, 2.0)
    out = np.asarray(out)
    # phase[n] = (n+1) * 1.0; out = sin + i cos
    want_phase = np.arange(1, 101, dtype=np.float64)
    np.testing.assert_allclose(out.real, np.sin(want_phase % (2 * np.pi)), atol=1e-3)
    np.testing.assert_allclose(out.imag, np.cos(want_phase % (2 * np.pi)), atol=1e-3)


def test_signal_source():
    # first sample advances phase first (src/signal_source.rs:40-49)
    y = np.asarray(ops.signal_source_c(4, 8.0, 1.0, 2.0))
    th = 2 * np.pi / 8 * np.arange(1, 5)
    np.testing.assert_allclose(y.real, 2 * np.sin(th), atol=1e-5)
    np.testing.assert_allclose(y.imag, -2 * np.cos(th), atol=1e-5)
    yf = np.asarray(ops.signal_source_f(4, 8.0, 1.0, 3.0))
    np.testing.assert_allclose(yf, 3 * np.sin(th), atol=1e-5)
    # streaming continuation
    a = np.asarray(ops.signal_source_c(100, 100.0, 7.0))
    b1 = np.asarray(ops.signal_source_c(60, 100.0, 7.0))
    b2 = np.asarray(ops.signal_source_c(40, 100.0, 7.0, offset=60))
    np.testing.assert_allclose(np.concatenate([b1, b2]), a, atol=1e-6)


def test_elementwise():
    x = np.asarray([1.0, -2.0], np.float32)
    np.testing.assert_array_equal(np.asarray(ops.add_const(x, 1.0)), [2.0, -1.0])
    np.testing.assert_array_equal(np.asarray(ops.multiply_const(x, 2.0)), [2.0, -4.0])
    u = np.asarray([0b1010], np.uint8)
    np.testing.assert_array_equal(np.asarray(ops.xor_const(u, 0b0110)), [0b1100])
    z = c64(3 + 4j)
    np.testing.assert_allclose(np.asarray(ops.complex_to_mag2(z)), [25.0])
    re, im = ops.complex_to_float(z)
    assert np.asarray(re)[0] == 3.0 and np.asarray(im)[0] == 4.0
    zz = np.asarray(ops.float_to_complex(np.asarray([1.0], np.float32), np.asarray([2.0], np.float32)))
    assert zz.dtype == np.complex64 and zz[0] == 1 + 2j


# ---------------------------------------------------------------- symbol sync


def test_symbol_sync_starts_at_middle():
    # reference src/symbol_sync.rs:229-242: 10 zeros, sps 4 -> 2 symbols
    (vals, mask, clks), _ = ops.symbol_sync(np.zeros(10, np.float32), 4.0, 1.0, [1.0])
    assert int(np.asarray(mask).sum()) == 2


def _symbol_sync_numpy(x, sps, max_dev, taps):
    """Literal f32 port of the reference state machine for cross-checking."""
    f = np.float32
    sps = f(sps)
    clock = sps
    mi, mx = sps - f(max_dev), sps + f(max_dev)
    taps = [f(t) for t in taps]
    fbuf = [sps] * (len(taps) - 1)  # newest first
    last_sign = False
    stream_pos = f(0.0)
    last_boundary = f(0.0)
    next_mid = sps / f(2.0)
    out = []
    for s in np.asarray(x, np.float32):
        if stream_pos >= next_mid:
            out.append(s)
            next_mid = f(next_mid + clock)
        sign = s > 0
        if sign != last_sign:
            if stream_pos > 0 and last_boundary > 0:
                t = f(stream_pos - last_boundary)
                while t > mx:
                    t2 = f(t - clock)
                    if abs(f(t - clock)) < abs(f(t2 - clock)):
                        break
                    t = t2
                if t > mi * f(0.8) and t < mx * f(1.2):
                    ret = f(taps[0] * f(t - sps))
                    for i, h in enumerate(fbuf):
                        ret = f(ret + h * taps[i + 1])
                    ret = min(max(ret, f(mi - sps)), f(mx - sps))
                    if fbuf:
                        fbuf = [ret] + fbuf[:-1]
                    clock = f(ret + sps)
                    next_mid = f(last_boundary + clock / f(2.0))
                    while next_mid < stream_pos:
                        next_mid = f(next_mid + clock)
            last_boundary = stream_pos
            last_sign = sign
        stream_pos = f(stream_pos + 1.0)
        sb = f(10.0) * clock
        if stream_pos > sb and last_boundary > sb and next_mid > sb:
            stream_pos = f(stream_pos - sb)
            last_boundary = f(last_boundary - sb)
            next_mid = f(next_mid - sb)
    return np.asarray(out, np.float32)


def test_symbol_sync_matches_numpy_model():
    # A noisy square wave like an AFSK demod output.
    rng = np.random.RandomState(14)
    sps = 36.75  # 44100 / 1200
    nsym = 60
    symbits = rng.randint(0, 2, nsym) * 2 - 1
    t = np.arange(int(nsym * sps))
    x = symbits[np.minimum((t / sps).astype(int), nsym - 1)].astype(np.float32)
    x += rng.randn(len(x)).astype(np.float32) * 0.1
    (vals, mask, _), _ = ops.symbol_sync(x, sps, 0.5, [0.5, 0.5])
    got = np.asarray(vals)[np.asarray(mask)]
    want = _symbol_sync_numpy(x, sps, 0.5, [0.5, 0.5])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


# ---------------------------------------------------------------- WPCR


def test_wpcr_matches_numpy():
    from rustradio_tpu.ops.wpcr import wpcr_numpy

    rng = np.random.RandomState(15)
    sps = 5.2083  # 50000/9600
    nsym = 200
    symbits = rng.randint(0, 2, nsym) * 2 - 1
    t = np.arange(int(nsym * sps))
    x = symbits[np.minimum((t / sps).astype(int), nsym - 1)].astype(np.float32)
    samples, mask, info = ops.wpcr(x)
    ref = wpcr_numpy(x)
    assert ref is not None
    want_syms, want_sps, _ = ref
    got = np.asarray(samples)[np.asarray(mask)]
    assert bool(np.asarray(info["found"]))
    np.testing.assert_allclose(float(info["sps"]), want_sps, rtol=1e-5)
    assert got.shape == want_syms.shape
    np.testing.assert_allclose(got, want_syms, atol=1e-5)


def test_midpoint():
    v = np.asarray([0.0, 0.0, 1.0, 1.0, 1.0, 0.0], np.float32)
    out, ok = ops.midpoint(v)
    assert bool(np.asarray(ok))
    out = np.asarray(out)
    assert (out > 0).sum() == 3 and (out < 0).sum() == 3


# ---------------------------------------------------------------- bursts


def test_burst_tagger_and_pdu():
    trig = np.asarray([0.1] * 5 + [0.9] * 6 + [0.1] * 5, np.float32)
    data = np.arange(16, dtype=np.float32)
    start, end = ops.burst_tagger(trig, 0.5)
    start, end = np.asarray(start), np.asarray(end)
    assert start[5] and end[11] and start.sum() == 1 and end.sum() == 1
    pdus = ops.stream_to_pdu(data, start, end, max_size=100, tail=2)
    assert len(pdus) == 1
    np.testing.assert_array_equal(pdus[0], np.arange(5, 13))
    # without tail: end sample excluded
    pdus = ops.stream_to_pdu(data, start, end, max_size=100, tail=0)
    np.testing.assert_array_equal(pdus[0], np.arange(5, 11))
    # max_size drop
    assert not ops.stream_to_pdu(data, start, end, max_size=3, tail=0)


# ---------------------------------------------------------------- FFT ops


def test_fft_stream():
    rng = np.random.RandomState(16)
    x = (rng.randn(1000) + 1j * rng.randn(1000)).astype(np.complex64)
    out, nframes, leftover = ops.fft_stream(x, 256)
    assert nframes == 3
    assert np.asarray(leftover).shape[0] == 1000 - 768
    want = np.fft.fft(x[:768].reshape(3, 256), axis=-1)
    np.testing.assert_allclose(np.asarray(out).reshape(3, 256), want, atol=1e-2)


def test_fft_pdu():
    x = (np.random.RandomState(17).randn(64)).astype(np.complex64)
    got = np.asarray(ops.fft_pdu(x))
    np.testing.assert_allclose(got, np.fft.fft(x), atol=1e-3)


def test_fft_filter_decimate_matches_slice():
    from rustradio_tpu.ops.fft_filter import fft_filter_decimate

    rng = np.random.RandomState(20)
    for n, ntaps, deci, fft in [(5000, 49, 4, None), (4096, 31, 3, 768), (7777, 63, 8, 4096)]:
        x = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64)
        taps = rng.randn(ntaps).astype(np.complex64)
        got = np.asarray(fft_filter_decimate(x, taps, deci, fft))
        want = np.asarray(ops.fft_filter(x, taps))[::deci]
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-3)


def test_fft_filter_decimate_validates():
    from rustradio_tpu.ops.fft_filter import fft_filter_decimate

    with pytest.raises(ValueError, match="not divisible"):
        fft_filter_decimate(np.ones(100, np.complex64), np.ones(9), 3, 1024)

"""Native host runtime: ring buffer, reader thread, converters."""

import numpy as np
import pytest

from rustradio_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native runtime unavailable"
)


def test_ring_basic():
    r = native.Ring(4096)
    assert r.capacity >= 4096
    assert r.write(b"hello") == 5
    assert r.readable() == 5
    assert r.read(5) == b"hello"
    assert r.readable() == 0


def test_ring_wraparound():
    r = native.Ring(4096)
    cap = r.capacity
    # Fill/drain several times the capacity so the cursors wrap.
    chunk = bytes(range(256)) * 8  # 2048 bytes
    total = 0
    for i in range(5 * cap // len(chunk)):
        r.write(chunk)
        got = r.read(len(chunk))
        assert got == chunk
        total += len(chunk)
    assert total > 4 * cap


def test_ring_eof():
    r = native.Ring(4096)
    r.write(b"tail")
    r.set_eof()
    assert not r.eof()  # data still pending
    assert r.read(10) == b"tail"  # short read at EOF
    assert r.eof()


def test_ring_threaded_producer():
    import threading

    r = native.Ring(1 << 16)
    data = np.random.RandomState(0).randint(0, 256, 1 << 20).astype(np.uint8)

    def produce():
        r.write(data)
        r.set_eof()

    t = threading.Thread(target=produce)
    t.start()
    out = b""
    while len(out) < data.nbytes:
        out += r.read(4096)
    t.join()
    assert out == data.tobytes()


def test_file_reader(tmp_path):
    path = str(tmp_path / "x.bin")
    payload = np.arange(100000, dtype=np.uint32).tobytes()
    with open(path, "wb") as f:
        f.write(payload)
    r = native.Ring(1 << 16)
    rd = native.FileReader(r, path, repeat=2)
    out = b""
    while True:
        chunk = r.read(8192)
        out += chunk
        if r.eof() and not chunk:
            break
    rd.stop()
    assert out == payload + payload


def test_file_reader_missing_file():
    r = native.Ring(4096)
    rd = native.FileReader(r, "/nonexistent/file", repeat=1)
    # give the thread a moment
    import time

    for _ in range(100):
        if r.error() or r.eof():
            break
        time.sleep(0.01)
    assert r.error() != 0
    rd.stop()


def test_convert_i16be():
    pcm = np.asarray([1000, -1000, 32767, -32768], ">i2")
    raw = np.frombuffer(pcm.tobytes(), np.uint8)
    got = native.convert_i16be_f32(raw)
    np.testing.assert_allclose(got, pcm.astype(np.float32) / 32767.0, rtol=1e-6)


def test_convert_u8iq():
    raw = np.asarray([127, 127, 255, 0, 0, 255], np.uint8)
    i, q = native.convert_u8iq_planar(raw, 0.008)
    np.testing.assert_allclose(i, [0.0, 1.024, -1.016], atol=1e-6)
    np.testing.assert_allclose(q, [0.0, -1.016, 1.024], atol=1e-6)


def test_deinterleave_roundtrip():
    x = (np.random.RandomState(1).randn(1000) + 1j * np.random.RandomState(2).randn(1000)).astype(np.complex64)
    i, q = native.deinterleave_c64(x)
    np.testing.assert_array_equal(i, x.real)
    np.testing.assert_array_equal(q, x.imag)


def test_convert_f32_i16be_matches_au_encode():
    x = np.asarray([0.5, -0.5, 1.5, -1.5, 0.123], np.float32)
    raw = native.convert_f32_i16be(x)
    want = np.trunc(x * 32767.0).clip(-32768, 32767).astype(">i2")
    np.testing.assert_array_equal(np.frombuffer(raw, ">i2"), want)


def test_native_symbol_sync_matches_scan_exactly():
    import numpy as np
    from rustradio_tpu import native
    from rustradio_tpu.ops.symbol_sync import compact, symbol_sync

    if not native.available():
        import pytest

        pytest.skip("native runtime unavailable")
    rng = np.random.RandomState(5)
    n = 200_000
    t = np.arange(n)
    nrz = np.sign(np.sin(2 * np.pi * t / 36.75 + 0.3)).astype(np.float32)
    nrz = nrz * (0.8 + 0.1 * rng.randn(n).astype(np.float32))
    for taps in ((0.5, 0.5), (0.0001, 0.99999999), (1.0,), (0.3, 0.4, 0.3)):
        (v, m, c), _ = symbol_sync(nrz, 36.75, 0.5, taps)
        want_v, want_c = compact(v, m), compact(c, m)
        got_v, got_c, _ = native.symbol_sync_f32(nrz, 36.75, 0.5, np.asarray(taps))
        assert np.array_equal(got_v, want_v), taps
        assert np.array_equal(got_c, want_c), taps


def test_native_hdlc_matches_python_state_machine():
    import numpy as np
    from rustradio_tpu import native, ops
    from rustradio_tpu.ops.hdlc import HdlcStateMachine

    if not native.available():
        import pytest

        pytest.skip("native runtime unavailable")
    rng = np.random.RandomState(11)
    # frames of noise-separated HDLC, plus one with a single flipped bit
    chunks = []
    for i, payload in enumerate(
        [b"HELLO HDLC", b"A" * 300, b"\x00\x7e\x7d frame with flags in data"]
    ):
        bits = np.asarray(ops.hdlc_frame(ops.fcs_add(np.frombuffer(payload, np.uint8))))
        chunks.append(bits)
        chunks.append(rng.randint(0, 2, 64).astype(np.uint8))
    stream = np.concatenate(chunks)
    damaged = stream.copy()
    # flip one payload bit inside the second frame's data region
    damaged[len(chunks[0]) + 64 + 200] ^= 1

    for bits, fix in ((stream, False), (damaged, True), (damaged, False)):
        py = HdlcStateMachine(1, 1500, False, fix)
        want = py.feed(bits)
        nat = native.HdlcDeframer(1, 1500, False, fix)
        got = nat.feed(bits)
        assert nat.stats == py.stats, (fix, nat.stats, py.stats)
        assert len(got) == len(want)
        for (gd, gp), (wd, wp) in zip(got, want):
            assert gp == wp and np.array_equal(gd, wd)
        # chunked feeding decodes identically
        nat2 = native.HdlcDeframer(1, 1500, False, fix)
        got2 = []
        for i in range(0, len(bits), 97):
            got2.extend(nat2.feed(bits[i : i + 97]))
        assert len(got2) == len(want)
        for (gd, gp), (wd, wp) in zip(got2, want):
            assert gp == wp and np.array_equal(gd, wd)
        assert nat2.stats == py.stats


def test_native_symbol_sync_chunked_resume():
    import numpy as np
    from rustradio_tpu import native
    from rustradio_tpu.ops.symbol_sync import compact, symbol_sync

    if not native.available():
        import pytest

        pytest.skip("native runtime unavailable")
    rng = np.random.RandomState(7)
    n = 100_000
    t = np.arange(n)
    nrz = np.sign(np.sin(2 * np.pi * t / 36.75)).astype(np.float32)
    nrz = nrz * (0.8 + 0.1 * rng.randn(n).astype(np.float32))
    want_v, want_c, _ = native.symbol_sync_f32(nrz, 36.75, 0.5, np.asarray([0.5, 0.5]))
    # chunked native resumes exactly
    parts, st = [], None
    for i in range(0, n, 7777):
        v, c, st = native.symbol_sync_f32(
            nrz[i : i + 7777], 36.75, 0.5, np.asarray([0.5, 0.5]), state=st
        )
        parts.append(v)
    got = np.concatenate(parts)
    assert np.array_equal(got, want_v)
    # a native-produced state resumes the scan backend identically
    v1, c1, st1 = native.symbol_sync_f32(
        nrz[:50_000], 36.75, 0.5, np.asarray([0.5, 0.5])
    )
    (v2, m2, _), _ = symbol_sync(nrz[50_000:], 36.75, 0.5, (0.5, 0.5), state=st1)
    tail = compact(v2, m2)
    assert np.array_equal(np.concatenate([v1, tail]), want_v)


def test_native_zero_crossing_matches_scan():
    import numpy as np
    from rustradio_tpu import native
    from rustradio_tpu.ops.symbol_sync import compact, zero_crossing_sync

    if not native.available():
        import pytest

        pytest.skip("native runtime unavailable")
    rng = np.random.RandomState(9)
    n = 150_000
    t = np.arange(n)
    nrz = np.sign(np.sin(2 * np.pi * t / 20.5 + 0.7)).astype(np.float32)
    nrz = nrz * (0.9 + 0.05 * rng.randn(n).astype(np.float32))
    (v, m), _ = zero_crossing_sync(nrz, 20.5)
    want = compact(v, m)
    got, _ = native.zero_crossing_f32(nrz, 20.5)
    assert np.array_equal(got, want)
    # chunked native resume
    parts, st = [], None
    for i in range(0, n, 6301):
        vv, st = native.zero_crossing_f32(nrz[i : i + 6301], 20.5, state=st)
        parts.append(vv)
    assert np.array_equal(np.concatenate(parts), want)

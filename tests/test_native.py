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

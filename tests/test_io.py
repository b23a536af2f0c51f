"""I/O formats: .au codec, raw sample files, RTL-SDR byte decode."""

import numpy as np
import pytest

from rustradio_tpu.io import au, rawfile


def test_au_roundtrip():
    x = np.asarray([10.0, 0.0, -20.0, 0.0, 100.0, -100.0], np.float32) / 128.0
    data = au.au_encode(x, 48000)
    got, rate = au.au_decode(data)
    assert rate == 48000
    np.testing.assert_allclose(got, np.trunc(x * 32767) / 32767, atol=1e-6)


def test_au_header_fields():
    data = au.au_encode(np.zeros(4, np.float32), 44100)
    assert data[:4] == b".snd"
    assert len(data) == 28 + 8


def test_au_rejects_bad():
    with pytest.raises(ValueError, match="magic"):
        au.au_decode(b"RIFF" + b"\x00" * 24)
    with pytest.raises(ValueError, match="bitrate"):
        au.au_decode(au.au_encode(np.zeros(4, np.float32), 48000), 44100)
    with pytest.raises(ValueError, match="too short"):
        au.au_decode(b".snd")


def test_au_reference_file():
    import os

    path = "/root/reference/testdata/aprs.au"
    if not os.path.exists(path):
        pytest.skip("reference testdata absent")
    x, rate = au.au_read(path)
    assert rate == 44100
    assert len(x) == 132639  # data_offset is 32 in this file, not 28
    assert np.abs(x).max() <= 1.0


def test_rawfile_roundtrip(tmp_path):
    p = str(tmp_path / "x.c32")
    x = (np.random.RandomState(0).randn(100) + 1j).astype(np.complex64)
    rawfile.write_samples(p, x)
    got = rawfile.read_samples(p, "c32")
    np.testing.assert_array_equal(got, x)
    got2 = rawfile.read_samples(p, "c32", repeat=2)
    assert len(got2) == 200


def test_rtlsdr_codec_roundtrip():
    rng = np.random.RandomState(1)
    iq = ((rng.randint(0, 256, 64).astype(np.float32) - 127) * 0.008).astype(
        np.complex64
    )
    iq = iq + 1j * ((rng.randint(0, 256, 64).astype(np.float32) - 127) * 0.008)
    raw = rawfile.rtlsdr_encode(iq.astype(np.complex64))
    back = rawfile.rtlsdr_decode(raw)
    np.testing.assert_allclose(back, iq, atol=1e-6)

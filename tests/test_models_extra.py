"""End-to-end tests for the second wave of receiver chains: G3RUH 9600
traditional path, 1200 bd WPCR, IL2P RF, AM, burst saver, data-stream app."""

import os

import numpy as np
import pytest

from rustradio_tpu import ops
from rustradio_tpu.models.ax25 import (
    ax25_1200_wpcr_rx,
    ax25_9600_rx,
    g3ruh_modulate,
    il2p_1200_rx,
)
from rustradio_tpu.models.fm import am_rx

from test_models import make_afsk

IL2P_BITS = "/root/reference/testdata/il2p.bits"


def test_g3ruh_loopback():
    # TX (examples/g3ruh.rs:246-283) -> RX (examples/ax25-9600-rx.rs:136-207)
    fs = 300_000.0
    payload = b"G3RUH MODEM LOOPBACK TEST FRAME 0123456789"
    frame = np.frombuffer(payload, np.uint8)
    iq = g3ruh_modulate([frame], fs)
    lead = np.zeros(5000, np.complex64)
    iq = np.concatenate([lead, iq, lead])
    pkts = ax25_9600_rx(iq, fs)
    assert any(bytes(p) == payload for p in pkts), [bytes(p) for p in pkts]
    # the event-driven sync decodes the same loopback frame
    pkts_e = ax25_9600_rx(iq, fs, sync="events")
    assert any(bytes(p) == payload for p in pkts_e), [bytes(p) for p in pkts_e]


def test_g3ruh_loopback_ax25_frame():
    # A realistic addressed AX.25 UI frame, decoded with the g3ruh modem's
    # own clock-taps default (reference examples/g3ruh.rs:77-83 uses [1]).
    fs = 300_000.0
    raw = b"\x82\xa0\xa4\xa6@@`\x9c`\x86\x82\x98\x98a\x03\xf0VERIFY G3RUH"
    frame = np.frombuffer(raw, np.uint8)
    iq = g3ruh_modulate([frame], fs)
    lead = np.zeros(5000, np.complex64)
    iq = np.concatenate([lead, iq, lead])
    pkts = ax25_9600_rx(iq, fs, symbol_taps=(1.0,))
    assert any(bytes(p) == raw for p in pkts), [bytes(p) for p in pkts]


def test_ax25_1200_wpcr_synthetic():
    fs = 50_000.0
    payload = b"WPCR 1200 BAUD BURST"
    audio = make_afsk(payload, fs=fs, lead_zeros=0)
    iq, _ = ops.vco(audio * 0.3, k=2 * np.pi * 3500.0 / fs)
    iq = np.conj(np.asarray(iq))
    lead = np.zeros(4000, np.complex64)
    iq = np.concatenate([lead, iq, lead])
    rng = np.random.RandomState(7)
    iq = iq + (rng.randn(len(iq)) * 1e-4).astype(np.complex64)
    pkts = ax25_1200_wpcr_rx(iq, fs, threshold=0.01)
    assert any(bytes(p) == payload for p in pkts), [bytes(p) for p in pkts]


@pytest.mark.skipif(not os.path.exists(IL2P_BITS), reason="reference testdata absent")
def test_il2p_1200_rf_synthetic():
    # AFSK-modulate the reference's checked-in IL2P bit capture onto an FM
    # carrier and decode through the full RF chain.
    bits = np.fromfile(IL2P_BITS, np.uint8)
    fs, baud = 50_000.0, 1200.0
    # The chain slices then inverts (examples/il2p-1200-rx.rs:122): in this
    # demod convention a 1200 Hz tone slices to 0, so sending bit b as
    # (b==1 -> 1200 Hz) yields slicer == b^1 and the post-slicer XOR
    # restores b.
    s = bits
    sps = fs / baud
    n = int(len(s) * sps)
    bit_at = np.minimum((np.arange(n) / sps).astype(int), len(s) - 1)
    freqs = np.where(s[bit_at] == 1, 1200.0, 2200.0)
    phase = np.cumsum(2 * np.pi * freqs / fs)
    audio = (0.5 * np.sin(phase)).astype(np.float32)
    audio = np.concatenate([np.zeros(2000, np.float32), audio, np.zeros(2000, np.float32)])
    iq, _ = ops.vco(audio * 0.3, k=2 * np.pi * 3500.0 / fs)
    iq = np.conj(np.asarray(iq))
    hdrs = il2p_1200_rx(iq, fs)
    assert len(hdrs) >= 1
    assert any(h.src == "M0THC-1" and h.describe() == "SABM" for h in hdrs)


def test_am_rx_tone():
    fs, fa = 192_000.0, 48_000.0
    t = np.arange(int(fs * 0.25)) / fs
    tone = 1_000.0
    env = 1.0 + 0.5 * np.cos(2 * np.pi * tone * t)
    iq = env.astype(np.complex64)  # baseband AM carrier
    audio = np.asarray(am_rx(iq, fs, fa))
    # dominant non-DC audio component must be the 1 kHz tone
    audio = audio[len(audio) // 4 :]
    spec = np.abs(np.fft.rfft(audio - audio.mean()))
    peak_hz = np.argmax(spec) * fa / len(audio)
    assert abs(peak_hz - tone) < 20.0, peak_hz


def test_burst_extract():
    from rustradio_tpu.apps.burst_saver import extract_bursts

    fs = 50_000.0
    rng = np.random.RandomState(3)
    quiet = (rng.randn(20_000) * 1e-5).astype(np.complex64)
    t = np.arange(12_000) / fs
    burst = (0.5 * np.exp(2j * np.pi * 1000.0 * t)).astype(np.complex64)
    iq = np.concatenate([quiet, burst, quiet])
    bursts = extract_bursts(
        iq, fs, new_rate=fs, threshold=0.01, delay=100, tail=200
    )
    assert len(bursts) == 1
    assert 11_000 < len(bursts[0]) < 14_000


def test_rtl_data_stream_downsample_roundtrip():
    from rustradio_tpu.apps.rtl_data_stream import downsample_u8
    from rustradio_tpu.io import data_stream

    fs, ds = 250_000.0, 50_000.0
    t = np.arange(25_000) / fs
    iq = 0.4 * np.exp(2j * np.pi * 5_000.0 * t)
    from rustradio_tpu.io.rawfile import rtlsdr_encode

    raw = rtlsdr_encode(iq.astype(np.complex64))
    payload = downsample_u8(raw, fs, ds)
    # byte count shrinks by the rate ratio (2 bytes per complex sample)
    assert abs(len(payload) - len(raw) / 5) < 400

    # Payload survives DATA_STREAM framing with credit windows.
    sent = []
    writer = data_stream.SyncWriter(sent.append)
    writer.grant("rtl-sdr", len(payload))
    assert writer.send("rtl-sdr", payload) == len(payload)
    parser = data_stream.BytesReader()
    events = parser.feed(b"".join(sent))
    datas = b"".join(e[2] for e in events if e[0] == "data")
    assert datas == payload


def test_g3ruh_kiss_roundtrip():
    from rustradio_tpu.apps.g3ruh import kiss_decode_stream, kiss_encode_frame

    frames = [b"HELLO \xc0 WORLD \xdb!", b"SECOND FRAME"]
    stream = b"".join(kiss_encode_frame(np.frombuffer(f, np.uint8)) for f in frames)
    back = kiss_decode_stream(stream)
    assert [bytes(f) for f in back] == frames

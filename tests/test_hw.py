"""Hardware abstraction layer: sim driver, control plane, telemetry tags.

Reference semantics covered: rtlsdr_source.rs:28-57+124-148 (live command
channel drained between reads), soapysdr_source.rs:12-48+378-416 (time_ns
+ allowlisted sensor tags on an interval, start-up tag set),
soapysdr_sink.rs:19 (TX), audio_sink.rs (playback backend).
"""

import io

import numpy as np
import pytest

from rustradio_tpu import blocks
from rustradio_tpu.graph import Graph
from rustradio_tpu.hw import (
    AudioSink,
    PipewireSink,
    RtlSdrSource,
    SdrSink,
    SdrSource,
    SimDriver,
    SoapySdrSource,
)


def _peak_freq(x, fs):
    spec = np.abs(np.fft.fft(np.asarray(x)))
    return np.fft.fftfreq(len(x), 1 / fs)[int(np.argmax(spec))]


def test_sim_driver_tone_at_offset():
    fs = 100_000.0
    d = SimDriver(frequency=1e6, sample_rate=fs, gain=1.0, tones=[(1e6 + 10_000.0, 1.0)])
    x = d.read(4096)
    assert abs(_peak_freq(x, fs) - 10_000.0) < fs / 4096 * 2


def test_sim_driver_retune_moves_tone():
    fs = 100_000.0
    d = SimDriver(frequency=1e6, sample_rate=fs, gain=1.0,
                  tones=[(1e6 + 10_000.0, 1.0), (2e6, 1.0)])
    d.set_frequency(2e6 - 5_000.0)  # now only the 2 MHz tone is in window
    x = d.read(4096)
    assert abs(_peak_freq(x, fs) - 5_000.0) < fs / 4096 * 2


def test_sdr_source_start_and_telemetry_tags():
    fs = 10_000.0
    d = SimDriver(frequency=1e6, sample_rate=fs, tones=[(1e6, 0.5)])
    src = SdrSource(d, time_tag_interval=1.0)
    g = Graph()
    sink = g.add(blocks.VectorSink(), g.add(src))
    # 3 seconds of stream time in 0.5 s chunks
    g.run_stream(chunk_size=5_000, max_chunks=6)
    tags = sink.block.tags()
    keys = [t.key for t in tags]
    for k in ("frequency", "sample_rate", "input_gain", "driver", "hardware", "channel"):
        assert f"SdrSource::{k}" in keys
    time_tags = [t for t in tags if t.key == "SdrSource::time_ns"]
    # t=0,1,2 seconds -> 3 time tags, and hardware time advances by 1e9 ns
    assert len(time_tags) == 3
    assert time_tags[1].val - time_tags[0].val == pytest.approx(1e9)
    assert any(t.key == "SdrSource::sensor_ref_locked" for t in tags)
    # sensors outside the allowlist (temp) are not tagged by default
    assert not any(t.key == "SdrSource::sensor_temp" for t in tags)


def test_mid_stream_retune_takes_effect_and_is_tagged():
    fs = 100_000.0
    d = SimDriver(frequency=1e6, sample_rate=fs, gain=1.0,
                  tones=[(1e6 + 10_000.0, 1.0), (3e6 + 20_000.0, 1.0)])
    src = SdrSource(d)
    ctl = src.control()
    chunks = []

    def watch(x):
        chunks.append(np.asarray(x))
        if len(chunks) == 2:
            ctl.set_frequency(3e6)  # retune while the graph runs
        return x

    g = Graph()
    s = g.add(src)
    m = g.add(blocks.Map(watch, "watch"), s)
    m.block.domain = "host"
    sink = g.add(blocks.VectorSink(), m)
    g.run_stream(chunk_size=8192, max_chunks=5)

    # chunks 1-2 see the first tone at +10k; chunks 4+ the second at +20k
    assert abs(_peak_freq(chunks[0], fs) - 10_000.0) < 50
    assert abs(_peak_freq(chunks[4], fs) - 20_000.0) < 50
    # the retune is visible as a frequency tag at the start of chunk 3
    ftags = [t for t in sink.block.tags()
             if t.key == "SdrSource::frequency" and t.val == 3e6]
    assert len(ftags) == 1
    assert ftags[0].pos == 2 * 8192
    assert ("frequency", 3e6) in d.command_log


def test_overflow_tagged():
    d = SimDriver(frequency=0.0, sample_rate=1000.0)
    src = SdrSource(d)
    src.emit(0, 100)
    d.inject_overflow(3)
    src.emit(100, 100)
    assert any(
        t.key == "SdrSource::overflow" and t.val == 3 for t in src.emit_tags(100, 100)
    )


def test_rtl_source_bytes_roundtrip():
    fs = 50_000.0
    d = SimDriver(frequency=1e6, sample_rate=fs, gain=1.0, tones=[(1e6 + 4_000.0, 0.5)])
    src = RtlSdrSource(d)
    g = Graph()
    s = g.add(src)
    dec = g.add(blocks.RtlSdrDecode(), s)
    dec.block.domain = "host"
    sink = g.add(blocks.VectorSink(), dec)
    g.run_stream(chunk_size=8192, max_chunks=2)
    x = sink.block.data()
    assert x.dtype == np.complex64
    assert len(x) == 8192  # 2 chunks of 8192 bytes -> 8192 samples
    assert abs(_peak_freq(x, fs) - 4_000.0) < 50


def test_rtl_control_db_mapping():
    d = SimDriver(frequency=1e6, sample_rate=1e6)
    src = RtlSdrSource(d)
    ctl = src.control()
    ctl.set_center_freq_hz(144_800_000)
    ctl.set_gain_db(25)
    src.emit(0, 1024)
    assert d.frequency == 144_800_000.0
    assert d.gain == pytest.approx(0.5)


def test_sdr_sink_loopback_tx():
    d = SimDriver(frequency=1e6, sample_rate=48_000.0)
    tx = (np.exp(2j * np.pi * 0.01 * np.arange(1000)) * 0.3).astype(np.complex64)
    g = Graph()
    g.chain(blocks.VectorSource(tx), SdrSink(d))
    g.run()
    np.testing.assert_allclose(d.tx_data(), tx, atol=1e-6)


def test_soapy_builder_tags_and_allowlist():
    d = SimDriver(frequency=0.0, sample_rate=1.0)
    src = (
        SoapySdrSource(d, 433_000_000.0, 1_000_000.0)
        .channel(1)
        .igain(0.7)
        .antenna("LNAW")
        .build()
    )
    assert d.frequency == 433_000_000.0 and d.sample_rate == 1_000_000.0
    src.emit(0, 16)
    tags = src.emit_tags(0, 16)
    kv = {t.key: t.val for t in tags}
    assert kv["SoapySdrSource::channel"] == 1
    assert kv["SoapySdrSource::input_gain"] == pytest.approx(0.7)
    assert kv["SoapySdrSource::antenna"] == "LNAW"
    assert "SoapySdrSource::sensor_ref_locked" in kv


def test_audio_sink_file_backend(tmp_path):
    path = str(tmp_path / "audio.f32")
    audio = np.sin(np.linspace(0, 20, 4800)).astype(np.float32)
    g = Graph()
    g.chain(blocks.VectorSource(audio), AudioSink(48_000, backend="file", path=path))
    g.run()
    np.testing.assert_allclose(np.fromfile(path, "<f4"), audio, atol=1e-7)


def test_audio_sink_null_backend():
    g = Graph()
    g.chain(
        blocks.VectorSource(np.zeros(100, np.float32)),
        AudioSink(48_000, backend="null"),
    )
    g.run()


def test_pipewire_sink_writer():
    buf = io.BytesIO()
    audio = np.linspace(-1, 1, 256).astype(np.float32)
    g = Graph()
    g.chain(blocks.VectorSource(audio), PipewireSink(48_000, writer=buf))
    g.run()
    np.testing.assert_allclose(np.frombuffer(buf.getvalue(), "<f4"), audio)


def test_pipewire_source_command(tmp_path):
    from rustradio_tpu.hw import PipewireSource

    path = str(tmp_path / "in.f32")
    audio = np.arange(1000, dtype="<f4")
    audio.tofile(path)
    src = PipewireSource(48_000, command=["cat", path])
    g = Graph()
    sink = g.add(blocks.VectorSink(), g.add(src))
    g.run_stream(chunk_size=256, max_chunks=10)
    np.testing.assert_array_equal(sink.block.data(), audio)
    assert src.exhausted()


def test_fm_receive_from_sim_driver():
    # end-to-end: FM-modulated RF tone through SdrSource -> demod chain
    from rustradio_tpu import ops

    fs = 256_000.0
    audio_f = 1_000.0
    dev = 5_000.0
    n = 1 << 16
    t = np.arange(n) / fs
    phase = 2 * np.pi * np.cumsum(dev * np.sin(2 * np.pi * audio_f * t)) / fs
    base = np.exp(1j * phase).astype(np.complex64)

    class FmDriver(SimDriver):
        def read(self, nn):
            out = base[self._count : self._count + nn]
            self._count += len(out)
            self._elapsed += len(out) / self.sample_rate
            return out

    d = FmDriver(frequency=1e8, sample_rate=fs)
    src = SdrSource(d, n=n)
    g = Graph()
    s = g.add(src)
    demod = g.add(blocks.QuadratureDemod(1.0), s)
    sink = g.add(blocks.VectorSink(), demod)
    g.run_stream(chunk_size=16_384)
    y = sink.block.data()
    # demodulated output is a sine at audio_f
    assert abs(abs(_peak_freq(y[1000:9192], fs)) - audio_f) < 40


def test_rtl_driver_contract(monkeypatch):
    """RtlDriver over a fake pyrtlsdr module: the adapter must follow the
    SdrDriver contract the way SimDriver does — normalized gain mapped
    onto the dongle's supported gain list, retunes forwarded, complex64
    reads, stream-time time_ns (reference src/rtlsdr_source.rs:28-57)."""
    import sys
    import types

    calls = []

    class FakeRtlSdr:
        valid_gains_db = [0.0, 9.7, 20.7, 33.8, 49.6]

        def __init__(self, device_index=0):
            calls.append(("open", device_index))
            self._props = {}

        def __setattr__(self, k, v):
            if k in ("sample_rate", "center_freq", "gain"):
                calls.append((k, v))
            object.__setattr__(self, k, v)

        _pos = 0

        def read_samples(self, n):
            assert n % 512 == 0  # librtlsdr buffer-size rule
            t = np.arange(self._pos, self._pos + n)
            object.__setattr__(self, "_pos", self._pos + n)
            return (np.exp(2j * np.pi * 0.01 * t) * 0.5).astype(np.complex128)

        def close(self):
            calls.append(("close", None))

    fake = types.ModuleType("rtlsdr")
    fake.RtlSdr = FakeRtlSdr
    monkeypatch.setitem(sys.modules, "rtlsdr", fake)

    from rustradio_tpu.hw.rtl import RtlDriver

    drv = RtlDriver(frequency=144.8e6, sample_rate=1.024e6, gain=0.4,
                    device_index=1)
    assert ("open", 1) in calls
    assert ("sample_rate", 1.024e6) in calls
    assert ("center_freq", 144.8e6) in calls
    # 0.4 * 50 = 20 dB -> nearest supported gain 20.7
    assert ("gain", 20.7) in calls

    x = drv.read(1000)
    assert x.dtype == np.complex64 and len(x) == 1000
    assert drv.time_ns() == int(1000 / 1.024e6 * 1e9)
    # non-512-multiple reads must buffer the tail, not drop it: two reads
    # are one contiguous stream
    y = drv.read(1000)
    t = np.arange(2000)
    want = (np.exp(2j * np.pi * 0.01 * t) * 0.5).astype(np.complex64)
    np.testing.assert_allclose(np.concatenate([x, y]), want, rtol=1e-6)

    # control-plane retune path used by SdrSource._drain_commands
    drv.set_frequency(145.0e6)
    assert ("center_freq", 145.0e6) in calls
    drv.set_gain(1.0)
    assert ("gain", 49.6) in calls

    # full stack: RtlSdrSource emits the u8 wire format over this driver
    from rustradio_tpu.hw import RtlSdrSource

    src = RtlSdrSource(drv)
    raw = src.emit(0, 2048)
    assert raw.dtype == np.uint8 and len(raw) == 2048
    keys = {t.key for t in src.emit_tags(0, 2048)}
    assert "RtlSdrSource::frequency" in keys
    drv.close()
    assert ("close", None) in calls


def test_rtl_driver_import_error_without_bindings():
    import sys

    assert "rtlsdr" not in sys.modules or sys.modules["rtlsdr"] is not None
    sys.modules.pop("rtlsdr", None)
    from rustradio_tpu.hw.rtl import RtlDriver

    try:
        import rtlsdr  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="rtl_tcp"):
            RtlDriver(1e8, 1e6)

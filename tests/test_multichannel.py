"""Channel-parallel AX.25: several simultaneous AFSK transmissions in one
wideband capture, decoded concurrently (one vmapped clock-recovery scan)."""

import numpy as np
import pytest

from rustradio_tpu import ops
from rustradio_tpu.models.multichannel import decode_band_ax25, recover_symbols_batch


def _afsk_audio(payload: bytes, fs: float, baud=1200.0, amp=0.8, lead=400):
    framed = np.asarray(ops.hdlc_frame(ops.fcs_add(np.frombuffer(payload, np.uint8))))
    line = (1 + np.cumsum(1 - framed)) % 2
    sps = fs / baud
    n = int(len(line) * sps)
    bit_at = np.minimum((np.arange(n) / sps).astype(int), len(line) - 1)
    phase = np.cumsum(2 * np.pi * np.where(line[bit_at] == 1, 1200.0, 2200.0) / fs)
    z = np.zeros(lead, np.float32)
    return np.concatenate([z, (amp * np.sin(phase)).astype(np.float32), z])


def _fm_upconvert(audio, fs_audio, fs_rf, f_center, deviation=3_000.0):
    # resample audio to RF rate, FM-modulate, shift to f_center
    up = np.asarray(
        ops.rational_resampler(np.asarray(audio, np.float32), int(fs_rf), int(fs_audio))
    )
    phase = 2 * np.pi * np.cumsum(deviation * up) / fs_rf
    t = np.arange(len(up)) / fs_rf
    return (np.exp(1j * (phase + 2 * np.pi * f_center * t))).astype(np.complex64)


def test_recover_symbols_batch_matches_single():
    rng = np.random.RandomState(0)
    bits = rng.randint(0, 2, (3, 80)) * 2.0 - 1.0
    xs = np.repeat(bits, 10, axis=1).astype(np.float32)
    xs += rng.randn(*xs.shape).astype(np.float32) * 0.05
    vals, mask, _ = recover_symbols_batch(xs, 10.0)
    for c in range(3):
        from rustradio_tpu.ops.symbol_sync import symbol_sync

        (v1, m1, _), _ = symbol_sync(xs[c], 10.0)
        np.testing.assert_array_equal(np.asarray(mask)[c], np.asarray(m1))
        np.testing.assert_allclose(np.asarray(vals)[c], np.asarray(v1), atol=1e-6)


def _decoded_bits(vals, mask):
    v = np.asarray(vals)[np.asarray(mask)]
    return (v > 0).astype(np.int8)


def test_symbol_sync_events_decode_equivalent():
    # The event-driven form trades bit-exactness for an ~sps-times shorter
    # sequential chain; the contract is identical DECODED BITS vs the scan
    # on realistically noisy NRZ (sigma <= 0.3 on unit symbols).
    from rustradio_tpu.ops.symbol_sync import symbol_sync, symbol_sync_events

    rng = np.random.RandomState(3)
    for sps in (10.0, 26.667):
        for sigma in (0.0, 0.1, 0.3):
            bits = rng.randint(0, 2, 120) * 2.0 - 1.0
            x = np.repeat(bits, int(round(sps))).astype(np.float32)
            x += rng.randn(x.size).astype(np.float32) * sigma
            (v1, m1, _), _ = symbol_sync(x, sps)
            (v2, m2, _), valid = symbol_sync_events(x, sps)
            assert bool(valid)
            b1, b2 = _decoded_bits(v1, m1), _decoded_bits(v2, m2)
            np.testing.assert_array_equal(
                b1, b2, err_msg=f"sps={sps} sigma={sigma}"
            )


def test_ted_reduce_matches_while_loop():
    # the bounded predicated reduction must be f32-bit-identical to the
    # reference-shaped while_loop across realistic (gap, clock) space
    import jax
    import jax.numpy as jnp
    from rustradio_tpu.ops.symbol_sync import _ted_reduce

    def while_form(t0_raw, clock, mx):
        k0 = jnp.maximum(0.0, jnp.floor((t0_raw - mx) / clock) - 1.0)
        t0 = (t0_raw - k0 * clock).astype(jnp.float32)

        def wcond(t):
            t2 = t - clock
            keep = jnp.abs(t - clock) >= jnp.abs(t2 - clock)
            return (t > mx) & keep

        return jax.lax.while_loop(wcond, lambda t: t - clock, t0)

    rng = np.random.RandomState(33)
    gaps = np.concatenate([
        rng.uniform(0, 200, 400),
        rng.uniform(0, 2 ** 22, 400),
        np.arange(1, 100, dtype=np.float64) * 36.75,  # exact multiples
    ]).astype(np.float32)
    for clock, dev in [(8.0, 0.5), (36.75, 0.5), (5.5, 1.0), (100.0, 0.1)]:
        mx = np.float32(clock + dev)
        got = jax.vmap(lambda g: _ted_reduce(g, jnp.float32(clock), mx))(
            jnp.asarray(gaps))
        want = jax.vmap(lambda g: while_form(g, jnp.float32(clock), mx))(
            jnp.asarray(gaps))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"clock={clock}")


def test_symbol_sync_events_long_runs():
    # Crossing gaps >= mx + 2*clock (legal NRZI runs during acquisition)
    # exercise the closed-form catch-up: next_sym_middle must be computed
    # from the RAW boundary offset, not the TED-reduced one (a reduced
    # offset shifts the emission phase by multiple samples).
    from rustradio_tpu.ops.symbol_sync import symbol_sync, symbol_sync_events

    rng = np.random.RandomState(21)
    for sps in (10.0, 26.667):
        # long same-symbol runs up front and sprinkled through
        bits = np.concatenate([
            np.ones(6), -np.ones(1), np.ones(1),
            (rng.randint(0, 2, 40) * 2.0 - 1.0),
            -np.ones(7), np.ones(1),
            (rng.randint(0, 2, 40) * 2.0 - 1.0),
        ])
        x = np.repeat(bits, int(round(sps))).astype(np.float32)
        x += rng.randn(x.size).astype(np.float32) * 0.1
        (v1, m1, _), _ = symbol_sync(x, sps)
        (v2, m2, _), valid = symbol_sync_events(x, sps)
        assert bool(valid)
        np.testing.assert_array_equal(
            _decoded_bits(v1, m1), _decoded_bits(v2, m2),
            err_msg=f"sps={sps}")


def test_symbol_sync_events_fuzz_params():
    # randomized sweep over sps / max_deviation / clock-filter order:
    # decoded bits must match the scan exactly at noise sigma <= 0.3
    from rustradio_tpu.ops.symbol_sync import symbol_sync, symbol_sync_events

    rng = np.random.RandomState(42)
    tap_sets = [(0.5, 0.5), (0.25, 0.75), (0.4, 0.3, 0.3),
                (0.25, 0.25, 0.25, 0.25)]
    for trial in range(8):
        sps = float(rng.uniform(3.0, 40.0))
        max_dev = float(rng.choice([0.1, 0.5, 1.0]))
        taps = tap_sets[trial % len(tap_sets)]
        sigma = float(rng.choice([0.0, 0.15, 0.3]))
        bits = rng.randint(0, 2, 100) * 2.0 - 1.0
        x = np.repeat(bits, int(round(sps))).astype(np.float32)
        x += rng.randn(x.size).astype(np.float32) * sigma
        (v1, m1, _), _ = symbol_sync(x, sps, max_dev, taps)
        (v2, m2, _), valid = symbol_sync_events(x, sps, max_dev, taps)
        assert bool(valid)
        np.testing.assert_array_equal(
            _decoded_bits(v1, m1), _decoded_bits(v2, m2),
            err_msg=f"sps={sps:.2f} dev={max_dev} taps={taps} sigma={sigma}")


def test_symbol_sync_events_valid_flag():
    from rustradio_tpu.ops.symbol_sync import symbol_sync_events

    rng = np.random.RandomState(5)
    # alternating-sign noise: a crossing nearly every sample
    x = rng.randn(512).astype(np.float32)
    _, valid = symbol_sync_events(x, 8.0, max_events=16)
    assert not bool(valid)
    _, valid = symbol_sync_events(x, 8.0, max_events=512)
    assert bool(valid)


def test_recover_symbols_batch_events_method():
    from rustradio_tpu.ops.symbol_sync import symbol_sync_events

    rng = np.random.RandomState(11)
    bits = rng.randint(0, 2, (3, 80)) * 2.0 - 1.0
    xs = np.repeat(bits, 10, axis=1).astype(np.float32)
    xs += rng.randn(*xs.shape).astype(np.float32) * 0.05
    vals, mask, _ = recover_symbols_batch(xs, 10.0, method="events")
    for c in range(3):
        (v1, m1, _), _ = symbol_sync_events(xs[c], 10.0)
        np.testing.assert_array_equal(np.asarray(mask)[c], np.asarray(m1))
        np.testing.assert_allclose(np.asarray(vals)[c], np.asarray(v1), atol=1e-6)


def test_recover_symbols_batch_valid_and_method_validation():
    rng = np.random.RandomState(17)
    # heavy chatter: a crossing nearly every sample overflows a small budget
    noisy = rng.randn(3, 2048).astype(np.float32)
    v, m, c, valid = recover_symbols_batch(noisy, 8.0, method="events",
                                           max_events=64, return_valid=True)
    assert not bool(np.asarray(valid).any())
    # scan method reports all-valid
    *_, valid = recover_symbols_batch(noisy[:, :256], 8.0, method="scan",
                                      return_valid=True)
    assert bool(np.asarray(valid).all())
    with pytest.raises(ValueError, match="unknown method"):
        recover_symbols_batch(noisy, 8.0, method="event")


def test_symbol_sync_events_unroll_invariant():
    from rustradio_tpu.ops.symbol_sync import symbol_sync_events

    rng = np.random.RandomState(13)
    bits = rng.randint(0, 2, 100) * 2.0 - 1.0
    x = np.repeat(bits, 9).astype(np.float32)
    x += rng.randn(x.size).astype(np.float32) * 0.2
    (v1, m1, c1), _ = symbol_sync_events(x, 9.0, unroll=1)
    for unroll in (4, 16):
        (v, m, c), _ = symbol_sync_events(x, 9.0, unroll=unroll)
        np.testing.assert_array_equal(np.asarray(m), np.asarray(m1))
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v1))
        np.testing.assert_array_equal(np.asarray(c), np.asarray(c1))


def test_symbol_sync_unroll_bit_exact():
    # lax.scan unroll is a mechanical body unroll — every output and the
    # final carry must be BIT-identical to the sequential scan (the native
    # C++ equivalence tests depend on the scan's exact f32 association).
    from rustradio_tpu.ops.symbol_sync import symbol_sync

    rng = np.random.RandomState(7)
    bits = rng.randint(0, 2, 60) * 2.0 - 1.0
    x = np.repeat(bits, 11).astype(np.float32)
    x += rng.randn(x.size).astype(np.float32) * 0.1
    (v1, m1, c1), s1 = symbol_sync(x, 11.0, unroll=1)
    for unroll in (4, 16, 37):
        (v, m, c), s = symbol_sync(x, 11.0, unroll=unroll)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v1))
        np.testing.assert_array_equal(np.asarray(m), np.asarray(m1))
        np.testing.assert_array_equal(np.asarray(c), np.asarray(c1))
        for k in s1:
            np.testing.assert_array_equal(np.asarray(s[k]), np.asarray(s1[k]))


def test_decode_band_three_stations():
    fs = 512_000.0
    M = 16  # 32 kHz channels, ~26.7 samples/symbol
    fs_audio = 32_000.0
    stations = {
        2: b"STATION A>APRS:chan 2",
        5: b"STATION B>APRS:chan 5",
        11: b"STATION C>APRS:chan 11",  # negative-frequency side (11-16)*fs/M
    }
    rng = np.random.RandomState(1)
    parts = []
    n_max = 0
    for k, payload in stations.items():
        f = (k if k < M / 2 else k - M) * fs / M
        audio = _afsk_audio(payload, fs_audio)
        iq = _fm_upconvert(audio, fs_audio, fs, f)
        parts.append(iq)
        n_max = max(n_max, len(iq))
    wide = np.zeros(n_max + 4096, np.complex64)
    for iq in parts:
        wide[: len(iq)] += iq
    wide += (rng.randn(len(wide)) + 1j * rng.randn(len(wide))).astype(np.complex64) * 0.01

    results = decode_band_ax25(wide, fs, n_channels=M, max_active=6)
    got = {r.channel: [bytes(p) for p in r.packets] for r in results}
    for k, payload in stations.items():
        assert k in got, f"channel {k} not decoded (got {sorted(got)})"
        assert payload in got[k]


def test_decode_band_events_method():
    fs = 512_000.0
    iq = _fm_upconvert(_afsk_audio(b"EVENTS>APRS:bank", 32_000.0),
                       32_000.0, fs, 2 * fs / 16)
    wide = np.concatenate([iq, np.zeros(4096, np.complex64)])
    results = decode_band_ax25(wide, fs, n_channels=16, max_active=4,
                               sync_method="events")
    got = {r.channel: [bytes(p) for p in r.packets] for r in results}
    assert 2 in got and b"EVENTS>APRS:bank" in got[2]


def test_decode_band_rejects_too_many_channels():
    with pytest.raises(ValueError):
        decode_band_ax25(np.zeros(1024, np.complex64), 48_000.0, n_channels=64)


@pytest.mark.parametrize("sync", ["scan", "events"])
def test_scanner_decode_flag(tmp_path, capsys, sync):
    from rustradio_tpu.apps import scanner
    from rustradio_tpu.io import rawfile

    fs = 512_000.0
    iq = _fm_upconvert(_afsk_audio(b"CLI>APRS:scan decode", 32_000.0),
                       32_000.0, fs, 2 * fs / 16)
    wide = np.concatenate([iq, np.zeros(4096, np.complex64)])
    path = str(tmp_path / "band.c32")
    rawfile.write_samples(path, wide, "c32")
    assert scanner.main(["-r", path, "--sample_rate", "512k", "-n", "16",
                         "--decode", "--max_active", "4",
                         "--sync", sync]) == 0
    cap = capsys.readouterr()
    # packet decoded on channel 2 (the payload is raw ASCII, not a real
    # AX.25 address block, so only the channel line format is stable)
    assert "ch   2" in cap.out
    assert "decoded 1 packets on 1 channels" in cap.err


def test_symbol_sync_events_block_stream_equals_offline():
    # blocks.SymbolSync(method="events") (r5): chunked output through the
    # block's carried state is EXACTLY the block's own whole-stream
    # output, across chunk sizes that split events and long gaps.
    from rustradio_tpu import blocks

    rng = np.random.RandomState(11)
    sps = 12.6
    n = 24000
    bits = rng.randint(0, 2, int(n / sps) + 2) * 2.0 - 1.0
    x = np.repeat(bits, int(np.ceil(sps)))[:n].astype(np.float32)
    x += 0.2 * rng.randn(n).astype(np.float32)
    # a long crossing-free gap spanning a chunk boundary
    x[9000:11000] = 0.7

    blk = blocks.SymbolSync(sps, 0.5, (0.5, 0.5), method="events")
    want = np.asarray(blk.apply(x))
    assert len(want) > 100
    for chunk in (5000, 7001, 24000):
        st = blk.init_state()
        outs = []
        for i in range(0, n, chunk):
            st, y = blk.apply_chunk(st, x[i : i + chunk])
            outs.append(np.asarray(y))
        got = np.concatenate(outs)
        np.testing.assert_array_equal(got, want)


def test_symbol_sync_events_block_budget_overflow_retries():
    # chattery input overflowing the auto budget: the block retries with
    # a doubled budget instead of emitting untrustworthy output
    from rustradio_tpu import blocks

    rng = np.random.RandomState(12)
    x = rng.randn(4096).astype(np.float32)  # ~50% crossings
    blk = blocks.SymbolSync(8.0, 0.5, (0.5, 0.5), method="events",
                            max_events=16)
    syms = np.asarray(blk.apply(x))
    ref = np.asarray(
        blocks.SymbolSync(8.0, 0.5, (0.5, 0.5), method="events").apply(x)
    )
    np.testing.assert_array_equal(syms, ref)


def test_ax25_graph_events_sync_decodes():
    # the Graph-built receiver with sync="events" (the 11x path as a
    # first-class block) decodes the synthetic packets, offline and
    # streaming
    from rustradio_tpu.models.ax25 import ax25_1200_rx_graph
    from tests.test_models import make_afsk

    payloads = [b"EVENTS BLOCK GRAPH ONE", b"EVENTS BLOCK GRAPH TWO"]
    audio = np.concatenate([make_afsk(p, fs=24000.0) for p in payloads])
    got = ax25_1200_rx_graph(audio, 24000.0, sync="events")
    assert got == payloads
    got_s = ax25_1200_rx_graph(audio, 24000.0, sync="events",
                               chunk_size=len(audio) // 3)
    assert got_s == payloads

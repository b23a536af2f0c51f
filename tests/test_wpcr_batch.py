"""Batched WPCR (Bluestein bucket path) vs the eager per-burst path.

The batched path must select the same clock (sps/phase/found) and emit
identical symbols for every burst — it evaluates the same length-(m-1)
DFT the reference uses (src/wpcr.rs:150), just via chirp-Z with static
shapes so bursts of different lengths share one compiled program.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

import rustradio_tpu.ops  # noqa: F401  (registers the submodule)

W = sys.modules["rustradio_tpu.ops.wpcr"]


def _make_burst(rng, nbits, sps, noise=0.05):
    bits = rng.randint(0, 2, nbits) * 2.0 - 1.0
    x = np.repeat(bits, sps).astype(np.float32)
    return x + rng.randn(len(x)).astype(np.float32) * noise


def test_bluestein_matches_numpy_fft():
    import jax

    rng = np.random.RandomState(0)
    for m in [5, 17, 100, 333, 1024]:
        L = 1 << max(6, (m - 1).bit_length())
        d = np.zeros(L, np.float32)
        d[:m] = rng.randn(m).astype(np.float32)
        f = jax.jit(lambda dd, mm, _L=L: W._bluestein_dft(dd, mm, 2 * _L))
        got = np.asarray(f(jnp.asarray(d), jnp.asarray(m)))[:m]
        want = np.fft.fft(d[:m])
        assert np.abs(got - want).max() < 2e-6 * (np.abs(want).max() + 1)


def test_wpcr_batch_equals_eager():
    rng = np.random.RandomState(1)
    # 15 bursts (each distinct length costs an eager-path retrace here —
    # the very dispatch cost the batched path amortizes away)
    bursts = [
        _make_burst(rng, rng.randint(20, 200), int(rng.choice([4, 5, 8, 10])))
        for _ in range(15)
    ] + [np.zeros(2, np.float32), np.ones(50, np.float32)]  # degenerate
    batch = W.wpcr_batch(bursts)
    assert len(batch) == len(bursts)
    n_found = 0
    for b, (syms, info) in zip(bursts, batch):
        centered, ok = W.midpoint(jnp.asarray(b, jnp.float32))
        if len(b) < 4 or not bool(np.asarray(ok)):
            assert not info["found"]
            continue
        s, mask, ii = W.wpcr(centered)
        assert info["found"] == bool(np.asarray(ii["found"]))
        if info["found"]:
            n_found += 1
            es = np.asarray(s)[np.asarray(mask)]
            assert len(es) == len(syms)
            np.testing.assert_allclose(es, syms, atol=1e-4)
            assert info["sps"] == pytest.approx(float(np.asarray(ii["sps"])), abs=1e-6)
    assert n_found >= 12, "corpus must actually exercise the found path"


def test_wpcr_blocks_batched():
    from rustradio_tpu import blocks
    from rustradio_tpu.streams import Pdu

    rng = np.random.RandomState(2)
    bursts = [_make_burst(rng, 50, 8) for _ in range(5)]
    mid = blocks.Midpointer()
    wp = blocks.Wpcr(samp_rate=50_000.0)
    out = wp.apply(mid.apply([Pdu(b) for b in bursts]))
    assert len(out) == 5
    for p in out:
        # ~50 recovered symbols per burst, sps tag ~ 1/8
        assert 45 <= len(np.asarray(p.data)) <= 55
        sps = [t.val for t in p.tags if t.key == "sps"][0]
        assert sps == pytest.approx(1 / 8, rel=0.05)
        assert any(t.key == "frequency" for t in p.tags)


def test_wpcr_batch_decodes_real_packets():
    # full chain sanity: G3RUH bursts through the 9600 wpcr receiver
    from rustradio_tpu.models.ax25 import ax25_9600_wpcr_rx, g3ruh_modulate
    from rustradio_tpu import ops

    payloads = [
        bytes(f"M0THC-1>APRS-{i}:batched wpcr {i}", "ascii") for i in range(4)
    ]
    frames = [np.frombuffer(p, np.uint8) for p in payloads]
    iq_parts = [np.zeros(20_000, np.complex64)]
    for f in frames:
        iq_parts.append(np.asarray(g3ruh_modulate([f], 50_000.0)))
        iq_parts.append(np.zeros(20_000, np.complex64))
    iq = np.concatenate(iq_parts)
    pkts = ax25_9600_wpcr_rx(iq, 50_000.0)
    got = {bytes(p) for p in pkts}
    assert got == set(payloads)


def test_wpcr_batch_long_burst_fallback():
    # bursts past the int32 chirp bound route through the eager path and
    # still agree with it
    rng = np.random.RandomState(3)
    long_burst = _make_burst(rng, 3500, 10)  # 35000 samples -> L would be 65536
    assert len(long_burst) > 32769
    (syms, info), = W.wpcr_batch([long_burst])
    centered, ok = W.midpoint(jnp.asarray(long_burst))
    s, mask, ii = W.wpcr(centered)
    assert info["found"] == bool(np.asarray(ii["found"]))
    if info["found"]:
        es = np.asarray(s)[np.asarray(mask)]
        np.testing.assert_allclose(es, syms, atol=1e-4)

"""Sharded kernels == offline kernels, on an 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustradio_tpu import ops
from rustradio_tpu.parallel import (
    make_mesh,
    sharded_fft_filter,
    sharded_fir_filter,
    sharded_fm_demod,
    sharded_quadrature_demod,
)

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= N_DEV, "conftest should force 8 CPU devices"
    return make_mesh(N_DEV)


def test_sharded_fir_matches_offline(mesh):
    rng = np.random.RandomState(0)
    x = (rng.randn(8 * 512) + 1j * rng.randn(8 * 512)).astype(np.complex64)
    taps = (rng.randn(33)).astype(np.float32).astype(np.complex64)
    got = np.asarray(sharded_fir_filter(jnp.asarray(x), taps, mesh))
    want = np.asarray(ops.fir_filter_full(x, taps))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sharded_fir_decimating(mesh):
    rng = np.random.RandomState(1)
    x = rng.randn(8 * 512).astype(np.float32)
    taps = rng.randn(17).astype(np.float32)
    got = np.asarray(sharded_fir_filter(jnp.asarray(x), taps, mesh, deci=4))
    want = np.asarray(ops.fir_filter_full(x, taps, deci=4))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sharded_fft_filter_matches_offline(mesh):
    rng = np.random.RandomState(2)
    x = (rng.randn(8 * 1024) + 1j * rng.randn(8 * 1024)).astype(np.complex64)
    taps = (rng.randn(63) + 1j * rng.randn(63)).astype(np.complex64)
    got = np.asarray(sharded_fft_filter(jnp.asarray(x), taps, mesh))
    want = np.asarray(ops.fft_filter(x, taps))
    np.testing.assert_allclose(got, want, atol=3e-3)


def test_sharded_quad_demod_matches_offline(mesh):
    rng = np.random.RandomState(3)
    x = (rng.randn(8 * 256) + 1j * rng.randn(8 * 256)).astype(np.complex64)
    got = np.asarray(sharded_quadrature_demod(jnp.asarray(x), 0.7, mesh))
    want = np.asarray(ops.quadrature_demod(x, 0.7))
    np.testing.assert_allclose(got[:-1], want, atol=1e-5)


def test_sharded_fm_demod_chain(mesh):
    from rustradio_tpu import taps as tg

    rng = np.random.RandomState(4)
    n = 8 * 2048
    x = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64)
    taps = tg.low_pass_complex(1_024_000.0, 100_000.0, 50_000.0)
    deci = 4
    got = np.asarray(sharded_fm_demod(jnp.asarray(x), taps, mesh, deci=deci, gain=1.0))
    # blocks' valid-conv streaming alignment (see sharded_fm_demod doc)
    want_f = np.asarray(ops.fir_filter(jnp.asarray(x), taps, deci))
    want = np.asarray(ops.quadrature_demod(jnp.asarray(want_f), 1.0))
    m = min(len(got), len(want))
    np.testing.assert_allclose(got[:m], want[:m], atol=1e-3)
    assert m >= len(want) - 1


def test_sharded_fm_demod_under_jit(mesh):
    # The whole sharded chain must compile as one program.
    from rustradio_tpu import taps as tg

    taps = tg.low_pass_complex(1_024_000.0, 100_000.0, 50_000.0)
    f = jax.jit(lambda x: sharded_fm_demod(x, taps, mesh, deci=4))
    x = jnp.ones(8 * 4096, jnp.complex64)
    out = f(x)
    assert out.shape == (8 * 4096 // 4 - (len(taps) - 1) // 4 - 1,)


def test_rejects_misaligned_length(mesh):
    with pytest.raises(ValueError, match="not divisible"):
        sharded_fir_filter(jnp.ones(100, jnp.complex64), np.ones(3), mesh, deci=4)


def test_pipeline_stages_match_composition():
    import jax.numpy as jnp

    from rustradio_tpu.parallel import make_mesh, pipeline_chain, pipeline_run

    mesh = make_mesh(4, axis="stage")
    stages = [
        lambda v: v * jnp.float32(2.0),
        lambda v: v + jnp.float32(1.0),
        lambda v: jnp.tanh(v),
        lambda v: v - jnp.float32(0.25),
    ]
    rng = np.random.RandomState(0)
    chunks = rng.randn(7, 256).astype(np.float32)
    got = np.asarray(pipeline_run(stages, chunks, mesh))
    want = np.tanh(chunks * 2.0 + 1.0) - 0.25
    np.testing.assert_allclose(got, want, atol=1e-6)

    x = rng.randn(1024).astype(np.float32)
    got2 = np.asarray(pipeline_chain(stages, x, mesh, chunk_len=256))
    np.testing.assert_allclose(got2, np.tanh(x * 2.0 + 1.0) - 0.25, atol=1e-6)


def test_pipeline_run_rates_decimating():
    # a decimating filter stage followed by a demod stage, stage-per-device
    # (reference src/mtgraph.rs:73-149 with rate-changing blocks)
    from rustradio_tpu.parallel import make_mesh, pipeline_run_rates

    mesh = make_mesh(2, axis="stage")
    rng = np.random.RandomState(7)

    def filt_deci(x):  # (1024,) c64 -> (256,) c64: boxcar decimate by 4
        return x.reshape(-1, 4).mean(axis=1)

    def demod(x):  # (256,) c64 -> (255,) stored complex
        return ops.quadrature_demod(x, 1.0).astype(jnp.complex64)

    chunks = (rng.randn(6, 1024) + 1j * rng.randn(6, 1024)).astype(np.complex64)
    got = np.asarray(
        pipeline_run_rates(
            [(filt_deci, 1024, 256), (demod, 256, 255)], chunks, mesh
        )
    )
    assert got.shape == (6, 255)
    for i in range(6):
        want = np.asarray(demod(filt_deci(jnp.asarray(chunks[i]))))
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_pipeline_run_rates_rejects_mismatch():
    from rustradio_tpu.parallel import make_mesh, pipeline_run_rates

    mesh = make_mesh(2, axis="stage")
    with pytest.raises(ValueError):
        pipeline_run_rates(
            [(lambda x: x, 8, 8), (lambda x: x, 9, 9)],
            np.zeros((2, 8), np.complex64),
            mesh,
        )


def test_sharded_bell202_demod_matches_offline(mesh):
    from rustradio_tpu.models.ax25 import bell202_demod
    from rustradio_tpu.parallel import sharded_bell202_demod

    fs = 24_000.0
    rng = np.random.RandomState(9)
    n = 8 * 4096
    # AFSK-ish content: alternating tone bursts + noise
    t = np.arange(n) / fs
    audio = (0.5 * np.sin(2 * np.pi * 1200 * t) * (np.sin(2 * np.pi * 30 * t) > 0)
             + 0.5 * np.sin(2 * np.pi * 2200 * t) * (np.sin(2 * np.pi * 30 * t) <= 0)
             + 0.01 * rng.randn(n)).astype(np.float32)
    got = np.asarray(sharded_bell202_demod(jnp.asarray(audio), fs, mesh))
    want = np.asarray(bell202_demod(jnp.asarray(audio), fs))
    m = len(want)  # offline chain emits n-1
    np.testing.assert_allclose(got[: m], want, atol=2e-3)


def test_sharded_bell202_decodes_packets(mesh):
    # end-to-end: sharded front-end feeds the standard symbol-sync/HDLC
    # tail and decodes the same packets as the single-device chain
    import sys
    sys.path.insert(0, "tests")
    from test_models import make_afsk
    from rustradio_tpu.models.ax25 import ax25_1200_rx
    from rustradio_tpu.parallel import sharded_bell202_demod

    fs = 24_000.0
    payloads = [f"MESH FRAME {i}".encode() for i in range(3)]
    audio = np.concatenate([make_afsk(p, fs=fs, lead_zeros=500) for p in payloads])
    pad = (-len(audio)) % (8 * 256)
    audio = np.concatenate([audio, np.zeros(pad, np.float32)])

    nrz = np.asarray(sharded_bell202_demod(jnp.asarray(audio), fs, mesh))
    syms = ops.recover_symbols(nrz, fs / 1200.0, 0.5, (0.5, 0.5))
    bits = np.asarray(ops.nrzi_decode(ops.binary_slicer(jnp.asarray(syms))))
    pkts, _ = ops.hdlc_deframe(bits, 10, 1500)
    got = [bytes(np.asarray(d)) for d, _ in pkts]
    assert got == payloads
    # and equals the single-device model output
    single = [bytes(p) for p in ax25_1200_rx(audio, fs)]
    assert got == single


def test_sharded_symbol_sync_bank(mesh):
    # channel-sharded clock recovery == the single-device vmapped scan
    from rustradio_tpu.parallel import sharded_symbol_sync_bank
    from rustradio_tpu.models.multichannel import recover_symbols_batch

    rng = np.random.RandomState(3)
    C, nbits, sps = 8, 60, 10
    bits = rng.randint(0, 2, (C, nbits)) * 2.0 - 1.0
    xs = np.repeat(bits, sps, axis=1).astype(np.float32)
    xs += rng.randn(*xs.shape).astype(np.float32) * 0.05

    import jax
    from jax.sharding import Mesh

    cmesh = Mesh(np.asarray(jax.devices()[:8]), ("chan",))
    vals_s, mask_s, clk_s = sharded_symbol_sync_bank(xs, float(sps), cmesh)
    vals, mask, clk = recover_symbols_batch(xs, float(sps))
    np.testing.assert_array_equal(np.asarray(mask_s), np.asarray(mask))
    np.testing.assert_allclose(np.asarray(vals_s), np.asarray(vals), atol=1e-6)
    np.testing.assert_allclose(np.asarray(clk_s), np.asarray(clk), atol=1e-5)

    with pytest.raises(ValueError):
        sharded_symbol_sync_bank(xs[:5], float(sps), cmesh)

    # events method: sharded == single-device events bank
    vals_e, mask_e, _ = sharded_symbol_sync_bank(
        xs, float(sps), cmesh, method="events")
    vals1, mask1, _ = recover_symbols_batch(xs, float(sps), method="events")
    np.testing.assert_array_equal(np.asarray(mask_e), np.asarray(mask1))
    np.testing.assert_allclose(np.asarray(vals_e), np.asarray(vals1),
                               atol=1e-6)

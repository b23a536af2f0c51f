"""Run the REAL Pallas kernel bodies under interpret mode on CPU.

The CPU suite otherwise never executes the TPU kernel code (``_on_tpu()``
routes to XLA fallbacks), so tilings, banded weight layouts, shift-block
slicing, roll-based prev-sample construction, and the cross-tile seam
fixes had no CI coverage.  ``pallas_kernels._INTERPRET`` forces the
kernel paths through ``pl.pallas_call(interpret=True)`` — pure CPU
emulation, compared here against float64 ground truth.
"""

import numpy as np
import pytest

import rustradio_tpu.ops.pallas_kernels as pk


@pytest.fixture
def interpret_kernels(monkeypatch):
    monkeypatch.setattr(pk, "_INTERPRET", True)


def _fir_deci_f64(x, taps, deci):
    """y[m] = sum_j taps[j] x[m*deci - j], zero history, f64."""
    x = np.asarray(x, np.float64)
    t = np.asarray(taps, np.float64)
    m = -(-len(x) // deci)
    xp = np.concatenate([np.zeros(len(t), np.float64), x,
                         np.zeros(deci * m, np.float64)])
    return np.stack(
        [np.dot(t, xp[len(t) + k * deci : len(t) + k * deci - len(t) : -1])
         for k in range(m)]
    )


def test_fir_decimate_interpret_multi_tile(interpret_kernels):
    rng = np.random.RandomState(0)
    taps = rng.randn(49).astype(np.float32)
    # 3 tiles of tile_rows=128 at deci=4 plus a ragged tail: covers the
    # grid loop, the halo block, and the full-group + column-slice shifts
    n = 3 * 128 * 128 * 4 + 777
    x = rng.randn(n).astype(np.float32)
    got = np.asarray(pk.pallas_fir_decimate(x, taps, 4, tile_rows=128))
    want = _fir_deci_f64(x, taps, 4)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5 * np.abs(want).max())


def test_fir_decimate_interpret_deci1_long_taps(interpret_kernels):
    rng = np.random.RandomState(1)
    taps = rng.randn(130).astype(np.float32)  # nshift 2 at deci 1
    n = 2 * 128 * 128 + 55
    x = rng.randn(n).astype(np.float32)
    got = np.asarray(pk.pallas_fir_decimate(x, taps, 1, tile_rows=128))
    want = _fir_deci_f64(x, taps, 1)
    np.testing.assert_allclose(got, want, atol=2e-5 * np.abs(want).max())


def test_quad_demod_interpret_seams(interpret_kernels):
    rng = np.random.RandomState(2)
    n = 2 * 128 * 128 + 100
    x = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64)
    got = np.asarray(pk.pallas_quad_demod(x, 0.7, tile_rows=128))
    d = np.conj(x[:-1].astype(np.complex128)) * x[1:].astype(np.complex128)
    want = 0.7 * np.arctan2(d.imag, d.real)
    assert got.shape == want.shape
    # fast_atan2 polynomial: |err| < ~1e-4 rad
    np.testing.assert_allclose(got, want, atol=2e-4)


def _fm_chain_f64(xr, xi, taps, deci, gain):
    yr = _fir_deci_f64(xr, taps, deci)
    yi = _fir_deci_f64(xi, taps, deci)
    y = yr + 1j * yi
    d = np.conj(y[:-1]) * y[1:]
    return gain * np.arctan2(d.imag, d.real)


@pytest.mark.parametrize(
    "precision,atol",
    [("highest", 2e-4), ("w3", 3e-4), ("w2", 8e-3), ("split3", 8e-3),
     ("i8", 3e-4)],
)
def test_fm_chain_interpret_all_precisions(interpret_kernels, precision, atol):
    rng = np.random.RandomState(3)
    n = 2 * 128 * 128 * 4 + 123  # 2 full tiles at tile_rows=128 + tail
    # 8-bit wire grid: exact in bf16 — required by the w3/w2 modes
    a = (rng.randint(0, 256, n).astype(np.float32) - 127.0) / 128.0
    b = (rng.randint(0, 256, n).astype(np.float32) - 127.0) / 128.0
    taps = np.asarray(
        np.hamming(49) * np.sinc(0.2 * (np.arange(49) - 24)), np.float32
    )
    got = np.asarray(
        pk.pallas_fm_chain(a, b, taps, 4, 0.9, tile_rows=128,
                           precision=precision)
    )
    want = _fm_chain_f64(a, b, taps, 4, 0.9)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=atol)


@pytest.mark.parametrize("deci,ntaps", [(1, 31), (1, 128), (4, 128)])
def test_fm_chain_interpret_i8_deci_taps_matrix(interpret_kernels, deci,
                                                ntaps):
    # the i8 ladder must stay exact-int32 across decimations and tap
    # counts (|acc| bound scales with K = nshift*128)
    rng = np.random.RandomState(6)
    n = 128 * 128 * deci + 57
    a = (rng.randint(0, 256, n).astype(np.float32) - 127.0) / 128.0
    b = (rng.randint(0, 256, n).astype(np.float32) - 127.0) / 128.0
    taps = np.asarray(
        np.hamming(ntaps) * np.sinc(0.18 * (np.arange(ntaps) - ntaps // 2)),
        np.float32,
    )
    got = np.asarray(
        pk.pallas_fm_chain(a, b, taps, deci, 0.8, tile_rows=128,
                           precision="i8")
    )
    want = _fm_chain_f64(a, b, taps, deci, 0.8)
    np.testing.assert_allclose(got, want, atol=1e-3)
    assert float(np.max(np.abs(got - want))) < 5e-4


@pytest.mark.parametrize("precision", ["w3", "i8"])
def test_fm_chain_interpret_offset_fold(interpret_kernels, precision):
    # DC offset folds in post-dot: filter(x + c) = filter(x) + c*sum(taps)
    rng = np.random.RandomState(4)
    n = 128 * 128 * 4
    a = (rng.randint(0, 256, n).astype(np.float32) - 127.0) / 128.0
    b = (rng.randint(0, 256, n).astype(np.float32) - 127.0) / 128.0
    taps = np.asarray(np.hamming(33), np.float32)
    c = 0.3125  # exact bf16 so the f64 model sees the same value
    got = np.asarray(
        pk.pallas_fm_chain(a, b, taps, 4, 1.0, tile_rows=128, offset=c,
                           precision=precision)
    )
    want = _fm_chain_f64(a.astype(np.float64) + c, b.astype(np.float64) + c,
                         taps, 4, 1.0)
    # skip the zero-history warm-up: the kernel's DC fold applies c under
    # the pad region too (documented; same skip as tests/test_pallas.py)
    warm = -(-len(taps) // 4)
    np.testing.assert_allclose(got[warm:], want[warm:], atol=3e-4)


@pytest.mark.parametrize(
    "precision,atol",
    [("highest", 2e-4), ("w3", 3e-4), ("w2", 8e-3), ("split3", 8e-3),
     ("i8", 3e-4)],
)
def test_fm_chain_db_packed_interpret(interpret_kernels, precision, atol):
    # the double-buffered pipeline fed pre-packed planes (fm_plane_pack):
    # in-kernel seam carry + manual DMA loop, all precisions
    rng = np.random.RandomState(4)
    n = 3 * 128 * 128 * 4 + 57  # 3 tiles at tile_rows=128 + ragged tail
    a = (rng.randint(0, 256, n).astype(np.float32) - 127.0) / 128.0
    b = (rng.randint(0, 256, n).astype(np.float32) - 127.0) / 128.0
    taps = np.asarray(
        np.hamming(49) * np.sinc(0.2 * (np.arange(49) - 24)), np.float32
    )
    pa = pk.fm_plane_pack(a, taps, 4, tile_rows=128, precision=precision)
    pb = pk.fm_plane_pack(b, taps, 4, tile_rows=128, precision=precision)
    got = np.asarray(
        pk.pallas_fm_chain(pa, pb, taps, 4, 0.9, tile_rows=128,
                           precision=precision, n=n)
    )
    want = _fm_chain_f64(a, b, taps, 4, 0.9)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=atol)
    # and the db pipeline from FLAT planes matches too (slow path)
    got2 = np.asarray(
        pk.pallas_fm_chain(a, b, taps, 4, 0.9, tile_rows=128,
                           precision=precision, pipeline="db")
    )
    np.testing.assert_allclose(got2, want, atol=atol)


# ---------------------------------------------------------------- lowering

def _demod_f64(y, gain):
    d = np.conj(y[:-1].astype(np.complex128)) * y[1:].astype(np.complex128)
    return gain * np.arctan2(d.imag, d.real)


def _fir_valid_f64(x, taps, deci):
    x = np.asarray(x, np.complex128)
    t = np.asarray(taps, np.float64)
    m = (len(x) - len(t)) // deci + 1
    return np.stack(
        [np.dot(t[::-1], x[k * deci : k * deci + len(t)]) for k in range(m)]
    )


def test_graph_fm_lowering_offline(interpret_kernels):
    # [FloatToComplex ->] FirFilter -> QuadratureDemod lowers to ONE
    # pallas_fm_chain call (r5 verdict item 1); output matches the f64
    # composed chain within the kernel's documented fast-atan2 budget.
    from rustradio_tpu import blocks
    from rustradio_tpu.graph import Graph
    from rustradio_tpu.lowering import find_fm_pairs

    rng = np.random.RandomState(7)
    taps = rng.randn(49).astype(np.float32) / 7
    n = 4096
    re = rng.randn(n).astype(np.float32)
    im = rng.randn(n).astype(np.float32)
    want = _demod_f64(_fir_valid_f64(re + 1j * im, taps, 4), 2.5)

    # pattern A: complex stream in
    g = Graph()
    s = blocks.VectorSink()
    g.chain(
        blocks.VectorSource((re + 1j * im).astype(np.complex64)),
        blocks.FirFilter(taps, deci=4),
        blocks.QuadratureDemod(2.5),
        s,
    )
    seg = list(g._segments().values())[0]
    plans, consumed = find_fm_pairs(seg, set())
    assert len(plans) == 1 and len(consumed) == 2
    g.run()
    got = np.asarray(s.data())
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4)

    # pattern B: planes in, the complex stream never materializes
    g = Graph()
    s = blocks.VectorSink()
    src_r = g.add(blocks.VectorSource(re))
    src_i = g.add(blocks.VectorSource(im))
    f2c = g.add(blocks.FloatToComplex(), src_r, src_i)
    fir = g.add(blocks.FirFilter(taps, deci=4), f2c)
    q = g.add(blocks.QuadratureDemod(2.5), fir)
    g.add(s, q)
    seg = list(g._segments().values())[0]
    plans, consumed = find_fm_pairs(seg, set())
    assert len(plans) == 1 and len(consumed) == 3
    assert next(iter(plans.values()))["f2c"] is not None
    g.run()
    got = np.asarray(s.data())
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_graph_fm_lowering_streaming_equals_offline(interpret_kernels):
    # chunked lowered execution over the ORIGINAL blocks' states matches
    # the lowered offline stream (seam samples recomputed by full-window
    # dots differ from the in-kernel banded accumulation by <1e-5)
    from rustradio_tpu import blocks
    from rustradio_tpu.graph import Graph

    rng = np.random.RandomState(8)
    taps = rng.randn(49).astype(np.float32) / 7
    n = 6000
    data = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64)

    def build(sink):
        g = Graph()
        g.chain(
            blocks.VectorSource(data),
            blocks.FirFilter(taps, deci=4),
            blocks.QuadratureDemod(1.0),
            sink,
        )
        return g

    s0 = blocks.VectorSink()
    build(s0).run()
    want = np.asarray(s0.data())
    for chunk in (2048, 1900):
        s = blocks.VectorSink()
        build(s).run_stream(chunk_size=chunk)
        got = np.asarray(s.data())
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_graph_fm_lowering_skips_tee_consumer(interpret_kernels):
    # a mid-pattern consumer (Tee on the filtered stream) blocks the
    # lowering; the composed path still runs and stays correct
    from rustradio_tpu import blocks
    from rustradio_tpu.graph import Graph
    from rustradio_tpu.lowering import find_fm_pairs

    rng = np.random.RandomState(9)
    taps = rng.randn(33).astype(np.float32) / 5
    data = (rng.randn(3000) + 1j * rng.randn(3000)).astype(np.complex64)
    g = Graph()
    s1, s2 = blocks.VectorSink(), blocks.VectorSink()
    src = g.add(blocks.VectorSource(data))
    fir = g.add(blocks.FirFilter(taps, deci=2), src)
    tee = g.add(blocks.Tee(), fir)
    q = g.add(blocks.QuadratureDemod(1.0), tee[0])
    g.add(s1, q)
    g.add(blocks.ComplexToMag2(), tee[1])
    g.add(s2, g.nodes[-1])
    for seg in g._segments().values():
        plans, _ = find_fm_pairs(seg, set())
        assert plans == {}
    g.run()
    want = _demod_f64(_fir_valid_f64(data, taps, 2), 1.0)
    np.testing.assert_allclose(np.asarray(s1.data()), want, atol=3e-4)


def test_packed_ring_device_loop(interpret_kernels):
    # PackedIqRingSource -> FirFilter -> QuadratureDemod ->
    # DeviceFoldSink through Graph.compile_device_loop: the zero-copy
    # windowed kernel (row offset + seeded demod carry) over a resident
    # packed ring must reproduce the composed valid chain exactly across
    # chunk seams.
    import jax.numpy as jnp

    from rustradio_tpu import blocks
    from rustradio_tpu.graph import Graph

    rng = np.random.RandomState(11)
    taps = (rng.randn(49) / 7).astype(np.float32)  # (49-1) % 4 == 0
    deci, tile_rows = 4, 16
    chunk = deci * 128 * tile_rows  # 8192
    n = 2 * chunk
    re = (np.round(np.clip(rng.randn(n) * 38, -128, 127)) / 128).astype(np.float32)
    im = (np.round(np.clip(rng.randn(n) * 38, -128, 127)) / 128).astype(np.float32)

    g = Graph()
    src = g.add(blocks.PackedIqRingSource(re, im, taps, deci,
                                          precision="w3", tile_rows=tile_rows))
    fir = g.add(blocks.FirFilter(taps, deci=deci, precision="w3"), src)
    q = g.add(blocks.QuadratureDemod(1.5), fir)
    g.add(blocks.DeviceFoldSink(
        fn=lambda c, x: c + jnp.sum(x) + jnp.sum(x * x)), q)
    fn = g.compile_device_loop(chunk, 2)
    got = float(list(fn(0).values())[0])

    want_y = _fir_valid_f64(re + 1j * im, taps, deci)
    want = _demod_f64(want_y, 1.5)
    # emitted stream = the full valid demod stream (both chunks)
    assert len(want) == n // deci - (len(taps) - 1) // deci - 1
    ref = float(np.sum(want) + np.sum(want * want))
    np.testing.assert_allclose(got, ref, rtol=2e-3)

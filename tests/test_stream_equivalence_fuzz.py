"""Randomized streaming == offline equivalence across the block library.

The framework's core contract (blocks/base.py): running ``apply_chunk``
over concatenated chunks must produce exactly the stream ``apply``
produces over the whole input.  These tests build seeded random chains
from the stateful block set and assert data equality between ``run()``
and ``run_stream()`` at odd chunk sizes.
"""

import numpy as np
import pytest

from rustradio_tpu import blocks, taps
from rustradio_tpu.graph import Graph


def _random_chain(rng):
    """A random device/host chain; returns a list of block factories so
    each run gets FRESH block instances (blocks carry state)."""
    factories = []
    n_blocks = rng.randint(2, 6)
    for _ in range(n_blocks):
        kind = rng.randint(0, 8)
        if kind == 0:
            c = float(rng.randn())
            factories.append(lambda c=c: blocks.AddConst(c))
        elif kind == 1:
            c = float(rng.randn()) or 1.0
            factories.append(lambda c=c: blocks.MultiplyConst(c))
        elif kind == 2:
            d = int(rng.randint(0, 20))
            factories.append(lambda d=d: blocks.Delay(d))
        elif kind == 3:
            nt = int(rng.randint(1, 12))
            t = tuple(rng.randn(nt).astype(np.float32).tolist())
            factories.append(lambda t=t: blocks.FirFilter(np.asarray(t, np.float32)))
        elif kind == 4:
            i, d = int(rng.randint(1, 5)), int(rng.randint(1, 5))
            factories.append(lambda i=i, d=d: blocks.RationalResampler(i, d))
        elif kind == 5:
            s = int(rng.randint(0, 50))
            factories.append(lambda s=s: blocks.Skip(s))
        elif kind == 6:
            a = float(rng.uniform(0.01, 0.5))
            factories.append(lambda a=a: blocks.SinglePoleIirFilter(a))
        else:
            factories.append(lambda: blocks.Inspect(lambda x: None))
    return factories


@pytest.mark.parametrize("scan", [None, 4])
@pytest.mark.parametrize("seed", range(12))
def test_random_chain_stream_equals_offline(seed, scan):
    rng = np.random.RandomState(seed)
    factories = _random_chain(rng)
    data = rng.randn(rng.randint(500, 3000)).astype(np.float32)
    chunk = int(rng.choice([17, 64, 129, 333, 1000]))

    def run(streaming):
        g = Graph()
        node = g.add(blocks.VectorSource(data))
        for f in factories:
            node = g.add(f(), node)
        sink = g.add(blocks.VectorSink(), node)
        if streaming:
            g.run_stream(chunk_size=chunk, scan_chunks=scan)
        else:
            g.run()
        return sink.block.data()

    offline = run(False)
    streamed = run(True)
    assert offline.shape == streamed.shape, (
        f"seed {seed}: offline {offline.shape} vs streamed {streamed.shape} "
        f"(chunk {chunk}, chain {[type(f()).__name__ for f in factories]})"
    )
    np.testing.assert_allclose(
        offline, streamed, atol=1e-5,
        err_msg=f"seed {seed} chunk {chunk} "
                f"chain {[type(f()).__name__ for f in factories]}",
    )


@pytest.mark.parametrize("scan", [None, 3])
@pytest.mark.parametrize("seed", range(4))
def test_random_complex_chain_stream_equals_offline(seed, scan):
    rng = np.random.RandomState(1000 + seed)
    data = (rng.randn(2000) + 1j * rng.randn(2000)).astype(np.complex64)
    nt = int(rng.randint(1, 9))
    t = rng.randn(nt).astype(np.float32)

    def run(streaming):
        g = Graph()
        sink = blocks.VectorSink()
        g.chain(
            blocks.VectorSource(data),
            blocks.FirFilter(t.astype(np.complex64)),
            blocks.MultiplyConst(0.5),
            blocks.ComplexToMag2(),
            sink,
        )
        if streaming:
            g.run_stream(chunk_size=111, scan_chunks=scan)
        else:
            g.run()
        return sink.data()

    np.testing.assert_allclose(run(False), run(True), atol=1e-5)

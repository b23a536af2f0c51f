"""Checkpoint/resume and stats utilities."""

import numpy as np

from rustradio_tpu import blocks
from rustradio_tpu.graph import Graph
from rustradio_tpu.utils import RateMeter, load_checkpoint, save_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    states = {
        0: {"hist": jnp.arange(5, dtype=jnp.float32), "phase": jnp.float32(1.5)},
        1: None,
        2: (jnp.uint8(1), jnp.zeros(3, jnp.complex64)),
    }
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, states, offset=12345, extra={"note": "hi"})
    templates = {
        0: {"hist": jnp.zeros(5, jnp.float32), "phase": jnp.float32(0)},
        1: None,
        2: (jnp.uint8(0), jnp.zeros(3, jnp.complex64)),
    }
    got, offset, extra = load_checkpoint(p, templates)
    assert offset == 12345
    assert extra == {"note": "hi"}
    np.testing.assert_array_equal(np.asarray(got[0]["hist"]), np.arange(5))
    assert float(np.asarray(got[0]["phase"])) == 1.5
    assert got[1] is None


def test_stream_resume_matches_uninterrupted(tmp_path):
    rng = np.random.RandomState(0)
    x = rng.randn(2000).astype(np.float32)
    taps = rng.randn(21).astype(np.float32)
    ckpt = str(tmp_path / "c.npz")

    # Uninterrupted run.
    g1 = Graph()
    s1 = blocks.VectorSink()
    g1.chain(blocks.VectorSource(x), blocks.FirFilter(taps), blocks.SinglePoleIirFilter(0.2), s1)
    g1.run_stream(chunk_size=250)

    # Run half, checkpointing every chunk, then "crash" and resume.
    g2 = Graph()
    s2 = blocks.VectorSink()
    g2.chain(blocks.VectorSource(x), blocks.FirFilter(taps), blocks.SinglePoleIirFilter(0.2), s2)
    g2.run_stream(chunk_size=250, max_chunks=4, checkpoint_path=ckpt, checkpoint_every=1)

    g3 = Graph()
    s3 = blocks.VectorSink()
    g3.chain(blocks.VectorSource(x), blocks.FirFilter(taps), blocks.SinglePoleIirFilter(0.2), s3)
    g3.run_stream(chunk_size=250, resume_from=ckpt)

    resumed = np.concatenate([s2.data(), s3.data()])
    np.testing.assert_allclose(resumed, s1.data(), atol=1e-5)


def test_rate_meter():
    m = RateMeter()
    m.add(1000)
    assert m.samples == 1000
    assert "samples" in m.report()


def test_spectrogram_and_render():
    import numpy as np
    from rustradio_tpu import ops
    from rustradio_tpu.utils.waterfall import render_ascii, spectrogram

    x = np.asarray(ops.signal_source_c(8192, 8000.0, 2000.0))
    db = np.asarray(spectrogram(x, 256))
    assert db.shape == (32, 256)
    # peak bin at +2 kHz = 3/4 across the DC-centered axis
    peak = np.argmax(db.mean(axis=0))
    assert abs(peak - (128 + 64)) <= 1
    art = render_ascii(db, width=40, height=10)
    assert len(art.splitlines()) == 10
    assert render_ascii(np.zeros((0, 4))) == "(no data)"


def test_stream_resume_through_symbol_sync(tmp_path):
    # Checkpoint/resume across a digital receive tail, including the
    # native symbol-sync state dict (interoperable with the scan's).
    n = 60_000
    t = np.arange(n)
    nrz = np.sign(np.sin(2 * np.pi * t / 36.75 + 0.4)).astype(np.float32)
    ckpt = str(tmp_path / "sync.npz")

    def build():
        g = Graph()
        s = blocks.VectorSink()
        g.chain(
            blocks.VectorSource(nrz),
            blocks.SymbolSync(36.75, 0.5, (0.5, 0.5)),
            blocks.BinarySlicer(),
            s,
        )
        return g, s

    g1, s1 = build()
    g1.run_stream(chunk_size=7000)

    g2, s2 = build()
    g2.run_stream(chunk_size=7000, max_chunks=4, checkpoint_path=ckpt, checkpoint_every=1)
    g3, s3 = build()
    g3.run_stream(chunk_size=7000, resume_from=ckpt)

    resumed = np.concatenate([s2.data(), s3.data()])
    assert np.array_equal(resumed, s1.data())


def test_resume_preserves_delay_carried_tags(tmp_path):
    # A tag in the last `delay` samples of the checkpointed chunk rides
    # Delay's carried tail; it must re-emit after resume (ADVICE r2: the
    # carried tag queue is host-side state captured via host_state()).
    from rustradio_tpu.streams import Tag

    x = np.arange(1000, dtype=np.float32)
    tags = [Tag(240, "mark", 1), Tag(740, "mark", 2)]
    ckpt = str(tmp_path / "d.npz")

    def build():
        g = Graph()
        s = blocks.VectorSink()
        g.chain(blocks.VectorSource(x, tags=tags), blocks.Delay(30), s)
        return g, s

    g1, s1 = build()
    g1.run_stream(chunk_size=250)

    g2, s2 = build()
    # tag at 240 + delay 30 = position 270 -> rides the tail out of chunk 0
    g2.run_stream(chunk_size=250, max_chunks=1, checkpoint_path=ckpt,
                  checkpoint_every=1)
    g3, s3 = build()
    g3.run_stream(chunk_size=250, resume_from=ckpt)

    resumed = np.concatenate([s2.data(), s3.data()])
    np.testing.assert_allclose(resumed, s1.data())
    want = [(t.pos, t.key, t.val) for t in s1.tags() if t.key == "mark"]
    got2 = [(t.pos, t.key, t.val) for t in s2.tags() if t.key == "mark"]
    got3 = [(t.pos + len(s2.data()), t.key, t.val) for t in s3.tags()
            if t.key == "mark"]
    assert got2 + got3 == want
    assert want  # the marks actually propagated


def test_resume_flushes_clipped_burst(tmp_path):
    # A burst whose TAIL spans the checkpoint boundary and is then clipped
    # by EOF must still be filed after a resume (flush_with_state reads the
    # restored state pytree, not the fresh instance's _last_state).
    from rustradio_tpu.streams import Tag

    x = np.arange(500, dtype=np.float32)
    # burst: start@100 end@430, tail of 100 clipped by EOF at 500
    tags = [Tag(100, "burst", True), Tag(430, "burst", False)]
    ckpt = str(tmp_path / "b.npz")

    def build():
        g = Graph()
        s = blocks.PduVectorSink()
        g.chain(
            blocks.VectorSource(x, tags=tags),
            blocks.StreamToPdu("burst", max_size=100_000, tail=100),
            s,
        )
        return g, s

    g1, s1 = build()
    g1.run_stream(chunk_size=100)
    assert len(s1.pdus()) == 1  # the clipped burst filed at EOF

    # Checkpoint lands exactly at EOF (max_chunks pauses before the flush):
    # the resumed graph sees no further chunks, so its flush MUST read the
    # restored state pytree — the fresh instance's _last_state is None.
    g2, s2 = build()
    g2.run_stream(chunk_size=125, max_chunks=4, checkpoint_path=ckpt,
                  checkpoint_every=4)
    g3, s3 = build()
    g3.run_stream(chunk_size=125, resume_from=ckpt)

    assert len(s3.pdus()) == 1
    np.testing.assert_array_equal(s3.pdus()[0].data, s1.pdus()[0].data)


def test_resume_preserves_burst_interior_tags(tmp_path):
    # non-burst tags collected into an OPEN burst's state ride the
    # checkpoint as real Tag objects (np.asarray would wrap them into 0-d
    # object arrays and break .pos/.key access after resume)
    from rustradio_tpu.streams import Tag

    x = np.arange(500, dtype=np.float32)
    tags = [Tag(100, "burst", True), Tag(150, "mark", 7),
            Tag(430, "burst", False)]
    ckpt = str(tmp_path / "bt.npz")

    def build():
        g = Graph()
        s = blocks.PduVectorSink()
        g.chain(
            blocks.VectorSource(x, tags=tags),
            blocks.StreamToPdu("burst", max_size=100_000, tail=100),
            s,
        )
        return g, s

    g2, s2 = build()
    g2.run_stream(chunk_size=125, max_chunks=4, checkpoint_path=ckpt,
                  checkpoint_every=4)
    g3, s3 = build()
    g3.run_stream(chunk_size=125, resume_from=ckpt)
    assert len(s3.pdus()) == 1
    ptags = s3.pdus()[0].tags
    assert any(isinstance(t, Tag) and t.key == "mark" and t.pos == 50
               for t in ptags), ptags

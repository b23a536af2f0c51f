"""Dynamic Delay block (reference src/delay.rs tests :108-238)."""

import numpy as np
import pytest

from rustradio_tpu import blocks
from rustradio_tpu.graph import Graph
from rustradio_tpu.streams import Tag


def _run(delay_block, data, chunk=None):
    g = Graph()
    sink = g.add(blocks.VectorSink(), g.add(delay_block, g.add(blocks.VectorSource(data))))
    if chunk is None:
        g.run()
    else:
        g.run_stream(chunk_size=chunk)
    return sink.block


def test_delay_zero():
    s = _run(blocks.Delay(0), np.asarray([1.0, 2.0, 3.0], np.float32))
    np.testing.assert_array_equal(s.data(), [1.0, 2.0, 3.0])


def test_delay_one():
    s = _run(blocks.Delay(1), np.asarray([1.0, 2.0, 3.0], np.float32))
    np.testing.assert_array_equal(s.data(), [0.0, 1.0, 2.0, 3.0])


def test_delay_increase_before_work_extends_remaining_delay():
    d = blocks.Delay(1, dynamic=True)
    d.set_delay(2)
    s = _run(d, np.asarray([1, 2], np.int32))
    np.testing.assert_array_equal(s.data(), [0, 0, 1, 2])


def test_delay_decrease_before_work_reduces_remaining_delay():
    d = blocks.Delay(3, dynamic=True)
    d.set_delay(1)
    s = _run(d, np.asarray([1, 2], np.int32))
    np.testing.assert_array_equal(s.data(), [0, 1, 2])


def test_delay_reduced_twice_accumulates_pending_skip():
    # Two reductions accumulate pending skip (reference
    # delay_reduced_twice_accumulates_pending_skip).  Unlike the reference,
    # the static schedule drains ALL pending zeros within a chunk, so after
    # chunk 1 current_delay == 0 and both reductions land on skip (11 + 1).
    cap = 64
    data = np.arange(cap, dtype=np.int32)
    d = blocks.Delay(cap + 10, dynamic=True)
    state = d.init_state()
    state, out = d.apply_chunk(state, data[:0])
    np.testing.assert_array_equal(np.asarray(out), np.zeros(cap + 10, np.int32))
    d.set_delay(cap - 1)
    d.set_delay(cap - 2)
    state, out = d.apply_chunk(state, data)
    np.testing.assert_array_equal(np.asarray(out), data[12:])


def test_delay_mid_stream_decrease_skips_samples():
    # chunk 1: 4 zeros + data[0:8]; reduce delay 4 -> 1 (skip 3); chunk 2
    # drops 3 input samples before resuming the copy
    data = np.arange(16, dtype=np.int32)
    d = blocks.Delay(4, dynamic=True)
    state = d.init_state()
    state, out1 = d.apply_chunk(state, data[:8])
    np.testing.assert_array_equal(
        np.asarray(out1), np.concatenate([np.zeros(4, np.int32), data[:8]])
    )
    d.set_delay(1)
    state, out2 = d.apply_chunk(state, data[8:])
    np.testing.assert_array_equal(np.asarray(out2), data[11:])


def test_delay_mid_stream_increase_inserts_zeros():
    data = np.arange(8, dtype=np.int32)
    d = blocks.Delay(1, dynamic=True)
    state = d.init_state()
    state, out1 = d.apply_chunk(state, data[:4])
    np.testing.assert_array_equal(np.asarray(out1), [0, 0, 1, 2, 3])
    d.set_delay(3)
    state, out2 = d.apply_chunk(state, data[4:])
    np.testing.assert_array_equal(np.asarray(out2), [0, 0, 4, 5, 6, 7])


def test_delay_shifts_tags():
    data = np.arange(8, dtype=np.float32)
    d = blocks.Delay(3)
    g = Graph()
    src = g.add(blocks.VectorSource(data, tags=[Tag(2, "mark", 1)]))
    node = g.add(d, src)
    sink = g.add(blocks.VectorSink(), node)
    g.run()
    assert any(t.key == "mark" and t.pos == 5 for t in sink.block.tags())


def test_delay_streaming_equals_offline():
    data = np.arange(100, dtype=np.float32)
    s1 = _run(blocks.Delay(7), data)
    s2 = _run(blocks.Delay(7), data, chunk=13)
    np.testing.assert_array_equal(s1.data(), s2.data())


def test_static_delay_is_device_fusable():
    d = blocks.Delay(3)
    assert d.domain == "device" and d.jit_chunk
    with pytest.raises(ValueError):
        d.set_delay(1)


def test_dynamic_delay_runs_on_host():
    d = blocks.Delay(3, dynamic=True)
    assert d.domain == "host" and not d.jit_chunk


def test_static_delay_fuses_into_segment():
    # Delay between two device blocks must form ONE fused segment
    from rustradio_tpu.graph import Graph

    g = Graph()
    sink = g.add(
        blocks.VectorSink(),
        g.add(
            blocks.MultiplyConst(2.0),
            g.add(blocks.Delay(4), g.add(blocks.AddConst(1.0),
                                         g.add(blocks.VectorSource(
                                             np.arange(8, dtype=np.float32))))),
        ),
    )
    segs = g._segments()
    assert any(len(s) == 3 for s in segs.values()), "AddConst+Delay+MultiplyConst should fuse"
    g.run()
    want = np.concatenate([np.zeros(4, np.float32), np.arange(8, dtype=np.float32) + 1]) * 2
    np.testing.assert_allclose(sink.block.data(), want)


def test_static_delay_carries_tags_across_chunks():
    # reviewer repro: a tag in the last `delay` samples of a chunk must
    # re-emit in the next chunk, not vanish
    data = np.arange(128, dtype=np.float32)
    d = blocks.Delay(10)
    g = Graph()
    src = g.add(blocks.VectorSource(data, tags=[Tag(58, "mark", 7)]))
    sink = g.add(blocks.VectorSink(), g.add(d, src))
    g.run_stream(chunk_size=64)  # 58 + 10 = 68 >= 64: crosses the boundary
    marks = [t for t in sink.block.tags() if t.key == "mark"]
    assert len(marks) == 1 and marks[0].pos == 68, marks


def test_static_delay_pause_does_not_flush_tail():
    # max_chunks is a PAUSE (checkpoint/resume workflow), not EOF: the
    # carried tail must stay in the state, not drain early
    data = np.arange(40, dtype=np.float32)
    g = Graph()
    sink = g.add(blocks.VectorSink(), g.add(blocks.Delay(5), g.add(blocks.VectorSource(data))))
    g.run_stream(chunk_size=10, max_chunks=2)
    assert len(sink.block.data()) == 20  # exactly two chunks, no tail


def test_static_delay_checkpoint_resume_no_duplicates(tmp_path):
    ck = str(tmp_path / "ck.pkl")
    data = np.arange(40, dtype=np.float32)

    def build():
        g = Graph()
        sink = g.add(
            blocks.VectorSink(),
            g.add(blocks.Delay(5), g.add(blocks.VectorSource(data))),
        )
        return g, sink.block

    g1, s1 = build()
    g1.run_stream(chunk_size=10)
    want = s1.data()
    g2, s2 = build()
    g2.run_stream(chunk_size=10, max_chunks=2, checkpoint_path=ck, checkpoint_every=2)
    g3, s3 = build()
    g3.run_stream(chunk_size=10, resume_from=ck)
    got = np.concatenate([s2.data(), s3.data()])
    np.testing.assert_array_equal(got, want)

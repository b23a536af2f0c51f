"""Streaming-state semantics in the PDU domain.

The reference blocks carry state across reads: StreamToPdu's
Unsync/Packet/Tail machine (src/stream_to_pdu.rs:10-26), KissFrame's
Unsynced/Synced accumulation (src/kiss.rs:160-229), and Hasher's
emit-once-at-EOF (src/hasher.rs:41-49).  These tests split bursts and
frames across run_stream chunk boundaries at several chunk sizes and
require exact equality with offline mode.
"""

import hashlib

import numpy as np
import pytest

from rustradio_tpu import blocks
from rustradio_tpu.graph import Graph


def _burst_graph(data, trigger, tail):
    g = Graph()
    dsrc = g.add(blocks.VectorSource(data))
    tsrc = g.add(blocks.VectorSource(trigger))
    bt = g.add(blocks.BurstTagger(0.5, "burst"), dsrc, tsrc)
    pdu = g.add(blocks.StreamToPdu("burst", 10_000, tail), bt)
    sink = g.add(blocks.PduVectorSink(), pdu)
    return g, sink.block


def _make_bursts():
    rng = np.random.RandomState(7)
    data = rng.randn(2000).astype(np.float32)
    trigger = np.zeros(2000, np.float32)
    # bursts deliberately straddling chunk boundaries for sizes 64/128/333
    for a, b in [(50, 80), (120, 140), (250, 400), (500, 660), (1000, 1010),
                 (1300, 1500), (1950, 1990)]:
        trigger[a:b] = 1.0
    return data, trigger


@pytest.mark.parametrize("tail", [0, 13])
@pytest.mark.parametrize("chunk", [64, 128, 333, 2000])
def test_stream_to_pdu_across_chunks(tail, chunk):
    data, trigger = _make_bursts()
    g1, s1 = _burst_graph(data, trigger, tail)
    g1.run()
    g2, s2 = _burst_graph(data, trigger, tail)
    g2.run_stream(chunk_size=chunk)
    p1 = [np.asarray(p.data) for p in s1.pdus()]
    p2 = [np.asarray(p.data) for p in s2.pdus()]
    assert len(p1) > 0, "test must actually produce bursts"
    assert len(p1) == len(p2)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)


def test_stream_to_pdu_tail_spans_chunks():
    # end tag at 60, tail 20 -> burst body [40,60) + tail [60,80) crosses
    # the 64-sample chunk boundary
    data = np.arange(200, dtype=np.float32)
    trigger = np.zeros(200, np.float32)
    trigger[40:60] = 1.0
    g, s = _burst_graph(data, trigger, tail=20)
    g.run_stream(chunk_size=64)
    pdus = s.pdus()
    assert len(pdus) == 1
    np.testing.assert_array_equal(np.asarray(pdus[0].data), data[40:80])


def test_stream_to_pdu_attaches_other_tags():
    from rustradio_tpu.streams import Tag

    data = np.arange(100, dtype=np.float32)
    g = Graph()
    src = g.add(
        blocks.VectorSource(
            data,
            tags=[Tag(10, "burst", True), Tag(15, "meta", 42), Tag(20, "burst", False)],
        )
    )
    pdu = g.add(blocks.StreamToPdu("burst", 10_000, 0), src)
    sink = g.add(blocks.PduVectorSink(), pdu)
    g.run()
    pdus = sink.block.pdus()
    assert len(pdus) == 1
    np.testing.assert_array_equal(np.asarray(pdus[0].data), data[10:20])
    assert any(t.key == "meta" and t.pos == 5 and t.val == 42 for t in pdus[0].tags)


@pytest.mark.parametrize("chunk", [32, 100])
def test_hasher_emits_once_at_eof(chunk):
    data = np.arange(256, dtype=np.uint8)
    for runner in ("offline", "stream"):
        h = blocks.Hasher()
        g = Graph()
        sink = g.add(blocks.PduVectorSink(), g.add(h, g.add(blocks.VectorSource(data))))
        if runner == "offline":
            g.run()
        else:
            g.run_stream(chunk_size=chunk)
        pdus = sink.block.pdus()
        assert len(pdus) == 1, f"{runner}: expected exactly one digest PDU"
        assert bytes(np.asarray(pdus[0].data)) == hashlib.sha512(data.tobytes()).digest()
        assert h.hexdigest() == hashlib.sha512(data.tobytes()).hexdigest()


def _kiss_stream(payloads):
    from rustradio_tpu.streams import Pdu

    enc = blocks.KissEncode()
    frames = enc.apply([Pdu(np.frombuffer(bytes(p), np.uint8)) for p in payloads])
    return np.concatenate([np.asarray(f.data) for f in frames])


@pytest.mark.parametrize("chunk", [1, 3, 17, 64, 10_000])
def test_kiss_frame_across_chunks(chunk):
    payloads = [
        b"hello world",
        bytes([0xC0, 0xDB, 0x00, 0xC0]),  # needs escaping
        b"x" * 300,
    ]
    stream = _kiss_stream(payloads)
    g = Graph()
    src = g.add(blocks.VectorSource(stream))
    frames = g.add(blocks.KissFrame(), src)
    dec = g.add(blocks.KissDecode(), frames)
    sink = g.add(blocks.PduVectorSink(), dec)
    g.run_stream(chunk_size=chunk)
    got = [bytes(np.asarray(p.data)) for p in sink.block.pdus()]
    assert got == [bytes(p) for p in payloads]


def test_kiss_frame_offline_equals_streaming():
    stream = _kiss_stream([b"abc", b"def", bytes(range(256))])
    kf = blocks.KissFrame()
    offline = [bytes(np.asarray(p.data)) for p in kf.apply(stream)]
    state = kf.init_state()
    streamed = []
    for i in range(0, len(stream), 7):
        state, out = kf.apply_chunk(state, stream[i : i + 7])
        streamed.extend(bytes(np.asarray(p.data)) for p in out)
    assert offline == streamed


def test_kiss_frame_drops_oversized():
    big = np.asarray([0xC0] + [1] * 20_000 + [0xC0, 2, 3, 0xC0], np.uint8)
    kf = blocks.KissFrame(max_len=10_000)
    out = kf.apply(big)
    assert [bytes(np.asarray(p.data)) for p in out] == [bytes([2, 3])]


def test_stream_to_pdu_checkpoint_mid_burst(tmp_path):
    # a checkpoint taken INSIDE an open burst must resume to the same PDU
    ck = str(tmp_path / "ck.pkl")
    rng = np.random.RandomState(0)
    data = rng.randn(1000).astype(np.float32)
    trigger = np.zeros(1000, np.float32)
    trigger[100:400] = 1.0  # spans the 256-sample checkpoint boundary

    g1, s1 = _burst_graph(data, trigger, tail=5)
    g1.run_stream(chunk_size=128)
    want = [np.asarray(p.data) for p in s1.pdus()]
    assert len(want) == 1

    g2, s2 = _burst_graph(data, trigger, tail=5)
    g2.run_stream(chunk_size=128, max_chunks=2, checkpoint_path=ck,
                  checkpoint_every=2)
    g3, s3 = _burst_graph(data, trigger, tail=5)
    g3.run_stream(chunk_size=128, resume_from=ck)
    got = [np.asarray(p.data) for p in s2.pdus() + s3.pdus()]
    assert len(got) == 1
    np.testing.assert_array_equal(want[0], got[0])


def test_stream_to_pdu_eof_clipped_tail_is_filed():
    # end tag arrives, but the stream ends inside the tail: the burst is
    # filed truncated at EOF (flush pass) instead of silently lost
    data = np.arange(100, dtype=np.float32)
    trigger = np.zeros(100, np.float32)
    trigger[50:95] = 1.0  # end tag at 95; tail 20 runs past the stream end
    for chunk in (None, 32):
        g, s = _burst_graph(data, trigger, tail=20)
        if chunk is None:
            g.run()
        else:
            g.run_stream(chunk_size=chunk)
        pdus = s.pdus()
        assert len(pdus) == 1
        np.testing.assert_array_equal(np.asarray(pdus[0].data), data[50:100])


def test_stream_to_pdu_open_burst_memory_bounded():
    # a stuck-high trigger must not grow the carried buffer unboundedly
    b = blocks.StreamToPdu("burst", max_size=1000, tail=0)
    from rustradio_tpu.streams import Tag

    state = b.init_state()
    b.set_tags([Tag(0, "burst", True)])
    state, _ = b.apply_chunk(state, np.zeros(5000, np.float32))
    b.set_tags([])
    for _ in range(10):
        state, _ = b.apply_chunk(state, np.zeros(5000, np.float32))
    assert len(state["buf"]) <= 1001
    # and the oversized burst is still dropped at its end tag
    b.set_tags([Tag(0, "burst", False)])
    state, pdus = b.apply_chunk(state, np.zeros(10, np.float32))
    assert pdus == []


def test_stream_to_pdu_under_scan_runner():
    # burst machines are host blocks: the scan runner must hand them
    # chunks in order with per-chunk tags, identical to per-chunk mode
    from rustradio_tpu.streams import Tag

    x = np.arange(6000, dtype=np.float32)
    tags = [Tag(700, "burst", True), Tag(1200, "burst", False),
            Tag(2900, "burst", True), Tag(4400, "burst", False)]

    def run(scan):
        g = Graph()
        sink = blocks.PduVectorSink()
        g.chain(
            blocks.VectorSource(x, tags=tags),
            blocks.MultiplyConst(2.0),
            blocks.StreamToPdu("burst", max_size=100_000, tail=10),
            sink,
        )
        g.run_stream(chunk_size=512, scan_chunks=scan)
        return sink.pdus()

    p0 = run(None)
    p1 = run(4)
    assert len(p0) == len(p1) == 2
    for a, b in zip(p0, p1):
        np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))

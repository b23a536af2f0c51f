"""Parser robustness: random/garbage input must yield clean results or
the documented error types — never crashes or hangs.

Covers the framed/streaming parsers that eat untrusted bytes: the
DATA_STREAM BytesReader, KISS framing/decoding, the HDLC state machine,
IL2P header hunting, and the .au header parse.
"""

import numpy as np
import pytest

from rustradio_tpu import blocks, ops
from rustradio_tpu.io import data_stream as ds
from rustradio_tpu.streams import Pdu


RNG = np.random.RandomState(0xFADE)


def _chunks(data, sizes):
    out, i = [], 0
    for s in sizes:
        out.append(data[i : i + s])
        i += s
    if i < len(data):
        out.append(data[i:])
    return out


def test_data_stream_bytes_reader_fuzz():
    for trial in range(50):
        parser = ds.BytesReader()
        data = RNG.randint(0, 256, RNG.randint(1, 400)).astype(np.uint8).tobytes()
        try:
            for c in _chunks(data, RNG.randint(1, 64, 8)):
                parser.feed(c)
        except ds.ProtocolError:
            pass  # the documented failure mode


def test_data_stream_reader_valid_then_garbage():
    parser = ds.BytesReader()
    assert parser.feed(ds.encode_version()) == [("version", 0)]
    with pytest.raises(ds.ProtocolError):
        # huge length prefix
        parser.feed(b"\xff\xff\xff\xff\x03")


def test_kiss_frame_and_decode_fuzz():
    for trial in range(50):
        data = RNG.randint(0, 256, RNG.randint(1, 600)).astype(np.uint8)
        kf = blocks.KissFrame(max_len=256)
        state = kf.init_state()
        frames = []
        for c in _chunks(data, RNG.randint(1, 64, 8)):
            state, out = kf.apply_chunk(state, c)
            frames.extend(out)
        # whatever the framer produced must pass through the decoder
        # without raising; bad escapes are silently dropped
        blocks.KissDecode().apply(frames)


def test_hdlc_state_machine_fuzz():
    from rustradio_tpu.ops.hdlc import HdlcStateMachine

    for trial in range(20):
        sm = HdlcStateMachine(1, 200, False, trial % 2 == 1)
        bits = RNG.randint(0, 2, 5000).astype(np.uint8)
        for c in _chunks(bits, RNG.randint(1, 700, 8)):
            sm.feed(c)
        # resumability survives garbage
        snap = sm.snapshot()
        sm.restore(snap)


def test_il2p_deframe_fuzz():
    from rustradio_tpu.ops.il2p import il2p_deframe

    for trial in range(10):
        bits = RNG.randint(0, 2, 4000).astype(np.uint8)
        il2p_deframe(bits)  # must not raise on noise


def test_au_decode_garbage():
    from rustradio_tpu.io.au import au_decode

    with pytest.raises(ValueError):
        au_decode(b"\x00" * 64, 48_000)
    # truncated-but-valid magic: header longer than the data
    hdr = b".snd" + b"\x00\x00\x00\x80"
    with pytest.raises(ValueError):
        au_decode(hdr + b"\x00" * 8, 48_000)


def test_stream_to_pdu_garbage_tags():
    from rustradio_tpu.streams import Tag

    b = blocks.StreamToPdu("burst", 100, 3)
    state = b.init_state()
    for trial in range(20):
        n = RNG.randint(1, 200)
        x = RNG.randn(n).astype(np.float32)
        tags = [
            Tag(int(RNG.randint(-5, n + 5)), "burst", bool(RNG.randint(0, 2)))
            for _ in range(RNG.randint(0, 6))
        ]
        b.set_tags(tags)
        state, _ = b.apply_chunk(state, x)

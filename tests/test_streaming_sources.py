"""Streaming sources with bounded memory.

Reference semantics: file_source.rs reads incrementally (:44-90),
reader_source.rs streams via a thread + channel (:24-47), tcp_source.rs
reads from a live socket.  These tests check that none of the repo's
counterparts hold the whole stream in memory and that EOF ends
``run_stream`` early via ``exhausted()``.
"""

import io
import os
import socket
import threading

import numpy as np

from rustradio_tpu import blocks
from rustradio_tpu.graph import Graph


def test_file_source_streams_huge_sparse_file(tmp_path):
    # 8 GiB sparse file: loading it whole would OOM; streaming the first
    # few chunks must not.
    path = str(tmp_path / "huge.f32")
    with open(path, "wb") as f:
        f.truncate(8 << 30)
    src = blocks.FileSource(path, dtype="f32")
    assert src.total_len() == (8 << 30) // 4
    g = Graph()
    sink = g.add(blocks.VectorSink(), g.add(src))
    g.run_stream(chunk_size=1 << 16, max_chunks=4)
    assert len(sink.block.data()) == 4 << 16
    os.remove(path)


def test_file_source_incremental_matches_whole(tmp_path):
    data = np.arange(1000, dtype=np.float32)
    path = str(tmp_path / "x.f32")
    data.tofile(path)
    src = blocks.FileSource(path, dtype="f32", repeat=3)
    assert src.total_len() == 3000
    # windows, including ones that wrap the repeat boundary
    np.testing.assert_array_equal(np.asarray(src.emit(0, 10)), data[:10])
    np.testing.assert_array_equal(np.asarray(src.emit(995, 10)),
                                  np.concatenate([data[995:], data[:5]]))
    np.testing.assert_array_equal(np.asarray(src.emit(2990, 10)), data[990:])


def test_reader_source_streams_and_ends_at_eof():
    payload = bytes(range(256)) * 400  # 102400 bytes
    src = blocks.ReaderSource(io.BytesIO(payload), read_size=1024)
    g = Graph()
    sink = g.add(blocks.VectorSink(), g.add(src))
    # nominal bound far larger than the data: EOF must end the stream
    g.run_stream(chunk_size=4096, max_chunks=1000)
    assert bytes(sink.block.data().astype(np.uint8)) == payload
    assert src.exhausted()


def test_tcp_source_bounded_buffer():
    payload = os.urandom(65536)
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        conn.sendall(payload)
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    src = blocks.TcpSource("127.0.0.1", port)  # no max_bytes needed
    g = Graph()
    sink = g.add(blocks.VectorSink(), g.add(src))
    g.run_stream(chunk_size=4096, max_chunks=100)
    assert bytes(sink.block.data().astype(np.uint8)) == payload
    # consumed bytes are dropped, not accumulated
    assert len(src._buf) == 0
    t.join(timeout=5)

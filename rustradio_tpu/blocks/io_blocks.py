"""I/O and misc blocks: au codec, RTL-SDR codec, TCP/reader/writer, strobe.

Reference: src/au.rs, src/rtlsdr_decode.rs, src/rtlsdr_encode.rs,
src/tcp_source.rs, src/reader_source.rs, src/writer_sink.rs, src/strobe.rs.
"""

from __future__ import annotations

import struct

import jax.numpy as jnp
import numpy as np

from ..streams import Pdu
from .base import Block, SourceBlock


class AuDecode(Block):
    """.au bytes -> float samples (reference src/au.rs:196-285).

    Streaming-capable: carries header parse state and an odd trailing byte.
    """

    domain = "host"

    def __init__(self, bitrate: int):
        self.bitrate = bitrate
        self._header_done = False
        self._buf = b""

    def apply(self, x):
        from ..io.au import au_decode

        data = np.asarray(x, np.uint8).tobytes()
        samples, _ = au_decode(data, self.bitrate)
        return jnp.asarray(samples)

    def init_state(self):
        self._header_done = False
        self._buf = b""
        return None

    def apply_chunk(self, state, x):
        self._buf += np.asarray(x, np.uint8).tobytes()
        if not self._header_done:
            if len(self._buf) < 24:
                return None, jnp.zeros(0, jnp.float32)
            magic, offset = struct.unpack(">II", self._buf[:8])
            if magic != 0x2E736E64:
                raise ValueError(".au magic value not found")
            if len(self._buf) < offset:
                return None, jnp.zeros(0, jnp.float32)
            enc, rate, chans = struct.unpack(">III", self._buf[12:24])
            if enc != 3:
                raise ValueError("only PCM16 encoding supported")
            if rate != self.bitrate:
                raise ValueError(f"AU expected bitrate {self.bitrate}, got {rate}")
            self._buf = self._buf[offset:]
            self._header_done = True
        n = len(self._buf) // 2
        pcm = np.frombuffer(self._buf[: 2 * n], dtype=">i2").astype(np.float32)
        self._buf = self._buf[2 * n :]
        return None, jnp.asarray(pcm / np.float32(32767.0))


class AuEncode(Block):
    """float samples -> .au bytes (reference src/au.rs:51-154)."""

    domain = "host"

    def __init__(self, bitrate: int, channels: int = 1):
        if channels != 1:
            raise ValueError("only mono supported at the moment")
        self.bitrate = bitrate
        self._header_sent = False

    def _header(self) -> np.ndarray:
        h = struct.pack(
            ">IIIIII4x", 0x2E736E64, 28, 0xFFFFFFFF, 3, self.bitrate, 1
        )
        return np.frombuffer(h, np.uint8)

    def apply(self, x):
        from .. import native

        pcm = native.convert_f32_i16be(np.asarray(x, np.float32))
        return jnp.asarray(np.concatenate([self._header(), pcm]))

    def init_state(self):
        self._header_sent = False
        return None

    def apply_chunk(self, state, x):
        from .. import native

        pcm = native.convert_f32_i16be(np.asarray(x, np.float32))
        if not self._header_sent:
            self._header_sent = True
            pcm = np.concatenate([self._header(), pcm])
        return None, jnp.asarray(pcm)


class RtlSdrDecode(Block):
    """u8 offset-127 IQ -> complex64 (reference src/rtlsdr_decode.rs)."""

    def apply(self, x):
        x = jnp.asarray(x, jnp.uint8)
        f = x.astype(jnp.float32) - jnp.float32(127.0)
        iq = f.reshape(-1, 2)
        import jax

        return jax.lax.complex(iq[:, 0], iq[:, 1]) * jnp.float32(0.008)


class RtlSdrEncode(Block):
    """complex64 -> u8 offset-127 IQ (reference src/rtlsdr_encode.rs)."""

    def apply(self, x):
        x = jnp.asarray(x, jnp.complex64) / jnp.float32(0.008)
        out = jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1).reshape(-1)
        return jnp.clip(jnp.round(out + 127.0), 0, 255).astype(jnp.uint8)


class CmaEqualizer(Block):
    """CMA blind equalizer (reference src/cma.rs)."""

    domain = "host"  # adaptive scan; output shorter than input

    def __init__(self, ntaps: int, desired_modulus: float = 1.0, step_size: float = 1e-3):
        if ntaps == 0:
            raise ValueError("ntaps must be nonzero")
        self.ntaps = ntaps
        self.desired_modulus = desired_modulus
        self.step_size = step_size

    def apply(self, x):
        from ..ops.cma import cma_equalize

        y, _ = cma_equalize(x, self.ntaps, self.desired_modulus, self.step_size)
        return y

    def init_state(self):
        return {
            "taps": jnp.zeros(self.ntaps, jnp.complex64).at[0].set(1.0),
            "carry": jnp.zeros(0, jnp.complex64),
        }

    def apply_chunk(self, state, x):
        from ..ops.cma import cma_equalize

        buf = jnp.concatenate([state["carry"], jnp.asarray(x, jnp.complex64)])
        if buf.shape[0] < self.ntaps:
            return {"taps": state["taps"], "carry": buf}, jnp.zeros(0, jnp.complex64)
        y, taps = cma_equalize(
            buf, self.ntaps, self.desired_modulus, self.step_size, taps=state["taps"]
        )
        return {"taps": taps, "carry": buf[-(self.ntaps - 1):] if self.ntaps > 1 else buf[:0]}, y


class Strobe(SourceBlock):
    """Periodic message emitter (reference src/strobe.rs) — in the static
    schedule this is simply n copies of a PDU."""

    domain = "host"

    def __init__(self, message, count: int = 1):
        self.message = np.asarray(message)
        self.count = count

    def total_len(self):
        return self.count

    def emit(self, offset, n):
        return [Pdu(self.message.copy()) for _ in range(n)]


class ReaderSource(SourceBlock):
    """Any readable byte object -> u8 stream (reference src/reader_source.rs).

    Streams via a background thread + bounded queue, like the reference's
    thread + mpsc channel (src/reader_source.rs:24-47) — the reader is
    never slurped whole, and memory is bounded by the queue depth.
    ``n=None`` makes the source unbounded (use ``max_chunks`` or Head);
    the stream ends early at reader EOF via ``exhausted()``.
    """

    domain = "host"

    def __init__(self, reader, n: int | None = None, read_size: int = 65536,
                 queue_depth: int = 4):
        import queue
        import threading

        self.reader = reader
        self.n = n
        self._q: queue.Queue = queue.Queue(maxsize=queue_depth)
        self._buf = bytearray()
        self._eof = False

        def pump():
            while True:
                data = reader.read(read_size)
                self._q.put(data)
                if not data:
                    return

        self._thread = threading.Thread(target=pump, daemon=True)
        self._thread.start()

    def total_len(self):
        return self.n

    def exhausted(self) -> bool:
        return self._eof and not self._buf

    def emit(self, offset, n):
        while len(self._buf) < n and not self._eof:
            data = self._q.get()
            if not data:
                self._eof = True
                break
            self._buf.extend(data)
        take = min(n, len(self._buf))
        out = np.frombuffer(bytes(self._buf[:take]), np.uint8)
        del self._buf[:take]
        return jnp.asarray(out)

    def apply(self):
        # offline mode: drain the reader to EOF
        if self.n is not None:
            return self.emit(0, self.n)
        parts = []
        while not self.exhausted():
            out = np.asarray(self.emit(0, 65536))
            if len(out):
                parts.append(out)
        return jnp.asarray(
            np.concatenate(parts) if parts else np.zeros(0, np.uint8)
        )


class WriterSink(Block):
    """Any writable object sink (reference src/writer_sink.rs)."""

    n_out = 0
    domain = "host"

    def __init__(self, writer):
        self.writer = writer

    def apply(self, x):
        self.writer.write(np.asarray(x).tobytes())
        return ()


class TcpSource(SourceBlock):
    """TCP client source (reference src/tcp_source.rs): connects and
    streams bytes.

    Memory is bounded: received bytes are dropped once consumed (the
    graph reads sequentially).  ``max_bytes=None`` streams until the peer
    closes (use ``max_chunks``); the stream ends early via ``exhausted()``.
    """

    domain = "host"

    def __init__(self, host: str, port: int, max_bytes: int | None = None):
        self.host, self.port, self.max_bytes = host, port, max_bytes
        self._sock = None
        self._buf = bytearray()
        self._base = 0  # stream offset of _buf[0]
        self._eof = False

    def _connect(self):
        if self._sock is None:
            import socket

            self._sock = socket.create_connection((self.host, self.port))
        return self._sock

    def total_len(self):
        return self.max_bytes

    def exhausted(self) -> bool:
        return self._eof and not self._buf

    def emit(self, offset, n):
        if offset < self._base:
            raise ValueError("TcpSource is sequential; cannot re-read old bytes")
        s = self._connect()
        need = offset + n - (self._base + len(self._buf))
        while need > 0 and not self._eof:
            chunk = s.recv(min(65536, need))
            if not chunk:
                self._eof = True
                break
            self._buf.extend(chunk)
            need -= len(chunk)
        lo = offset - self._base
        hi = min(lo + n, len(self._buf))
        out = np.frombuffer(bytes(self._buf[lo:hi]), np.uint8)
        # drop consumed bytes: memory stays bounded on long-running feeds
        del self._buf[:hi]
        self._base += hi
        return jnp.asarray(out)

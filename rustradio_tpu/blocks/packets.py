"""Packet/PDU-domain blocks (reference L5 protocol back-ends).

PDU streams flow between host blocks as lists of :class:`Pdu`.
"""

from __future__ import annotations

import hashlib

import jax.numpy as jnp
import numpy as np

from .. import ops
from ..streams import Pdu, Tag
from .base import Block

KISS_FEND, KISS_FESC, KISS_TFEND, KISS_TFESC = 0xC0, 0xDB, 0xDC, 0xDD


class HdlcDeframer(Block):
    """Bit stream -> packet PDUs (reference src/hdlc_deframer.rs)."""

    domain = "host"

    def __init__(self, min_size: int = 10, max_size: int = 1500,
                 fix_bits: bool = False, keep_checksum: bool = False):
        from ..ops.hdlc import HdlcStateMachine

        self.min_size, self.max_size = min_size, max_size
        self.fix_bits, self.keep_checksum = fix_bits, keep_checksum
        self._sm = HdlcStateMachine(min_size, max_size, keep_checksum, fix_bits)

    @property
    def stats(self):
        return self._sm.stats

    def _emit(self, pkts):
        return [Pdu(d, [Tag(0, "packet_pos", int(p))]) for d, p in pkts]

    def apply(self, x):
        return self._emit(self._sm.feed(np.asarray(x, np.uint8)))

    def init_state(self):
        from ..ops.hdlc import HdlcStateMachine

        self._sm = HdlcStateMachine(
            self.min_size, self.max_size, self.keep_checksum, self.fix_bits
        )
        return self._sm.snapshot()

    def apply_chunk(self, state, x):
        # The resumable state machine handles frames across chunk
        # boundaries; its snapshot IS the checkpointable state.
        self._sm.restore(state)
        pdus = self._emit(self._sm.feed(np.asarray(x, np.uint8)))
        return self._sm.snapshot(), pdus


class HdlcFramer(Block):
    """Packet PDU -> stuffed bit PDU (reference src/hdlc_framer.rs)."""

    domain = "host"

    def __init__(self, sync_bytes: int = 20):
        self.sync_bytes = sync_bytes

    def apply(self, pdus):
        return [Pdu(ops.hdlc_frame(p.data, self.sync_bytes), p.tags) for p in pdus]


class FcsAdder(Block):
    """Append CRC-16 (reference src/hdlc_framer.rs:28-42)."""

    domain = "host"

    def apply(self, pdus):
        return [Pdu(ops.fcs_add(p.data), p.tags) for p in pdus]


class BurstTagger(Block):
    """Adds 'burst' true/false tags where the trigger stream crosses the
    threshold (reference src/burst_tagger.rs)."""

    n_in = 2
    domain = "host"

    def __init__(self, threshold: float, tag: str = "burst"):
        self.threshold = threshold
        self.tag = tag
        self._last = False

    def init_state(self):
        self._last = False
        return {"last": False}

    def apply_chunk(self, state, data, trigger):
        self._last = state["last"]
        out = self.apply(data, trigger)
        return {"last": self._last}, out

    def apply(self, data, trigger):
        start, end = ops.burst_tagger(trigger, self.threshold, last=self._last)
        start, end = np.asarray(start), np.asarray(end)
        cur = np.asarray(trigger) > self.threshold
        if len(cur):
            self._last = bool(cur[-1])
        self._edge_tags = sorted(
            [Tag(int(i), self.tag, True) for i in np.flatnonzero(start)]
            + [Tag(int(i), self.tag, False) for i in np.flatnonzero(end)]
        )
        return data

    def process_tags(self, in_tags, out_lens):
        base = list(in_tags[0]) if in_tags else []
        return [sorted(base + self._edge_tags)]


class StreamToPdu(Block):
    """Tagged stream -> burst PDUs (reference src/stream_to_pdu.rs)."""

    domain = "host"

    def __init__(self, tag: str = "burst", max_size: int = 10_000, tail: int = 0):
        self.tag, self.max_size, self.tail = tag, max_size, tail

    def apply(self, x):
        # Tags are delivered via set_tags() by the graph before apply.
        tags = getattr(self, "_in_tags", [])
        n = len(np.asarray(x))
        start = np.zeros(n, bool)
        end = np.zeros(n, bool)
        for t in tags:
            if t.key == self.tag and 0 <= t.pos < n:
                if t.val:
                    start[t.pos] = True
                else:
                    end[t.pos] = True
        segs = ops.stream_to_pdu(np.asarray(x), start, end, self.max_size, self.tail)
        return [Pdu(s) for s in segs]

    def set_tags(self, tags):
        self._in_tags = tags


class PduToStream(Block):
    """PDU -> stream with start/end tags (reference src/pdu_to_stream.rs)."""

    domain = "host"

    def apply(self, pdus):
        if not pdus:
            self._tags = []
            return jnp.zeros(0)
        arrs = [np.asarray(p.data) for p in pdus]
        self._tags = []
        off = 0
        for a in arrs:
            self._tags.append(Tag(off, "PduToStream::start", True))
            off += len(a)
            self._tags.append(Tag(off - 1, "PduToStream::end", True))
        return jnp.asarray(np.concatenate(arrs))

    def process_tags(self, in_tags, out_lens):
        return [list(self._tags)]


class Midpointer(Block):
    """Re-center bursts (reference src/wpcr.rs:44-82)."""

    domain = "host"

    def apply(self, pdus):
        out = []
        for p in pdus:
            centered, ok = ops.midpoint(jnp.asarray(p.data, jnp.float32))
            if bool(np.asarray(ok)):
                out.append(Pdu(np.asarray(centered), p.tags))
        return out


class Wpcr(Block):
    """Whole-packet clock recovery (reference src/wpcr.rs:105-215)."""

    domain = "host"

    def __init__(self, samp_rate: float | None = None):
        self.samp_rate = samp_rate

    def apply(self, pdus):
        out = []
        for p in pdus:
            if len(np.asarray(p.data)) < 4:
                continue
            samples, mask, info = ops.wpcr(jnp.asarray(p.data, jnp.float32))
            if not bool(np.asarray(info["found"])):
                continue
            syms = np.asarray(samples)[np.asarray(mask)]
            tags = [
                Tag(0, "sps", float(info["sps"])),
                Tag(0, "phase", float(info["phase"])),
            ]
            if self.samp_rate is not None:
                tags.append(Tag(0, "frequency", float(info["sps"]) * self.samp_rate))
            out.append(Pdu(syms, tags))
        return out


class Fft(Block):
    """FFT per PDU (reference src/fft.rs)."""

    domain = "host"

    def __init__(self, size: int | None = None, window=None, shift: bool = False):
        self.size, self.window, self.shift = size, window, shift

    def apply(self, pdus):
        out = []
        for p in pdus:
            d = np.asarray(p.data)
            if self.size is not None and len(d) != self.size:
                raise ValueError(f"FFT expected {self.size} samples, got {len(d)}")
            out.append(Pdu(np.asarray(ops.fft_pdu(d, self.window, self.shift)), p.tags))
        return out


class FftStream(Block):
    """Streaming framed FFT (reference src/fft_stream.rs)."""

    def __init__(self, size: int):
        if size <= 0:
            raise ValueError("FFT size must be nonzero")
        self.size = size

    def apply(self, x):
        out, _, _ = ops.fft_stream(x, self.size)
        return out

    def init_state(self):
        return jnp.zeros(0, jnp.complex64)

    def apply_chunk(self, state, x):
        ext = jnp.concatenate([state, jnp.asarray(x, jnp.complex64)])
        out, nframes, leftover = ops.fft_stream(ext, self.size)
        return leftover, out


class PduWriter(Block):
    """Write each PDU to a file named by receive time
    (reference src/pdu_writer.rs)."""

    n_out = 0
    domain = "host"

    def __init__(self, directory: str):
        import os

        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self._count = 0

    def apply(self, pdus):
        import os
        import time

        for p in pdus:
            name = f"{time.strftime('%Y-%m-%dT%H:%M:%S')}.{self._count:06d}"
            with open(os.path.join(self.directory, name), "wb") as f:
                f.write(np.asarray(p.data, np.uint8).tobytes())
            self._count += 1
        return ()


class KissEncode(Block):
    """Packet PDU -> KISS-framed PDU (reference src/kiss.rs escape())."""

    domain = "host"

    def apply(self, pdus):
        out = []
        for p in pdus:
            port = 0
            for t in p.tags:
                if t.key == "KissEncode:port":
                    port = int(t.val)
            b = [KISS_FEND, (port << 4) & 0xFF]
            for v in np.asarray(p.data, np.uint8):
                v = int(v)
                if v == KISS_FEND:
                    b += [KISS_FESC, KISS_TFEND]
                elif v == KISS_FESC:
                    b += [KISS_FESC, KISS_TFESC]
                else:
                    b.append(v)
            b.append(KISS_FEND)
            out.append(Pdu(np.asarray(b, np.uint8), p.tags))
        return out


class KissDecode(Block):
    """KISS frame -> packet PDU (reference src/kiss.rs unescape())."""

    domain = "host"

    def apply(self, pdus):
        out = []
        for p in pdus:
            data = np.asarray(p.data, np.uint8)
            nz = np.flatnonzero(data != KISS_FEND)
            if nz.size == 0:
                continue
            body = data[nz[0] : nz[-1] + 1]
            port, body = int(body[0]), body[1:]
            if port & 0xF != 0:
                continue  # non-data packet
            un, esc, bad = [], False, False
            for v in body:
                v = int(v)
                if esc:
                    if v == KISS_TFESC:
                        un.append(KISS_FESC)
                    elif v == KISS_TFEND:
                        un.append(KISS_FEND)
                    else:
                        bad = True
                        break
                    esc = False
                elif v == KISS_FESC:
                    esc = True
                elif v == KISS_FEND:
                    bad = True
                    break
                else:
                    un.append(v)
            if bad or esc:
                continue
            out.append(
                Pdu(np.asarray(un, np.uint8), p.tags + [Tag(0, "KissDecode:port", port >> 4)])
            )
        return out


MORSE_TABLE = {
    **{
        chr(ord("a") + i): code
        for i, code in enumerate(
            [".-", "-...", "-.-.", "-..", ".", "..-.", "--.", "....", "..",
             ".---", "-.-", ".-..", "--", "-.", "---", ".--.", "--.-", ".-.",
             "...", "-", "..-", "...-", ".--", "-..-", "-.--", "--.."]
        )
    },
    **{
        str(d): code
        for d, code in enumerate(
            ["-----", ".----", "..---", "...--", "....-", ".....", "-....",
             "--...", "---..", "----."]
        )
    },
}


def morse_encode_bits(msg: str) -> np.ndarray:
    """String -> on/off keying bits (reference src/morse_encode.rs:32-79)."""
    out: list[int] = []
    chars = list(msg)
    for i, c in enumerate(chars):
        lc = c.lower()
        if lc in MORSE_TABLE:
            for sym in MORSE_TABLE[lc]:
                out.extend([1, 0] if sym == "." else [1, 1, 1, 0])
            nxt = chars[i + 1] if i + 1 < len(chars) else None
            if nxt is not None and nxt != " ":
                out.extend([0, 0])
        elif c == " ":
            out.extend([0, 0, 0, 0, 0, 0])
    out.extend([0, 0, 0, 0, 0, 0])
    return np.asarray(out, np.uint8)


class MorseEncode(Block):
    """String PDUs -> on/off keying PDUs (reference src/morse_encode.rs)."""

    domain = "host"

    def apply(self, pdus):
        return [Pdu(morse_encode_bits(str(p.data)), p.tags) for p in pdus]


class Hasher(Block):
    """SHA-512 of the whole stream -> one PDU (reference src/hasher.rs)."""

    domain = "host"
    n_out = 1

    def __init__(self, kind: str = "sha512"):
        self._h = hashlib.new(kind)

    def apply(self, x):
        self._h.update(np.asarray(x, np.uint8).tobytes())
        return [Pdu(np.frombuffer(self._h.digest(), np.uint8))]

    def hexdigest(self) -> str:
        return self._h.hexdigest()


class ToText(Block):
    """Streams -> text lines (reference src/to_text.rs)."""

    domain = "host"

    def __init__(self, n_in: int = 1):
        self.n_in = n_in

    def apply(self, *xs):
        arrs = [np.asarray(x) for x in xs]
        lines = []
        for row in zip(*arrs):
            lines.append(" ".join(str(v) for v in row))
        text = ("\n".join(lines) + "\n") if lines else ""
        return jnp.asarray(np.frombuffer(text.encode(), np.uint8))


class Canary(Block):
    """Runs a lambda when the stream ends (reference src/canary.rs)."""

    domain = "host"

    def __init__(self, fn):
        self.fn = fn

    def apply(self, x):
        return x

    def finish(self):
        self.fn()


class Il2pDeframer(Block):
    """IL2P header deframer (reference src/il2p_deframer.rs).

    Consumes a bit stream, emits one PDU per parsed header (the reference
    also delivers only headers; payload delivery is a TODO there too).
    """

    domain = "host"

    def __init__(self):
        self.decoded = 0
        self.headers = []

    def apply(self, x):
        from ..ops.il2p import il2p_deframe

        hdrs = il2p_deframe(np.asarray(x, np.uint8))
        self.decoded += len(hdrs)
        self.headers.extend(hdrs)
        out = []
        for h in hdrs:
            out.append(
                Pdu(
                    np.zeros(0, np.uint8),
                    [Tag(0, "il2p:src", h.src), Tag(0, "il2p:dst", h.dst),
                     Tag(0, "il2p:type", h.describe())],
                )
            )
        return out

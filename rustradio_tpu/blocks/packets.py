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
    """Tagged stream -> burst PDUs (reference src/stream_to_pdu.rs).

    Carries the reference's Unsync/Packet/Tail state machine
    (src/stream_to_pdu.rs:10-26) across streaming chunks, so a burst that
    spans two ``run_stream`` chunks still becomes one PDU.  Non-burst tags
    inside a burst are attached to the PDU with burst-relative positions
    (src/stream_to_pdu.rs:176-195 ``tags_pos_adjust``).
    """

    domain = "host"

    UNSYNC, PACKET, TAIL = 0, 1, 2

    def __init__(self, tag: str = "burst", max_size: int = 10_000, tail: int = 0):
        self.tag, self.max_size, self.tail = tag, max_size, tail
        self._last_state = None

    # ---- state machine ----
    def init_state(self):
        self._last_state = None
        return {"mode": self.UNSYNC, "buf": None, "tail_left": 0, "tags": []}

    def _other_tags(self, tags, lo, hi, base):
        """Tags (excluding the burst tag) in [lo, hi), re-based to the
        burst-relative position ``base + (pos - lo)``."""
        return [
            Tag(base + (t.pos - lo), t.key, t.val)
            for t in tags
            if t.key != self.tag and lo <= t.pos < hi
        ]

    def apply_chunk(self, state, x):
        x = np.asarray(x)
        n = len(x)
        tags = getattr(self, "_in_tags", [])
        start = np.zeros(n, bool)
        end = np.zeros(n, bool)
        for t in tags:
            if t.key == self.tag and 0 <= t.pos < n:
                if t.val:
                    start[t.pos] = True
                else:
                    end[t.pos] = True

        mode = state["mode"]
        buf = state["buf"]
        tail_left = state["tail_left"]
        btags = list(state["tags"])
        pdus: list[Pdu] = []

        def file_burst(b, bt):
            # reference file_burst drops oversized bursts
            # (src/stream_to_pdu.rs:111-124)
            if len(b) <= self.max_size:
                pdus.append(Pdu(b, bt))

        def grow(b, lo, hi):
            # Bound memory on live streams: an open burst past max_size
            # will be dropped at filing anyway (len > max_size), so stop
            # storing (and stop collecting tags) past max_size + 1.
            cur = 0 if b is None else len(b)
            if cur > self.max_size:
                return b
            seg = x[lo:hi]
            nonlocal btags
            btags = btags + self._other_tags(tags, lo, hi, cur)
            out = seg.copy() if cur == 0 else np.concatenate([b, seg])
            return out[: self.max_size + 1] if len(out) > self.max_size else out

        i = 0
        while i < n:
            if mode == self.TAIL:
                # Burst tags are ignored while collecting the tail
                # (src/stream_to_pdu.rs:246-260).
                k = min(tail_left, n - i)
                buf = grow(buf, i, i + k)
                tail_left -= k
                i += k
                if tail_left == 0:
                    file_burst(buf, btags)
                    mode, buf, btags = self.UNSYNC, None, []
                continue
            if mode == self.UNSYNC:
                nexts = np.flatnonzero(start[i:])
                if nexts.size == 0:
                    i = n
                    break
                s = i + int(nexts[0])
                if end[s]:  # Both on one sample (src/stream_to_pdu.rs:209-221)
                    if self.tail > 0:
                        buf = grow(None, s, s + 1)
                        tail_left = self.tail - 1
                        mode = self.TAIL if tail_left else self.UNSYNC
                        if tail_left == 0:
                            file_burst(buf, btags)
                            buf, btags = None, []
                    else:
                        file_burst(x[:0], [])
                    i = s + 1
                    continue
                mode, buf, btags = self.PACKET, x[:0].copy(), []
                i = s
                # fall through into PACKET handling from the start sample
            # PACKET: accumulate until the end tag; Start tags inside a
            # packet are ignored (src/stream_to_pdu.rs:222-227).
            nexts = np.flatnonzero(end[i:])
            if nexts.size == 0:
                buf = grow(buf, i, n)
                i = n
                break
            e = i + int(nexts[0])
            buf = grow(buf, i, e)
            if self.tail > 0:
                # the end-tagged sample is the first tail sample
                # (src/stream_to_pdu.rs:229-245)
                k = min(self.tail, n - e)
                buf = grow(buf, e, e + k)
                if k == self.tail:
                    file_burst(buf, btags)
                    mode, buf, btags = self.UNSYNC, None, []
                else:
                    mode, tail_left = self.TAIL, self.tail - k
                i = e + k
            else:
                file_burst(buf, btags)
                mode, buf, btags = self.UNSYNC, None, []
                i = e + 1

        new_state = {"mode": mode, "buf": buf, "tail_left": tail_left, "tags": btags}
        self._last_state = new_state
        return new_state, pdus

    def flush_with_state(self, state):
        """End-of-stream drain: a burst whose TAIL was clipped by EOF is
        filed truncated (it already saw its end tag — dropping it would
        lose a complete packet).  An unterminated PACKET-state burst is
        still dropped, like the reference waiting forever for the end tag.

        Streaming mode passes the carried state pytree, so the drain is
        correct even right after a checkpoint resume (when ``_last_state``
        on the fresh instance is None).
        """
        s = state
        if s is None or s["mode"] != self.TAIL or s["buf"] is None:
            return None
        if len(s["buf"]) > self.max_size:
            return None
        return [Pdu(np.asarray(s["buf"]), list(s["tags"]))]

    def flush(self):
        # offline mode: apply() left the machine's end state on the instance
        s = self._last_state
        self._last_state = None
        return self.flush_with_state(s)

    def apply(self, x):
        # Offline mode runs the same machine over the whole stream; the
        # graph's flush pass files any EOF-clipped tail afterwards.
        _, pdus = self.apply_chunk(self.init_state(), x)
        return pdus

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
    """Re-center bursts (reference src/wpcr.rs:44-82).

    All PDUs in a chunk run as one batched device call per length bucket
    (ops.midpoint_batch).
    """

    domain = "host"

    def apply(self, pdus):
        if not pdus:
            return []
        results = ops.midpoint_batch([np.asarray(p.data, np.float32) for p in pdus])
        return [
            Pdu(centered, p.tags)
            for p, (centered, ok) in zip(pdus, results)
            if ok
        ]


class Wpcr(Block):
    """Whole-packet clock recovery (reference src/wpcr.rs:105-215).

    All PDUs in a chunk run as one batched device call per length bucket
    (ops.wpcr_batch without the midpoint stage — pair with Midpointer).
    """

    domain = "host"

    def __init__(self, samp_rate: float | None = None):
        self.samp_rate = samp_rate

    def apply(self, pdus):
        if not pdus:
            return []
        results = ops.wpcr_batch(
            [np.asarray(p.data, np.float32) for p in pdus], midpoint_first=False
        )
        out = []
        for p, (syms, info) in zip(pdus, results):
            if not info["found"]:
                continue
            tags = [
                Tag(0, "sps", info["sps"]),
                Tag(0, "phase", info["phase"]),
            ]
            if self.samp_rate is not None:
                tags.append(Tag(0, "frequency", info["sps"] * self.samp_rate))
            out.append(Pdu(syms, p.tags + tags))
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


class KissFrame(Block):
    """Byte stream -> still-KISS-encoded frame PDUs
    (reference src/kiss.rs:160-229 KissFrame).

    Accumulates bytes between FEND delimiters across arbitrary chunk
    boundaries (Unsynced/Synced carried state); consecutive FENDs emit
    nothing; frames longer than ``max_len`` are dropped.  Normally
    followed by :class:`KissDecode`.
    """

    domain = "host"

    def __init__(self, max_len: int = 10_000):
        self.max_len = max_len

    def init_state(self):
        return {"synced": False, "buf": b""}

    def apply_chunk(self, state, x):
        data = np.asarray(x, np.uint8).tobytes()
        synced, buf = state["synced"], state["buf"]
        out: list[Pdu] = []
        i = 0
        if not synced:
            j = data.find(b"\xc0")
            if j < 0:
                return {"synced": False, "buf": b""}, out
            synced, i = True, j + 1
        while True:
            j = data.find(b"\xc0", i)
            if j < 0:
                buf += data[i:]
                # an oversized open frame will be dropped at the closing
                # FEND anyway (src/kiss.rs:211-217); bound the memory now
                if len(buf) > self.max_len:
                    buf = buf[: self.max_len + 1]
                break
            frame = buf + data[i:j]
            buf = b""
            i = j + 1
            if frame and len(frame) <= self.max_len:
                out.append(Pdu(np.frombuffer(frame, np.uint8)))
        return {"synced": synced, "buf": buf}, out

    def apply(self, x):
        _, out = self.apply_chunk(self.init_state(), x)
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
                Pdu(
                    np.asarray(un, np.uint8),
                    p.tags
                    + [
                        Tag(0, "KissDecode:port", port >> 4),
                        # parity with reference src/kiss.rs:120-133
                        Tag(0, "KissDecode:input-bytes", len(body)),
                        Tag(0, "KissDecode:output-bytes", len(un)),
                    ],
                )
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
    """SHA-512 of the whole stream -> ONE PDU at end of stream
    (reference src/hasher.rs: the digest is pushed on EOF/Drop, :41-49).

    ``apply``/``apply_chunk`` only accumulate; the single digest PDU is
    emitted by ``flush()`` during the graph's end-of-stream drain pass.
    """

    domain = "host"
    n_out = 1

    def __init__(self, kind: str = "sha512"):
        self._h = hashlib.new(kind)
        self._done = False

    def apply(self, x):
        self._h.update(np.asarray(x, np.uint8).tobytes())
        return []

    def flush(self):
        if self._done:  # idempotent, like the reference's `done` guard
            return None
        self._done = True
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

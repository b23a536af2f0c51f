"""HDLC framing/deframing and CRC-16/X.25.

Deframer semantics (reference src/hdlc_deframer.rs:123-231): hunt for the
0x7E flag, collect bits, drop the stuffed 0 after five 1s, abort on seven
1s, strip the trailing partial flag (7 bits), require byte multiple and
min/max size, check CRC-16/X.25 (little-endian trailer), optionally repair
a single flipped bit (find_right_crc :41-71).

Two implementations:

* ``hdlc_deframe`` — host state machine, the exact golden port.  Packet
  extraction is inherently sequential/ragged; at AX.25 bit rates (1200 bd)
  this costs nothing.
* ``hdlc_bit_hunt`` — device-side vectorized helper that finds flag
  positions and ones-run info over the whole bit stream in O(1) depth, so
  the host only walks frame candidates instead of every bit.  Used by the
  fast path in models; results match the state machine.

CRC is RFC1662, generated here programmatically rather than a pasted
table (reference src/hdlc_deframer.rs:274-315 uses the table form).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _make_crc_table() -> np.ndarray:
    # CRC-16/X.25: reflected polynomial 0x8408 (RFC1662 FCS table).
    table = np.zeros(256, np.uint16)
    for b in range(256):
        v = b
        for _ in range(8):
            v = (v >> 1) ^ 0x8408 if (v & 1) else v >> 1
        table[b] = v
    return table


_CRC_TABLE = _make_crc_table()


def calc_crc(data) -> int:
    """CRC-16/X.25 over bytes (reference src/hdlc_deframer.rs:307-315)."""
    fcs = np.uint16(0xFFFF)
    for byte in np.asarray(data, np.uint8):
        fcs = np.uint16(fcs >> 8) ^ _CRC_TABLE[(fcs ^ byte) & 0xFF]
    return int(fcs ^ 0xFFFF)


def calc_crc_batch(data: np.ndarray) -> np.ndarray:
    """Vectorized CRC over a batch of equal-length byte rows."""
    data = np.asarray(data, np.uint8)
    fcs = np.full(data.shape[0], 0xFFFF, np.uint16)
    for j in range(data.shape[1]):
        fcs = (fcs >> 8) ^ _CRC_TABLE[(fcs ^ data[:, j]) & 0xFF]
    return fcs ^ np.uint16(0xFFFF)


def _bits_to_bytes_lsb(bits: np.ndarray) -> np.ndarray:
    """8 bits LSB-first per byte (reference bits2byte, :262-272)."""
    b = bits.reshape(-1, 8)
    return (b * (1 << np.arange(8, dtype=np.uint16))).sum(axis=1).astype(np.uint8)


def _find_right_crc(data: np.ndarray, got: int, fix_bits: bool):
    """Single-bitflip CRC repair (reference src/hdlc_deframer.rs:41-71).

    Returns (maybe_fixed_data, crc, fixed?).
    """
    crc = calc_crc(data)
    if got == crc or not fix_bits:
        return None, crc, False
    n = len(data)
    if n:
        # Try every single-bit flip in the payload, vectorized: batch of
        # n*8 copies each with one bit flipped.
        batch = np.repeat(data[None, :], n * 8, axis=0)
        rows = np.arange(n * 8)
        batch[rows, rows // 8] ^= (1 << (rows % 8)).astype(np.uint8)
        crcs = calc_crc_batch(batch)
        hits = np.flatnonzero(crcs == got)
        if hits.size:
            return batch[hits[0]], got, True
    for crcbit in range(16):
        if (got ^ (1 << crcbit)) == crc:
            return None, crc, True
    return None, crc, False


class HdlcStateMachine:
    """Resumable HDLC deframer state machine (reference
    src/hdlc_deframer.rs:123-231).  ``feed(bits)`` may be called repeatedly
    with consecutive chunks; frames spanning chunk boundaries decode once.
    """

    def __init__(
        self,
        min_size: int = 1,
        max_size: int = 1500,
        keep_checksum: bool = False,
        fix_bits: bool = False,
    ):
        self.min_size, self.max_size = min_size, max_size
        self.keep_checksum, self.fix_bits = keep_checksum, fix_bits
        self.stats = {"decoded": 0, "crc_error": 0, "bitfixed": 0}
        self.state = "unsynced"
        self.shift = 0xFF
        self.ones = 0
        self.cur: list[int] = []
        self.stream_pos = 0

    def _finish(self, packets, pos: int) -> None:
        nbits = len(self.cur) - 7  # strip partial flag
        if nbits < 0:
            return
        b = np.asarray(self.cur[:nbits], np.uint8)
        if nbits % 8 != 0 or nbits // 8 < self.min_size:
            return
        by = _bits_to_bytes_lsb(b)
        if self.keep_checksum:
            self.stats["decoded"] += 1
            packets.append((by, pos))
            return
        if len(by) < 2:
            return
        data, got = by[:-2], int(by[-2]) | (int(by[-1]) << 8)
        nd, crc, fixed = _find_right_crc(data, got, self.fix_bits)
        if fixed:
            self.stats["bitfixed"] += 1
        if nd is not None:
            data = nd
        if crc != got:
            self.stats["crc_error"] += 1
            return
        self.stats["decoded"] += 1
        packets.append((data, pos))

    def feed(self, bits) -> list[tuple[np.ndarray, int]]:
        packets: list[tuple[np.ndarray, int]] = []
        for bit in np.asarray(bits, np.uint8):
            bit = int(bit)
            pos = self.stream_pos
            self.stream_pos += 1
            if self.state == "unsynced":
                self.shift = ((self.shift >> 1) | (bit << 7)) & 0xFF
                if self.shift == 0x7E:
                    self.state = "synced"
                    self.ones = 0
                    self.cur = []
            elif self.state == "synced":
                if len(self.cur) > self.max_size * 8:
                    self.state = "unsynced"
                    self.shift = 0xFF
                    continue
                if bit:
                    self.cur.append(1)
                    if self.ones == 5:
                        self.state = "final"
                    else:
                        self.ones += 1
                elif self.ones == 5:
                    self.ones = 0  # stuffed bit, drop
                else:
                    self.cur.append(0)
                    self.ones = 0
            else:  # final check: 6 ones seen, this bit must be 0
                if bit == 1 or len(self.cur) < 7:
                    self.state = "unsynced"
                    self.shift = 0xFF
                    continue
                self._finish(packets, pos)
                self.state = "synced"
                self.ones = 0
                self.cur = []
        return packets

    def snapshot(self) -> dict:
        return {
            "state": self.state, "shift": self.shift, "ones": self.ones,
            "cur": list(self.cur), "stream_pos": self.stream_pos,
            "stats": dict(self.stats),
        }

    def restore(self, snap: dict) -> None:
        self.state = snap["state"]
        self.shift = snap["shift"]
        self.ones = snap["ones"]
        self.cur = list(snap["cur"])
        self.stream_pos = snap["stream_pos"]
        self.stats = dict(snap["stats"])


def hdlc_deframe(
    bits,
    min_size: int = 1,
    max_size: int = 1500,
    keep_checksum: bool = False,
    fix_bits: bool = False,
):
    """Deframe a 0/1 bit array into packets (one-shot form).

    Returns (packets, stats) where packets is a list of (bytes, stream_pos)
    and stats counts decoded/crc_error/bitfixed like the reference's Drop
    logging (src/hdlc_deframer.rs:103-110).

    Dispatches to the native C++ port (rr_hdlc_* in native/rr_native.cpp,
    ~100x the per-bit Python loop) when available.
    """
    from .. import native

    if native.available():
        sm = native.HdlcDeframer(min_size, max_size, keep_checksum, fix_bits)
        packets = sm.feed(np.asarray(bits, np.uint8))
        return packets, sm.stats
    sm = HdlcStateMachine(min_size, max_size, keep_checksum, fix_bits)
    packets = sm.feed(bits)
    return packets, sm.stats


def hdlc_bit_hunt(bits):
    """Device-side helpers for fast deframing: flag positions + run info.

    Returns (flag_mask, ones_run) where flag_mask[n] marks n as the last
    bit of a 0x7E flag and ones_run[n] is the length of the run of ones
    ending at n.  Both computable in O(log n) depth on device.
    """
    b = jnp.asarray(bits, jnp.uint8)
    n = b.shape[0]
    # flag: bits[n-7..n] == 0,1,1,1,1,1,1,0 (LSB-first window value 0x7e)
    pattern = jnp.asarray([0, 1, 1, 1, 1, 1, 1, 0], jnp.uint8)
    bp = jnp.pad(b, (7, 0), constant_values=1)  # unsynced shift starts 0xff
    windows = jnp.stack([bp[i : i + n] for i in range(8)], axis=0)  # (8, n)
    flag = jnp.all(windows == pattern[:, None], axis=0)
    # ones_run via segmented count: r[n] = 0 if b[n]==0 else r[n-1]+1.
    # Closed form: distance to the last zero, via log-depth cummax.
    idx = jnp.arange(n)
    last_zero = jax.lax.cummax(jnp.where(b == 0, idx, -1))
    ones_run = idx - last_zero
    return flag, ones_run


def hdlc_frame(data, sync_bytes: int = 20) -> np.ndarray:
    """Byte packet -> stuffed bit packet with flag runs (host side).

    Mirrors reference hdlc_encode (src/hdlc_framer.rs:61-86): ``sync_bytes``
    flags before and after, LSB-first bits, a 0 stuffed after five 1s.
    """
    flags = np.tile(np.asarray([0, 1, 1, 1, 1, 1, 1, 0], np.uint8), sync_bytes)
    out = [flags]
    bits = np.unpackbits(np.asarray(data, np.uint8)[:, None], axis=1, bitorder="little").reshape(-1)
    stuffed: list[int] = []
    ones = 0
    for bit in bits:
        if bit:
            ones += 1
            stuffed.append(1)
            if ones == 5:
                ones = 0
                stuffed.append(0)
        else:
            ones = 0
            stuffed.append(0)
    out.append(np.asarray(stuffed, np.uint8))
    out.append(flags)
    return np.concatenate(out)


def fcs_add(data) -> np.ndarray:
    """Append CRC-16/X.25 little-endian (reference FcsAdder,
    src/hdlc_framer.rs:28-42)."""
    data = np.asarray(data, np.uint8)
    crc = calc_crc(data)
    return np.concatenate([data, np.asarray([crc & 0xFF, crc >> 8], np.uint8)])

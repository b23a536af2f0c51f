"""Bell-202 AFSK transmitter: AX.25 payloads -> .au audio
(the TX half of reference examples/bell202.rs).

Usage:
    echo 'APRS test' | python -m rustradio_tpu.apps.bell202_tx \
        --src N0CALL --dst APRS --out out.au
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..io import au
from .. import ops


def make_ax25_ui(dst: str, src: str, info: bytes) -> np.ndarray:
    def addr(call: str, ssid: int, last: bool):
        call = call.ljust(6)[:6]
        b = [ord(c) << 1 for c in call]
        b.append(((ssid & 0xF) << 1) | 0x60 | (1 if last else 0))
        return b

    def split(c):
        if "-" in c:
            base, ssid = c.rsplit("-", 1)
            return base, int(ssid)
        return c, 0

    d, dssid = split(dst)
    s, sssid = split(src)
    frame = addr(d, dssid, False) + addr(s, sssid, True) + [0x03, 0xF0] + list(info)
    return np.asarray(frame, np.uint8)


def afsk_modulate(line_bits: np.ndarray, fs: float, baud: float = 1200.0,
                  mark: float = 1200.0, space: float = 2200.0,
                  amp: float = 0.5) -> np.ndarray:
    sps = fs / baud
    n = int(len(line_bits) * sps)
    bit_at = np.minimum((np.arange(n) / sps).astype(int), len(line_bits) - 1)
    freqs = np.where(line_bits[bit_at] == 1, mark, space)
    phase = np.cumsum(2 * np.pi * freqs / fs)
    return (amp * np.sin(phase)).astype(np.float32)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True, help="source callsign")
    p.add_argument("--dst", default="APRS")
    p.add_argument("--sample_rate", type=float, default=44100.0)
    p.add_argument("--out", required=True)
    opt = p.parse_args(argv)

    chunks = []
    for line in sys.stdin.read().splitlines():
        frame = make_ax25_ui(opt.dst, opt.src, line.encode())
        bits = ops.hdlc_frame(ops.fcs_add(frame))
        line_bits = np.asarray(ops.nrzi_encode(bits))
        chunks.append(afsk_modulate(line_bits, opt.sample_rate))
        chunks.append(np.zeros(int(opt.sample_rate * 0.1), np.float32))
    audio = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
    with open(opt.out, "wb") as f:
        f.write(au.au_encode(audio, int(opt.sample_rate)))
    print(f"wrote {len(audio)} samples to {opt.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

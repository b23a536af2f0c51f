"""AX.25 1200 bd Bell-202 receiver (reference examples/ax25-1200-rx.rs).

Usage:
    python -m rustradio_tpu.apps.ax25_1200_rx --audio -r capture.au \
        --sample_rate 44100 -o packets/
    python -m rustradio_tpu.apps.ax25_1200_rx -r capture.c32 \
        --sample_rate 50k -o packets/
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from ..dtypes import parse_frequency
from ..io import au, rawfile, sigmf
from ..models.ax25 import ax25_1200_rx, ax25_1200_rx_iq, parse_ax25


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-a", "--audio", action="store_true", help="input is .au audio")
    p.add_argument("-r", "--read", required=True, help="input file")
    p.add_argument("-o", "--out", help="directory to write packets to")
    p.add_argument("--sample_rate", type=parse_frequency, default=None)
    p.add_argument("--fix_bits", action="store_true")
    p.add_argument(
        "--symbol_taps", default="0.5,0.5", help="clock filter taps, comma separated"
    )
    p.add_argument("--symbol_max_deviation", type=float, default=0.5)
    p.add_argument(
        "--demod", choices=["discriminator", "tones"], default="discriminator",
        help="audio demod: reference discriminator chain or the more "
        "sensitive dual-tone correlator",
    )
    p.add_argument(
        "--keep_checksum", action="store_true",
        help="emit frames without CRC verification (structural recovery)",
    )
    p.add_argument(
        "--sync", choices=["native", "events"], default="native",
        help="clock recovery: bit-exact sequential recurrence or the "
        "event-driven form (~sps-times shorter sequential chain)",
    )
    p.add_argument("-v", "--verbose", action="count", default=0)
    opt = p.parse_args(argv)

    taps = tuple(float(t) for t in opt.symbol_taps.split(","))
    t0 = time.time()
    if opt.audio:
        audio, rate = au.au_read(opt.read, int(opt.sample_rate) if opt.sample_rate else None)
        pkts = ax25_1200_rx(
            audio, float(rate), fix_bits=opt.fix_bits,
            symbol_taps=taps, symbol_max_deviation=opt.symbol_max_deviation,
            demod=opt.demod, keep_checksum=opt.keep_checksum,
            sync=opt.sync,
        )
    else:
        if opt.read.endswith((".sigmf", ".sigmf-meta", ".sigmf-data")):
            iq, meta = sigmf.read(opt.read, opt.sample_rate)
            rate = meta.global_.sample_rate
            if rate is None:
                print("SigMF file does not specify sample rate", file=sys.stderr)
                return 1
        else:
            if opt.sample_rate is None:
                print("raw IQ input requires --sample_rate", file=sys.stderr)
                return 1
            iq = rawfile.read_samples(opt.read, "c32")
            rate = opt.sample_rate
        pkts = ax25_1200_rx_iq(iq, float(rate), fix_bits=opt.fix_bits,
                               symbol_taps=taps,
                               symbol_max_deviation=opt.symbol_max_deviation,
                               demod=opt.demod, keep_checksum=opt.keep_checksum,
                               sync=opt.sync)
    dt = time.time() - t0

    if opt.out:
        os.makedirs(opt.out, exist_ok=True)
        for i, pkt in enumerate(pkts):
            name = f"{time.strftime('%Y-%m-%dT%H:%M:%S')}.{i:06d}"
            with open(os.path.join(opt.out, name), "wb") as f:
                f.write(bytes(pkt))
    for pkt in pkts:
        addrs, info = parse_ax25(pkt.data)
        route = ">".join(addrs[:2][::-1]) if len(addrs) >= 2 else "?"
        print(f"{route}: {info[:100]!r}")
    print(f"decoded {len(pkts)} packets in {dt:.2f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
